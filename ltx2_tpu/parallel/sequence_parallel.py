"""Sequence-parallel DiT execution: the whole forward under shard_map.

The DiT is token-parallel almost everywhere — patchify projection, AdaLN,
FFN, norms, and output projection are pointwise over tokens. The only
cross-token ops are:
- self-attention          -> ring attention (parallel/ring_attention.py)
- A2V / V2A cross-modal   -> K/V all-gather (the other modality's tokens)
- text cross-attention    -> nothing (the <=1024-token context replicates)

So sequence parallelism = shard every per-token tensor (latent, positions,
per-token timesteps) along a `seq` mesh axis, replicate weights and context,
and run the standard `ltx_model_apply` inside shard_map with
cfg.sequence_axis set. Per-device HBM and FLOPs scale ~1/n_seq; the ring
ppermute traffic rides ICI.

This composes with tensor parallelism (`model_axis=`): block weights
arrive feature-sharded over 'model' (sharding.py rules, shard_dit_params),
the model axis stays out of the manual axis_names, and ring attention runs
head-sharded with the row-parallel projections psum'd via auto_axes.

Batch/DP note (review r4): inside the SP shard_map the batch axis
REPLICATES over any 'data' mesh axis — per-row STG perturbation configs
are static Python closed over uniformly, so rows cannot shard across
data groups without mis-indexing the perturbed row. A 'data' axis on an
SP mesh therefore buys redundancy, not speedup, for the rows inside ONE
generation; scale throughput across 'data' at the clip level (one
generation per data group) instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    Modality,
    ltx_model_apply,
    x0_model_apply,
)
from ltx2_tpu.parallel.mesh import SEQ_AXIS


def modality_specs(m: Modality, axis: str) -> Modality:
    """PartitionSpec pytree matching a Modality: token dims sharded on `axis`,
    everything else replicated."""
    return Modality(
        latent=P(None, axis, None),
        context=P(),
        context_mask=None if m.context_mask is None else P(),
        timesteps=P() if m.timesteps.ndim == 1 else P(None, axis),
        positions=P(None, None, axis, None),
        sigma=None if m.sigma is None else P(),
    )


def make_sequence_parallel_forward(
    mesh: Mesh,
    cfg: LTXModelConfig,
    axis: str = SEQ_AXIS,
    x0: bool = True,
    model_axis: Optional[str] = None,
):
    """Build a jitted token-sharded forward: (params, video[, audio]) -> out.

    Tokens per modality must divide the mesh's `axis` size. Params and text
    context are replicated; latent/positions/per-token-timesteps are sharded.

    With `model_axis` (SP x TP), block weights additionally arrive
    feature-sharded over that mesh axis (shard with shard_dit_params first):
    the axis stays OUT of the manual axis_names, column-parallel projections
    and head-sharded ring attention propagate through explicit sharding, and
    the row-parallel out/down projections psum under auto_axes.
    """
    sp_cfg = dataclasses.replace(cfg, sequence_axis=axis, tp_axis=model_axis)
    apply_fn = x0_model_apply if x0 else ltx_model_apply

    def forward(params, video: Optional[Modality], audio: Optional[Modality]):
        return apply_fn(params, sp_cfg, video=video, audio=audio)

    # Memoize the wrapped jit per structural signature: rebuilding
    # shard_map + jax.jit inside run() would give every call a fresh
    # function identity, so repeated eager calls would retrace (and
    # re-lower) the full model each time. The signature captures
    # everything the specs depend on; jit handles shape changes itself.
    jitted = {}

    def run(params, video: Optional[Modality] = None, audio: Optional[Modality] = None):
        key = (
            jax.tree_util.tree_structure((params, video, audio)),
            None if video is None else video.timesteps.ndim,
            None if audio is None else audio.timesteps.ndim,
        )
        fn = jitted.get(key)
        if fn is None:
            param_specs = jax.tree_util.tree_map(lambda _: P(), params)
            v_specs = None if video is None else modality_specs(video, axis)
            a_specs = None if audio is None else modality_specs(audio, axis)
            out_specs = P(None, axis, None)
            if video is not None and audio is not None:
                out_specs = (out_specs, out_specs)
            manual = frozenset(n for n in mesh.axis_names if n != model_axis)
            fn = jax.jit(jax.shard_map(
                forward,
                mesh=mesh,
                in_specs=(param_specs, v_specs, a_specs),
                out_specs=out_specs,
                axis_names=manual,
            ))
            jitted[key] = fn
        return fn(params, video, audio)

    return run
