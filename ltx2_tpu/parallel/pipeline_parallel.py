"""Pipeline-parallel DiT execution: the 48-block stack staged over a mesh axis.

The reference has no distributed runtime (SURVEY.md §2.12); this is new
TPU-first design completing the parallelism matrix (DP / TP / SP / PP):

- The block stack's STACKED (L, ...) parameter layout (model.py) makes PP a
  pure sharding decision: each of P stages holds L/P contiguous blocks —
  `transformer_blocks` leaves shard along their leading layer axis over the
  'pipe' mesh axis, so per-device weight HBM is ~1/P. This is the scaling
  lever when a model does NOT fit one chip and TP's all-reduce latency
  dominates: PP's only communication is one point-to-point activation
  ppermute per stage per microbatch, which rides a single ICI hop.

- Schedule: GPipe over M microbatches split from the BATCH axis. In the
  denoise loops the batch rows are guidance passes x clips (pass-major
  batched CFG), so M microbatches are natural and bubble overhead is
  (P-1)/(M+P-1). All devices run the same program over M+P-1 "ticks": at
  tick t, stage s applies its local blocks to microbatch (t-s), then the
  activation rotates one stage forward via lax.ppermute. Out-of-range
  (bubble) ticks compute on don't-care data and are never recorded.

- Preprocessing (patchify proj, AdaLN tables, RoPE) and the output heads
  are token-pointwise and tiny relative to the blocks; they run replicated
  on every stage, which keeps the shard_map region self-contained and
  avoids stage-0/stage-(P-1) special-casing outside the loop.

Composes with the denoise loops via pipelines/denoise.py's `pipeline_axis`
option, mirroring how sequence parallelism is wired.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, auto_axes

from ltx2_tpu.components.perturbations import BatchedPerturbationConfig
from ltx2_tpu.models.transformer.blocks import av_block_apply
from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    Modality,
    _perturbation_mask_array,
    _process_output,
    prepare_stream_args,
)
from ltx2_tpu.parallel.mesh import PIPE_AXIS


def _dyn(tree, i, axis=0):
    """tree_map dynamic_index_in_dim over a pytree (None leaves preserved)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, axis, keepdims=False), tree
    )


def _to_microbatches(tree, m: int):
    """Reshape every leaf's leading batch dim B -> (M, B//M)."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:]), tree
    )


def pipeline_block_stack(
    params,
    cfg: LTXModelConfig,
    video_args,
    audio_args,
    run_video: bool,
    run_audio: bool,
    *,
    axis: str,
    num_microbatches: int,
    perturbations: Optional[BatchedPerturbationConfig] = None,
    ca_scales: Optional[jnp.ndarray] = None,
    data_axis: Optional[str] = None,
    model_axis: Optional[str] = None,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Run the transformer block stack GPipe-pipelined over mesh axis `axis`.

    MUST run inside shard_map with `params['transformer_blocks']` sharded
    along its leading (L, ...) layer axis over `axis` and everything else
    replicated. With `data_axis`, the batch rows additionally arrive
    sharded over that mesh axis (PP x DP composition) — the GPipe schedule
    runs over each data shard's LOCAL rows. Returns the final (vx, ax)
    hidden states, replicated over `axis` (sharded over `data_axis`).

    With `model_axis` (PP x TP composition), that mesh axis must be LEFT
    OUT of the enclosing shard_map's manual `axis_names`: block weights
    additionally arrive feature-sharded over it (Megatron column/row rules,
    sharding.py) and each stage's block scan runs under `auto_axes` so
    GSPMD inserts the TP all-reduces over ICI inside every tick, while the
    GPipe schedule stays manual over `axis`/`data_axis`.

    With `cfg.sequence_axis` set (PP x SP composition), the stream args
    additionally arrive token-sharded over that mesh axis and each stage's
    self-attention runs as ring attention — the GPipe ppermute (over
    `axis`) and the ring ppermute (over the sequence axis) ride independent
    mesh dimensions.
    """
    n_stages = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    m = num_microbatches

    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"pipeline stages {n_stages} must divide num_layers {cfg.num_layers}"
        )
    layers_local = cfg.num_layers // n_stages

    batch = (video_args or audio_args).x.shape[0]
    if batch % m != 0:
        raise ValueError(f"num_microbatches {m} must divide batch {batch}")
    mb = batch // m

    # Per-layer scan inputs: block params arrive pre-sharded (L/P, ...);
    # masks/ca_scales are computed replicated at global L and sliced locally.
    # The perturbation config addresses GLOBAL batch rows; under PP x DP each
    # data shard slices out its own row range.
    data_size = 1 if data_axis is None else jax.lax.axis_size(data_axis)
    pmasks = _perturbation_mask_array(
        perturbations, cfg.num_layers, batch * data_size
    )
    row0 = 0 if data_axis is None else jax.lax.axis_index(data_axis) * batch
    pmasks = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice(
            a, (idx * layers_local, row0), (layers_local, batch)
        ).reshape(layers_local, m, mb),
        pmasks,
    )
    if ca_scales is None:
        ca_scales = jnp.ones((cfg.num_layers,), jnp.float32)
    ca_local = jax.lax.dynamic_slice_in_dim(ca_scales, idx * layers_local, layers_local, 0)

    video_cfg = cfg.video_stream_config() if run_video else None
    audio_cfg = cfg.audio_stream_config() if run_audio else None

    # Microbatched per-sample args: every StreamArgs leaf is (B, ...).
    v_mb = _to_microbatches(video_args, m) if run_video else None
    a_mb = _to_microbatches(audio_args, m) if run_audio else None

    def _local_blocks(block_params, ca_loc, vx, ax, v_in, a_in, masks_mb):
        """Apply this stage's L/P blocks (same scan body as ltx_model_apply)."""
        xs = {"p": block_params, "masks": masks_mb, "ca": ca_loc}

        def block_step(carry, xs_l):
            cvx, cax = carry
            v = v_in.replace(x=cvx) if run_video else None
            a = a_in.replace(x=cax) if run_audio else None
            v_out, a_out = av_block_apply(
                xs_l["p"], v, a, video_cfg, audio_cfg,
                rope_type=cfg.rope_type, norm_eps=cfg.norm_eps,
                perturb=xs_l["masks"], ca_scale=xs_l["ca"],
            )
            return (
                v_out.x if run_video else cvx,
                a_out.x if run_audio else cax,
            ), None

        if cfg.remat:
            block_step = jax.checkpoint(block_step)
        (vx, ax), _ = jax.lax.scan(block_step, (vx, ax), xs)
        return vx, ax

    if model_axis is None:
        def local_blocks(vx, ax, v_in, a_in, masks_mb):
            return _local_blocks(
                params["transformer_blocks"], ca_local, vx, ax, v_in, a_in, masks_mb
            )
    else:
        # TP inside each stage: the scan body sees weights feature-sharded
        # over `model_axis`; auto_axes hands that axis back to GSPMD so the
        # Megatron all-reduces are inserted automatically. Activations enter
        # and leave replicated over the model axis (P()). All arrays the
        # stage touches ride in as arguments — auto_axes converts arguments,
        # not closure captures.
        def local_blocks(vx, ax, v_in, a_in, masks_mb):
            return auto_axes(
                _local_blocks, axes=(model_axis,), out_sharding=(P(), P())
            )(params["transformer_blocks"], ca_local, vx, ax, v_in, a_in, masks_mb)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    # Fresh zeros (device-invariant) — NOT zeros_like of the sharded inputs,
    # whose varying state would differ from v_outs' and break the uniform
    # pcast below.
    zeros_v = (
        jnp.zeros(v_mb.x.shape[1:], v_mb.x.dtype) if run_video
        else jnp.zeros((mb, 0, 1), cfg.dtype)
    )
    zeros_a = (
        jnp.zeros(a_mb.x.shape[1:], a_mb.x.dtype) if run_audio
        else jnp.zeros((mb, 0, 1), cfg.dtype)
    )
    v_outs = jnp.zeros((m, *zeros_v.shape), zeros_v.dtype)
    a_outs = jnp.zeros((m, *zeros_a.shape), zeros_a.dtype)

    def tick(carry, t, rotate=True):
        vx, ax, v_outs, a_outs = carry
        mb_id = jnp.clip(t - idx, 0, m - 1)
        v_in = _dyn(v_mb, mb_id) if run_video else None
        a_in = _dyn(a_mb, mb_id) if run_audio else None
        masks_mb = _dyn(pmasks, mb_id, axis=1)  # (L/P, mb) per type

        # Stage 0 injects a fresh microbatch; later stages use the rotated
        # activation from the previous tick.
        is_first = idx == 0
        if run_video:
            vx = jnp.where(is_first, v_in.x, vx)
        if run_audio:
            ax = jnp.where(is_first, a_in.x, ax)

        vx, ax = local_blocks(vx, ax, v_in, a_in, masks_mb)

        # Last stage records microbatch (t - (P-1)) when in range.
        record = (idx == n_stages - 1) & (t - idx >= 0) & (t - idx < m)
        if run_video:
            v_upd = jax.lax.dynamic_update_index_in_dim(v_outs, vx, mb_id, 0)
            v_outs = jnp.where(record, v_upd, v_outs)
        if run_audio:
            a_upd = jax.lax.dynamic_update_index_in_dim(a_outs, ax, mb_id, 0)
            a_outs = jnp.where(record, a_upd, a_outs)

        # Rotate the activation one stage forward (single ICI hop).
        # `rotate` is a trace-time Python bool (same on every device): the
        # FINAL tick's rotation was computed and discarded — one wasted
        # (mb, T, C) v+a transfer per forward (review r4).
        if rotate:
            vx = jax.lax.ppermute(vx, axis, perm)
            ax = jax.lax.ppermute(ax, axis, perm)
        return (vx, ax, v_outs, a_outs), None

    ticks = jnp.arange(m + n_stages - 1)
    # The carry becomes device-varying across 'pipe' inside the loop (ppermute
    # + axis_index-dependent writes) — across 'data' when rows are
    # data-sharded, and across the sequence axis when tokens are sharded
    # (PP x SP: ring attention inside each stage); mark the zero-init
    # accordingly so scan carry types are stable.
    vary_axes = (axis,)
    if data_axis is not None:
        vary_axes += (data_axis,)
    if cfg.sequence_axis is not None:
        vary_axes += (cfg.sequence_axis,)
    init = jax.tree_util.tree_map(
        lambda a: jax.lax.pcast(a, vary_axes, to="varying"),
        (zeros_v, zeros_a, v_outs, a_outs),
    )
    carry, _ = jax.lax.scan(tick, init, ticks[:-1])
    (_, _, v_outs, a_outs), _ = tick(carry, ticks[-1], rotate=False)

    # Outputs live on the last stage only; replicate for the output heads.
    # The psum runs in f32 under PP x TP: XLA:CPU's AllReducePromotion pass
    # CHECK-fails rebuilding a sub-f32 all-reduce whose operand crossed an
    # auto_axes boundary ("Invalid binary instruction opcode copy"), and the
    # cast is numerically free — exactly one stage contributes a non-zero
    # term, so the sum is exact in any dtype.
    def replicate_from_last(outs, b_shape):
        masked = jnp.where(idx == n_stages - 1, outs, 0.0)
        if model_axis is not None and masked.dtype != jnp.float32:
            masked = jax.lax.psum(masked.astype(jnp.float32), axis).astype(outs.dtype)
        else:
            masked = jax.lax.psum(masked, axis)
        return masked.reshape(batch, *b_shape[1:])

    vx_full = replicate_from_last(v_outs, zeros_v.shape) if run_video else None
    ax_full = replicate_from_last(a_outs, zeros_a.shape) if run_audio else None
    return vx_full, ax_full


def _pp_velocity(params, cfg, video, audio, *, axis, num_microbatches,
                 perturbations, ca_scales, video_pe, data_axis=None,
                 model_axis=None):
    """Full forward with the pipelined block stack -> velocity per modality."""
    video_args, audio_args, run_video, run_audio = prepare_stream_args(
        params, cfg, video, audio, video_pe=video_pe
    )
    vx, ax = pipeline_block_stack(
        params, cfg, video_args, audio_args, run_video, run_audio,
        axis=axis, num_microbatches=num_microbatches,
        perturbations=perturbations, ca_scales=ca_scales, data_axis=data_axis,
        model_axis=model_axis,
    )
    video_out = audio_out = None
    if run_video:
        video_out = _process_output(
            params["scale_shift_table"], cfg.norm_eps, params["proj_out"],
            vx, video_args.embedded_timestep,
        ).astype(jnp.float32)
    if run_audio:
        audio_out = _process_output(
            params["audio_scale_shift_table"], cfg.norm_eps, params["audio_proj_out"],
            ax, audio_args.embedded_timestep,
        ).astype(jnp.float32)
    if run_video and run_audio:
        return video_out, audio_out
    return video_out if run_video else audio_out


def pp_sp_modality_specs(m: Modality, b, seq_axis: str) -> Modality:
    """PartitionSpec pytree for a Modality under PP x SP: batch dims over
    `b` (the data axis or None), token dims over `seq_axis`, context and
    scalars replicated over 'seq' (mirrors sequence_parallel.modality_specs
    with a data-sharded leading axis)."""
    return Modality(
        latent=P(b, seq_axis, None),
        context=P(b),
        context_mask=None if m.context_mask is None else P(b),
        timesteps=P(b) if m.timesteps.ndim == 1 else P(b, seq_axis),
        positions=P(b, None, seq_axis, None),
        sigma=None if m.sigma is None else P(b),
    )


def _x0(modality: Modality, velocity: jnp.ndarray) -> jnp.ndarray:
    t = modality.timesteps.astype(jnp.float32)
    t = t[:, None, None] if t.ndim == 1 else t[:, :, None]
    return modality.latent.astype(jnp.float32) - t * velocity


def block_param_specs(params, axis: str = PIPE_AXIS):
    """PartitionSpec pytree for shard_map in_specs: transformer_blocks
    sharded on their leading layer axis over `axis`; everything else
    replicated. Mentions MANUAL axes only — under PP x TP the model-axis
    feature sharding rides in via the arrays' placements (see
    pp_tp_param_spec / shard_pipeline_params), not via in_specs."""
    def spec_for(path, leaf):
        top = getattr(path[0], "key", None)
        if top == "transformer_blocks":
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pp_tp_param_spec(path_str: str, axis: str, model_axis: Optional[str]) -> P:
    """Placement spec for one leaf: PP layer sharding on the leading (L, ...)
    axis of block leaves, composed (when `model_axis` is set) with the
    Megatron TP feature rules from sharding.py — whose block specs carry a
    leading None exactly where the layer axis sits."""
    if not (path_str.startswith("transformer_blocks/")
            or path_str.startswith("transformer_blocks.")):
        return P()
    if model_axis is None:
        return P(axis)
    from ltx2_tpu.parallel.sharding import spec_for_path

    tp = spec_for_path(path_str.replace(".", "/"))
    rest = tuple(tp)[1:] if len(tp) > 0 else ()
    rest = tuple(model_axis if s == "model" else s for s in rest)
    return P(axis, *rest)


def shard_pipeline_params(
    mesh: Mesh, params, axis: str = PIPE_AXIS, model_axis: Optional[str] = None
):
    """Place the param tree: blocks layer-sharded over `axis` (and, with
    `model_axis`, feature-sharded over it — PP x TP), rest replicated."""
    from jax.sharding import NamedSharding

    from ltx2_tpu.parallel.sharding import path_to_str

    def put(path, leaf):
        spec = pp_tp_param_spec(path_to_str(path), axis, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def pipeline_device_put(
    mesh: Mesh, axis: str = PIPE_AXIS, model_axis: Optional[str] = None
):
    """Loader `device_put` hook: stacked (L, ...) block leaves land DIRECTLY
    layer-sharded over `axis` (feature-sharded over `model_axis` too under
    PP x TP) as they stream in — per-stage HBM stays ~1/P during load, which
    is the point of PP (a model too big for one chip must never be staged
    whole on one chip)."""
    from jax.sharding import NamedSharding

    def put(path: str, arr):
        spec = pp_tp_param_spec(path, axis, model_axis)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return put


def make_pipeline_parallel_forward(
    mesh: Mesh,
    cfg: LTXModelConfig,
    num_microbatches: int = 2,
    axis: str = PIPE_AXIS,
    x0: bool = True,
    perturbations: Optional[BatchedPerturbationConfig] = None,
    ca_scales: Optional[jnp.ndarray] = None,
    data_axis: Optional[str] = None,
    model_axis: Optional[str] = None,
):
    """Build a jitted pipeline-parallel forward: (params, video[, audio]) -> out.

    Block params shard along the layer axis over `axis` (per-device weight
    HBM ~1/P); activations flow stage-to-stage via ppermute in a GPipe
    schedule with `num_microbatches` drawn from the batch axis. The LOCAL
    batch must divide num_microbatches; cfg.num_layers must divide the
    stage count. With `data_axis`, batch rows additionally shard over that
    mesh axis (PP x DP: num_microbatches applies per data shard). With
    `model_axis`, block weights additionally feature-shard over it (PP x TP:
    per-device weight HBM ~1/(P*T), Megatron all-reduces inside each stage).
    With `cfg.sequence_axis`, tokens additionally shard over that axis
    (PP x SP: ring attention inside each stage).
    """
    pp_cfg = cfg
    seq_axis = cfg.sequence_axis

    def forward(params, video, audio, video_pe):
        out = _pp_velocity(
            params, pp_cfg, video, audio,
            axis=axis, num_microbatches=num_microbatches,
            perturbations=perturbations, ca_scales=ca_scales, video_pe=video_pe,
            data_axis=data_axis, model_axis=model_axis,
        )
        if not x0:
            return out
        if isinstance(out, tuple):
            return _x0(video, out[0]), _x0(audio, out[1])
        return _x0(video if video is not None else audio, out)

    batch_spec = P() if data_axis is None else P(data_axis)
    b = None if data_axis is None else data_axis

    # Memoize the wrapped jit per structural signature (see
    # make_sequence_parallel_forward): a fresh shard_map + jax.jit per call
    # would retrace the full pipeline schedule on every eager invocation.
    jitted = {}

    def run(params, video: Optional[Modality] = None,
            audio: Optional[Modality] = None, video_pe=None):
        key = (
            jax.tree_util.tree_structure((params, video, audio)),
            None if video is None else video.timesteps.ndim,
            None if audio is None else audio.timesteps.ndim,
            None if video_pe is None else tuple(a.ndim for a in video_pe),
        )
        fn = jitted.get(key)
        if fn is None:
            param_specs = block_param_specs(params, axis)
            if seq_axis is None:
                mod_specs = lambda mod: (
                    None if mod is None
                    else jax.tree_util.tree_map(lambda _: batch_spec, mod)
                )
                pe_specs = None if video_pe is None else (batch_spec, batch_spec)
                out_specs = batch_spec
            else:
                mod_specs = lambda mod: (
                    None if mod is None
                    else pp_sp_modality_specs(mod, b, seq_axis)
                )
                def pe_spec_for(arr):
                    # SPLIT rope tables are 4-D with the token axis at dim
                    # 2; INTERLEAVED tables are 3-D (B, T, D) with tokens
                    # at dim 1 (review r4: a fixed 4-entry spec failed
                    # shard_map's rank check for INTERLEAVED under PPxSP).
                    if arr.ndim == 4:
                        return P(b, None, seq_axis, None)
                    if arr.ndim == 3:
                        return P(b, seq_axis, None)
                    raise ValueError(
                        f"unsupported RoPE table rank {arr.ndim} under PPxSP"
                    )

                pe_specs = (
                    None if video_pe is None
                    else tuple(pe_spec_for(a) for a in video_pe)
                )
                out_specs = P(b, seq_axis, None)
            if video is not None and audio is not None:
                out_specs = (out_specs, out_specs)
            # Under PP x TP the model axis stays OUT of the manual axis set:
            # GSPMD owns it (auto_axes inside the stage body inserts the TP
            # collectives), while pipe/data are manual (ppermute schedule).
            manual = frozenset(n for n in mesh.axis_names if n != model_axis)
            fn = jax.jit(jax.shard_map(
                forward,
                mesh=mesh,
                in_specs=(param_specs, mod_specs(video), mod_specs(audio), pe_specs),
                out_specs=out_specs,
                axis_names=manual,
            ))
            jitted[key] = fn
        return fn(params, video, audio, video_pe)

    return run
