"""Ring attention: sequence-parallel self-attention over a mesh axis.

The reference is single-device and has no sequence parallelism (SURVEY.md
§2.12) — this is new TPU-first design for long clips, where the video token
count (F·H·W ≈ 6k at 768×512×121f, ~50k at 4K) outgrows one chip's HBM or
compute.

Mechanics: Q, K, V are sharded along the token axis across the `seq` mesh
axis. Each device keeps its Q shard resident and streams every K/V shard
past it around the ring with `jax.lax.ppermute` (neighbor exchange rides
ICI). Attention is accumulated block-online — running max `m`, normalizer
`l`, and un-normalized output `o` in fp32, rescaled as new blocks arrive —
so the full (T, T) score matrix never materializes and per-device memory is
O(T_local · T_local) per step. Compute and communication overlap naturally:
XLA schedules the next ppermute alongside the current block's matmuls.

This targets the DiT's UNMASKED bidirectional self-attention (attention
order is irrelevant to the online softmax). Text cross-attention does not
need it: the ≤1024-token context replicates cheaply and each device attends
its local queries against the full context with zero communication.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
    inner: str = "auto",
    model_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Per-device body (call inside shard_map). q/k/v: (B, H, T_local, D).

    Runs `n = mesh size along axis_name` accumulation steps, rotating the
    K/V shard one neighbor per step.

    inner: how each (q_local, kv_block) attention is computed.
      "dense"  — materialize the (T_local, T_local) block scores (fine for
                 shards up to a few thousand tokens);
      "flash"  — the Pallas flash kernel with softmax residuals: O(block)
                 memory, MXU-rate compute (use for very long shards);
      "auto"   — flash when on TPU and the shapes meet the kernel's tiling
                 constraints, dense otherwise.

    model_axis (SP x TP): mesh axis the attention heads are feature-sharded
    over, left AUTO by the enclosing shard_map. The flash inner nests a
    fully-manual shard_map over it so the Pallas kernel runs on local heads
    — the axis is invisible at trace time (GSPMD owns it), so the caller
    must name it (attention_apply passes cfg.tp_axis).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]

    b, h, t, d = q.shape
    use_flash = inner == "flash" or (
        inner == "auto" and _flash_inner_ok(q, k, model_axis)
    )

    # Accumulators derive from q so they inherit its vma (varying over the
    # ring axis — fori_loop carry types must line up).
    q32 = q[..., 0].astype(jnp.float32)
    m0 = jnp.full_like(q32, -jnp.inf)
    l0 = jnp.zeros_like(q32)
    o0 = jnp.zeros_like(q, dtype=jnp.float32)

    if use_flash:
        block_attn = partial(_flash_block_residuals, model_axis=model_axis)
    else:
        block_attn = _dense_block_residuals

    def accumulate(k_blk, v_blk, m, l, o):
        # Per-block attention -> (normalized out, normalizer l, running max m)
        o_b, l_b, m_b = block_attn(q, k_blk, v_blk, scale)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        l = l * alpha + l_b * beta
        o = o * alpha[..., None] + o_b.astype(jnp.float32) * (l_b * beta)[..., None]
        return m_new, l, o

    def body(_, carry):
        k_blk, v_blk, m, l, o = carry
        m, l, o = accumulate(k_blk, v_blk, m, l, o)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return k_blk, v_blk, m, l, o

    # n-1 rotations, not n: the last block needs no exchange after it —
    # the trailing ppermute's K/V were computed and discarded, 1/n extra
    # ICI traffic on the hottest path (review r4).
    k_blk, v_blk, m, l, o = jax.lax.fori_loop(0, n - 1, body, (k, v, m0, l0, o0))
    _, l, o = accumulate(k_blk, v_blk, m, l, o)
    return (o / l[..., None]).astype(q.dtype)


# Pallas flash tiling for the ring inner (matches ops/attention.py tuning).
RING_FLASH_BLOCK_Q = 512
RING_FLASH_BLOCK_KV = 1024


def _flash_inner_ok(
    q: jnp.ndarray, k: jnp.ndarray, model_axis: Optional[str] = None
) -> bool:
    """Static gate for the Pallas flash inner.

    With model_axis set (SP x TP, heads feature-sharded over the auto
    'model' axis), `_flash_block_residuals` nests a fully-manual shard_map
    over that axis so the kernel runs on local heads — the per-shard
    token/head_dim tiling constraints are unchanged (tokens/head_dim are
    never sharded here). Heads must divide the axis size."""
    from ltx2_tpu.ops.attention import _flash_backend_ok

    if not _flash_backend_ok():
        return False
    if model_axis is not None:
        try:
            am = jax.sharding.get_abstract_mesh()
            if q.shape[1] % dict(am.shape)[model_axis] != 0:
                return False
        except Exception:
            return False
    else:
        # Without a named model axis the kernel runs directly on the
        # operands; if any non-ring mesh axis still shards them (e.g. a
        # caller composing ring_sdpa with head-sharded q/k/v and auto
        # GSPMD axes), a Pallas call has no partition rule — fall back to
        # the dense inner, which GSPMD partitions fine.
        try:
            spec = jax.typeof(q).sharding.spec
            if any(s is not None for s in spec):
                return False
        except Exception:
            pass
    _b, _h, tq, d = q.shape
    tk = k.shape[2]
    return (
        d % 128 == 0
        and tq % RING_FLASH_BLOCK_Q == 0
        and tk % RING_FLASH_BLOCK_KV == 0
    )


def _dense_block_residuals(q, k_blk, v_blk, scale):
    """(out_normalized, l, m) via materialized block scores."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk)
    return o.astype(jnp.float32) / l[..., None], l, m


def _flash_impl_residuals(q, k_blk, v_blk, scale):
    """Raw per-shard kernel call (test seam — CPU tests monkeypatch this
    with a dense math-equivalent to drive the sharded dispatch)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        _flash_attention_impl,
    )

    return _flash_attention_impl(
        q, k_blk, v_blk,
        None,  # ab
        None,  # segment_ids
        True,  # save_residuals
        False,  # causal
        scale,
        1,  # block_b
        RING_FLASH_BLOCK_Q,
        RING_FLASH_BLOCK_KV,
        RING_FLASH_BLOCK_KV,
        False,  # debug
    )


# Trace-time engagement log (tests assert flash is ENGAGED, not just equal).
# Keys: "ring_flash", "ring_flash_tp".
RING_ENGAGEMENTS: dict = {}


def _flash_block_residuals(q, k_blk, v_blk, scale, model_axis=None):
    """(out_normalized, l, m) from the Pallas flash kernel's softmax
    residuals (the same l/m its backward pass uses).

    SP x TP: when heads are feature-sharded over the (auto) model axis, the
    kernel runs inside a nested fully-manual shard_map over that axis —
    Pallas calls have no GSPMD partition rule, so this is what keeps the
    ring inner at kernel efficiency instead of a dense fallback."""
    axis = model_axis
    if axis is not None:
        am = jax.sharding.get_abstract_mesh()
        P_ = P
        impl = jax.shard_map(
            lambda qq, kk, vv: _flash_impl_residuals(qq, kk, vv, scale),
            mesh=am,
            in_specs=(P_(None, axis, None, None),) * 3,
            out_specs=(
                P_(None, axis, None, None),
                P_(None, axis, None),
                P_(None, axis, None),
            ),
            axis_names=frozenset({axis}),
            check_vma=False,
        )
        RING_ENGAGEMENTS["ring_flash_tp"] = RING_ENGAGEMENTS.get("ring_flash_tp", 0) + 1
        o, l, m = impl(q, k_blk, v_blk)
    else:
        RING_ENGAGEMENTS["ring_flash"] = RING_ENGAGEMENTS.get("ring_flash", 0) + 1
        o, l, m = _flash_impl_residuals(q, k_blk, v_blk, scale)
    return o.astype(jnp.float32), l.astype(jnp.float32), m.astype(jnp.float32)


def ring_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    scale: Optional[float] = None,
    inner: str = "auto",
) -> jnp.ndarray:
    """Sequence-parallel SDPA over (B, H, T, D) with T sharded on `axis_name`.

    Other mesh axes are untouched (specs name only the seq axis), so this
    composes with data/tensor parallelism on the same mesh."""
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        partial(ring_attention_local, axis_name=axis_name, scale=scale, inner=inner),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
