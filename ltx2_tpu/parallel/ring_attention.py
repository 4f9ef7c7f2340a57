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
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]

    b, h, t, d = q.shape
    use_flash = inner == "flash" or (inner == "auto" and _flash_inner_ok(q, k))

    # Accumulators derive from q so they inherit BOTH its vma (varying over
    # the ring axis — fori_loop carry types must line up) and, under SP x TP,
    # its explicit head-axis sharding over the model axis.
    q32 = q[..., 0].astype(jnp.float32)
    m0 = jnp.full_like(q32, -jnp.inf)
    l0 = jnp.zeros_like(q32)
    o0 = jnp.zeros_like(q, dtype=jnp.float32)

    block_attn = _flash_block_residuals if use_flash else _dense_block_residuals

    def body(_, carry):
        k_blk, v_blk, m, l, o = carry
        # Per-block attention -> (normalized out, normalizer l, running max m)
        o_b, l_b, m_b = block_attn(q, k_blk, v_blk, scale)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        l = l * alpha + l_b * beta
        o = o * alpha[..., None] + o_b.astype(jnp.float32) * (l_b * beta)[..., None]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return k_blk, v_blk, m_new, l, o

    _, _, _, l, o = jax.lax.fori_loop(0, n, body, (k, v, m0, l0, o0))
    return (o / l[..., None]).astype(q.dtype)


# Pallas flash tiling for the ring inner (matches ops/attention.py tuning).
RING_FLASH_BLOCK_Q = 512
RING_FLASH_BLOCK_KV = 1024


def _flash_inner_ok(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Static gate for the Pallas flash inner."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    try:
        # SP x TP: heads explicitly sharded over the model axis — the Pallas
        # custom call has no GSPMD partition rule, so fall back to the dense
        # inner (its einsums partition fine).
        if any(s is not None for s in tuple(jax.typeof(q).sharding.spec)):
            return False
    except Exception:
        pass
    _b, _h, tq, d = q.shape
    tk = k.shape[2]
    return (
        backend == "tpu"
        and d % 128 == 0
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


def _flash_block_residuals(q, k_blk, v_blk, scale):
    """(out_normalized, l, m) from the Pallas flash kernel's softmax
    residuals (the same l/m its backward pass uses)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        _flash_attention_impl,
    )

    o, l, m = _flash_attention_impl(
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
