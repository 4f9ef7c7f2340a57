"""Scaled dot-product attention for TPU.

The reference leans on mx.fast.scaled_dot_product_attention (attention.py:31,
67,141); here the equivalent is a bf16 einsum with fp32 softmax, with the
upstream jax.experimental.pallas.ops.tpu flash-attention kernel engaged for
long unmasked video-token sequences (see flash_attention() below).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp

# Flash kernel engages for unmasked self-attention when the sequence is long
# enough to tile cleanly. Tuned on v5e at 6k tokens: 8 ms/sample vs 17 ms
# for einsum — and O(T) memory, which is what lets CFG rows batch without
# materializing the (B, H, T, T) logits (14 GB at batch 2 / 6k tokens).
# Block sizes adapt to the largest multiple-of-128 divisor of the token
# count (_pick_block): 6912 tokens (768x1024x65f) tiles at (384, 768),
# 3456 at (384, 384); the preferred tiles are fastest when they divide.
FLASH_BLOCK_Q = 512
FLASH_BLOCK_KV = 1024
FLASH_MIN_BLOCK = 128
FLASH_MIN_TOKENS = 2048


def _pick_block(t: int, preferred: int) -> Optional[int]:
    """Largest multiple of FLASH_MIN_BLOCK that divides t, capped at
    `preferred`. A divisor search (not just preferred/2^k): 3456 tokens
    (512x768x65f) takes 384 rather than degrading to 128, and 6912
    (768x1024x65f) takes kv 768 — tiny tiles starve the MXU (measured
    ~2x attention-phase cost at 128 vs 384 on the v5e)."""
    start = (min(preferred, t) // FLASH_MIN_BLOCK) * FLASH_MIN_BLOCK
    for b in range(start, FLASH_MIN_BLOCK - 1, -FLASH_MIN_BLOCK):
        if t % b == 0:
            return b
    return None


# kv tiles may exceed the preferred size when the token count forces the
# capped search below it: a bigger K/V tile amortizes the q-tile reload —
# measured on the v5e: 4992 tokens (768x512x97f full-res) runs 29% faster
# at (384, 1664) than (384, 384), 3456 10% faster at (384, 1152). Bounded
# at 2048 (~1 MB K+V VMEM, compile-verified); the Q side stays capped —
# block_q >= 1664 fails to compile (backward dq/dkv tile pressure).
FLASH_MAX_KV_OVER = 2048


def _pick_kv_block(t: int, preferred: int) -> Optional[int]:
    """kv block choice: the capped divisor when it is big enough not to
    starve the pipeline (>= FLASH_BLOCK_Q — at 6144 the preferred
    (512, 1024) beats every larger tile, and at 6912 the capped 768 is
    healthy), else the smallest multiple-of-128 divisor in
    (preferred, 2048] when one exists (measured faster than the
    forced-small tile), else the capped divisor."""
    capped = _pick_block(t, preferred)
    if capped is None or capped >= FLASH_BLOCK_Q:
        return capped
    over = preferred + FLASH_MIN_BLOCK
    while over <= min(FLASH_MAX_KV_OVER, t):
        if t % over == 0:
            return over
        over += FLASH_MIN_BLOCK
    return capped


def _flash_backend_ok() -> bool:
    """Test seam: flash needs the TPU mosaic backend (tests monkeypatch this
    to exercise the sharded dispatch machinery on CPU with a stand-in)."""
    return jax.default_backend() == "tpu"


# Trace-time engagement log for the sharded flash paths: tests assert the
# kernel path is ENGAGED (not just numerically equal) under TP / SP x TP
# meshes. Keys: "flash", "flash_tp", "flash_masked", "flash_masked_tp".
FLASH_ENGAGEMENTS: dict = {}


def _note_engagement(kind: str) -> None:
    FLASH_ENGAGEMENTS[kind] = FLASH_ENGAGEMENTS.get(kind, 0) + 1


def _free_mesh_axes():
    """The ambient mesh's non-Manual axes, or None when no mesh is active.

    Under a TP-only GSPMD jit (entry points run inside
    `jax.sharding.use_mesh(mesh)`) every axis is free; inside a
    partial-manual shard_map (SP x TP: manual over data/seq/pipe, 'model'
    auto) only the auto axes are free. A shard_map over ALL free axes makes
    the region fully manual — the only context where a Pallas kernel is
    legal on sharded operands.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return None
    try:
        from jax.sharding import AxisType

        free = [
            name
            for name, ty in zip(am.axis_names, am.axis_types)
            if ty != AxisType.Manual
        ]
    except Exception:
        free = list(am.axis_names)
    return am, free


def _flash_shard_ctx(batch: int, heads: int):
    """(mesh, axis_names, batch_axis) for shard-mapping flash over the
    ambient mesh, or None to call the kernel directly.

    The head axis shards over 'model' (Megatron TP layout); the batch axis
    shards over 'data' when divisible (CFG rows ride 'data'). Sequence and
    head_dim stay whole per shard — flash partitions trivially over batch
    and heads only.
    """
    ctx = _free_mesh_axes()
    if ctx is None:
        return None
    am, free = ctx
    if not free:
        return None
    sizes = dict(am.shape)
    tp = sizes.get("model", 1) if "model" in free else 1
    if tp <= 1:
        return None  # no head sharding in play: call the kernel directly
    if heads % tp != 0:
        return None
    data = sizes.get("data", 1) if "data" in free else 1
    b_axis = "data" if data > 1 and batch % data == 0 else None
    return am, frozenset(free), b_axis


def _shard_mapped(fn, n_args, batch: int, heads: int, extra_batch_specs=0):
    """Wrap a per-shard flash call in a fully-manual shard_map over the
    ambient mesh's free axes, heads on 'model' (+ batch on 'data' when it
    divides). Returns None when there is no mesh/TP context — the caller
    then invokes the kernel directly. Differentiable: grads flow through
    shard_map into the kernel's custom VJP, which runs per-shard.

    extra_batch_specs: count of trailing operands that shard only on the
    batch axis (e.g. the masked path's (B, S) kv_valid)."""
    ctx = _flash_shard_ctx(batch, heads)
    if ctx is None:
        return None
    am, axis_names, b_axis = ctx
    from jax.sharding import PartitionSpec as P

    qkv_spec = P(b_axis, "model", None, None)
    in_specs = (qkv_spec,) * n_args + (P(b_axis, None),) * extra_batch_specs
    return jax.shard_map(
        fn,
        mesh=am,
        in_specs=in_specs,
        out_specs=qkv_spec,
        axis_names=axis_names,
        check_vma=False,
    )


def _full_block_sizes(block_q: int, block_kv: int):
    """Forward AND backward (dkv/dq) tile sizes: the backward tiles make
    the Pallas kernel DIFFERENTIABLE — training (ltx2_tpu/training)
    backprops through both the plain and the masked flash paths; without
    them the custom VJP raises "not all backward blocks are specified"."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    return BlockSizes(
        block_q=block_q,
        block_k_major=block_kv,
        block_k=block_kv,
        block_b=1,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_kv,
        block_k_dkv=block_kv,
        block_q_dkv=block_q,
        block_k_major_dq=block_kv,
        block_k_dq=block_kv,
        block_q_dq=block_q,
    )


@lru_cache(maxsize=8)
def _flash_attention(block_q: int, block_kv: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    block_sizes = _full_block_sizes(block_q, block_kv)

    def run(q, k, v, scale):
        return flash_attention(
            q, k, v, causal=False, sm_scale=scale, block_sizes=block_sizes
        )

    return run


def _use_flash(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    t_q, t_k = q.shape[2], k.shape[2]
    return (
        mask is None
        and _flash_backend_ok()
        and t_q == t_k
        and t_q >= FLASH_MIN_TOKENS
        and _pick_block(t_q, FLASH_BLOCK_Q) is not None
        and _pick_block(t_k, FLASH_BLOCK_KV) is not None
        and q.shape[-1] % 128 == 0
    )


# Masked flash: a KEY-ONLY additive mask (B, 1, 1, S) — the text cross-attn
# padding mask — is exactly expressible as flash segment ids (q all segment
# 1, padded keys segment 0), so CFG rows with real Gemma masks keep O(T)
# memory instead of falling back to (B, H, N, S) einsum logits.
_MASK_VALID_THRESHOLD = -1e30  # additive masks use -0.7 * finfo.max


@lru_cache(maxsize=8)
def _flash_attention_masked(block_q: int, block_kv: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    block_sizes = _full_block_sizes(block_q, block_kv)

    def run(q, k, v, scale, kv_valid):
        seg_q = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
        seg_kv = kv_valid.astype(jnp.int32)
        return flash_attention(
            q, k, v, segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
            causal=False, sm_scale=scale, block_sizes=block_sizes,
        )

    return run


def _use_flash_masked(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    # CONTRACT (see sdpa docstring): additive masks are binary — 0 =
    # attend, <= -1e30 = masked. A key-only (B,1,1,S) mask routed here is
    # binarized into flash segment ids at that threshold; a finite SOFT
    # bias would be silently dropped on this path (and applied on the
    # einsum path), so never pass one (review r4: made explicit).
    if mask is None or not _flash_backend_ok():
        return False
    if mask.ndim != 4 or mask.shape[2] != 1 or mask.shape[1] != 1:
        return False  # query-dependent mask: einsum path
    return (
        q.shape[2] >= FLASH_MIN_TOKENS
        and _pick_block(q.shape[2], FLASH_BLOCK_Q) is not None
        and _pick_block(k.shape[2], FLASH_BLOCK_KV) is not None
        and q.shape[-1] % 128 == 0
    )


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head SDPA over (B, H, T, D) tensors with optional additive mask.

    mask broadcasts against (B, H, T_q, T_k); additive float (0 = attend,
    -finfo.max = masked), matching the reference's mask convention
    (model.py:163-201).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_flash(q, k, mask):
        bq = _pick_block(q.shape[2], FLASH_BLOCK_Q)
        bkv = _pick_kv_block(k.shape[2], FLASH_BLOCK_KV)
        run = _flash_attention(bq, bkv)
        # Head-sharded dispatch: under a TP ('model'-axis) mesh the kernel
        # runs per-shard on local heads via a fully-manual shard_map (a
        # Pallas call has no GSPMD partition rule, so without this the
        # partitioner would have to gather heads and replicate the work).
        sharded = _shard_mapped(
            lambda qq, kk, vv: run(qq, kk, vv, scale), 3,
            q.shape[0], q.shape[1],
        )
        if sharded is not None:
            _note_engagement("flash_tp")
            return sharded(q, k, v)
        _note_engagement("flash")
        return run(q, k, v, scale)
    if _use_flash_masked(q, k, mask):
        bq = _pick_block(q.shape[2], FLASH_BLOCK_Q)
        bkv = _pick_kv_block(k.shape[2], FLASH_BLOCK_KV)
        kv_valid = mask[:, 0, 0, :] > _MASK_VALID_THRESHOLD  # (B, S)
        kv_valid = jnp.broadcast_to(kv_valid, (q.shape[0], k.shape[2]))
        run = _flash_attention_masked(bq, bkv)
        sharded = _shard_mapped(
            lambda qq, kk, vv, kvv: run(qq, kk, vv, scale, kvv), 3,
            q.shape[0], q.shape[1], extra_batch_specs=1,
        )
        if sharded is not None:
            _note_engagement("flash_masked_tp")
            return sharded(q, k, v, kv_valid)
        _note_engagement("flash_masked")
        return run(q, k, v, scale, kv_valid)
    # Einsum fallback with fp32 softmax (short sequences, masked
    # cross-attention, CPU). Benchmarked on v5e at 6k tokens: 18 ms vs
    # 345 ms for jax.nn.dot_product_attention. The QK dot stores logits in
    # the input dtype (XLA still accumulates fp32 inside the MXU) —
    # requesting fp32 logit OUTPUT costs 20x in HBM writes at these sizes.
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def sdpa_tokens(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    dim_head: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over token-major (B, T, H*D) tensors (the DiT layout).

    Equivalent of the reference's compiled attention core
    (attention.py:11-85): head split, SDPA, head merge — one fused region
    under jit.
    """
    b, t_q, _ = q.shape
    t_k = k.shape[1]
    qh = q.reshape(b, t_q, heads, dim_head).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t_k, heads, dim_head).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t_k, heads, dim_head).transpose(0, 2, 1, 3)
    if mask is not None and mask.ndim == 2:
        mask = mask[None, None, :, :]
    elif mask is not None and mask.ndim == 3:
        mask = mask[:, None, :, :]
    out = sdpa(qh, kh, vh, mask=mask)
    return out.transpose(0, 2, 1, 3).reshape(b, t_q, heads * dim_head)
