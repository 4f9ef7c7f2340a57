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
# Block sizes adapt downward to whatever divides the token count — 6912
# tokens (768x1024x65f) takes (256, 256); the preferred tiles are fastest.
FLASH_BLOCK_Q = 512
FLASH_BLOCK_KV = 1024
FLASH_MIN_BLOCK = 128
FLASH_MIN_TOKENS = 2048


def _pick_block(t: int, preferred: int) -> Optional[int]:
    b = preferred
    while b >= FLASH_MIN_BLOCK:
        if t % b == 0:
            return b
        b //= 2
    return None


@lru_cache(maxsize=8)
def _flash_attention(block_q: int, block_kv: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    # Backward (dkv/dq) tile sizes make the kernel DIFFERENTIABLE — training
    # (ltx2_tpu/training) backprops through this path; without them the
    # custom VJP raises "not all backward blocks are specified".
    block_sizes = BlockSizes(
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

    def run(q, k, v, scale):
        return flash_attention(
            q, k, v, causal=False, sm_scale=scale, block_sizes=block_sizes
        )

    return run


def _use_flash(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    t_q, t_k = q.shape[2], k.shape[2]
    return (
        mask is None
        and jax.default_backend() == "tpu"
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
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    block_sizes = BlockSizes(
        block_q=block_q,
        block_k_major=block_kv,
        block_k=block_kv,
        block_b=1,
    )

    def run(q, k, v, scale, kv_valid):
        seg_q = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
        seg_kv = kv_valid.astype(jnp.int32)
        return flash_attention(
            q, k, v, segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
            causal=False, sm_scale=scale, block_sizes=block_sizes,
        )

    return run


def _use_flash_masked(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    if mask is None or jax.default_backend() != "tpu":
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
        bkv = _pick_block(k.shape[2], FLASH_BLOCK_KV)
        return _flash_attention(bq, bkv)(q, k, v, scale)
    if _use_flash_masked(q, k, mask):
        bq = _pick_block(q.shape[2], FLASH_BLOCK_Q)
        bkv = _pick_block(k.shape[2], FLASH_BLOCK_KV)
        kv_valid = mask[:, 0, 0, :] > _MASK_VALID_THRESHOLD  # (B, S)
        kv_valid = jnp.broadcast_to(kv_valid, (q.shape[0], k.shape[2]))
        return _flash_attention_masked(bq, bkv)(q, k, v, scale, kv_valid)
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
