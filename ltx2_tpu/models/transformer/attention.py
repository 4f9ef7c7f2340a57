"""LTX-2 DiT attention layer (functional).

Capability parity with reference LTX_2_MLX/model/transformer/attention.py:
QKV linears with bias, RMSNorm on the FULL inner-dim Q/K (not per-head,
attention.py:186-187,231-232), RoPE on Q/K with optional separate k_pe for
cross-modal attention, and V2 per-head sigmoid gating 2*sigma(gate_logits)
(attention.py:243-250).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.core import rms_norm
from ltx2_tpu.ops.attention import sdpa_tokens
from ltx2_tpu.ops.common import Params, init_linear, linear, linear_row_parallel
from ltx2_tpu.ops.rope import LTXRopeType, apply_rotary_emb


@dataclass(frozen=True)
class AttentionConfig:
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    norm_eps: float = 1e-6
    rope_type: LTXRopeType = LTXRopeType.SPLIT
    apply_gated_attention: bool = False
    # Sequence parallelism (only meaningful under shard_map): mesh axis name
    # along which the token dim is sharded. Self-attention goes through ring
    # attention; cross-modal attention all-gathers its K/V (gather_context).
    sequence_axis: Optional[str] = None
    # SP x TP composition: mesh axis the weights are feature-sharded over
    # (Megatron column/row rules) while tokens stay sharded over
    # sequence_axis. Column-parallel projections and head-sharded attention
    # propagate through explicit sharding with no code; the row-parallel
    # output projection resolves its contraction under auto_axes (psum over
    # this axis, inserted by GSPMD).
    tp_axis: Optional[str] = None

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head


def attention_apply(
    p: Params,
    cfg: AttentionConfig,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    k_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    gather_context: bool = False,
    cached_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Attention forward over (B, T, D) tokens.

    With cfg.sequence_axis set (token axis sharded under shard_map):
    - self-attention (context is None, no mask) runs ring attention;
    - cross-modal attention passes gather_context=True so the token-sharded
      K/V are all-gathered to full length (queries stay local);
    - text cross-attention passes gather_context=False — its context is
      replicated, nothing to do.

    cached_kv: precomputed (k, v) — already projected and k-normed — for
    step-invariant contexts (V1 text cross-attn KV caching across the
    denoise loop; see model.precompute_text_kv).
    """
    q = linear(p["to_q"], x)
    q = rms_norm(q, p["q_norm"]["weight"], cfg.norm_eps)

    if cached_kv is not None:
        k, v = cached_kv
    else:
        ctx = x if context is None else context
        k = linear(p["to_k"], ctx)
        v = linear(p["to_v"], ctx)
        k = rms_norm(k, p["k_norm"]["weight"], cfg.norm_eps)

    if pe is not None:
        q = apply_rotary_emb(q, pe, cfg.rope_type)
        if cached_kv is None:
            k = apply_rotary_emb(k, pe if k_pe is None else k_pe, cfg.rope_type)

    axis = cfg.sequence_axis
    if axis is not None and context is None and mask is not None:
        raise NotImplementedError(
            "masked SELF-attention under sequence parallelism: the ring "
            "inner has no mask path — pad token counts to a multiple of "
            "the seq axis instead of bucketing (token_mask)"
        )
    if axis is not None and context is None and mask is None:
        from ltx2_tpu.parallel.ring_attention import ring_attention_local

        b, t, _ = q.shape

        def heads_major(z):
            return z.reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)

        out = ring_attention_local(
            heads_major(q), heads_major(k), heads_major(v), axis_name=axis,
            model_axis=cfg.tp_axis,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.inner_dim)
    else:
        if axis is not None and gather_context:
            k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        out = sdpa_tokens(q, k, v, cfg.heads, cfg.dim_head, mask=mask)

    if cfg.apply_gated_attention:
        gate_logits = linear(p["to_gate_logits"], x)  # (B, T, H)
        b, t, _ = out.shape
        gates = 2.0 * jax.nn.sigmoid(gate_logits.astype(jnp.float32)).astype(out.dtype)
        out = (
            out.reshape(b, t, cfg.heads, cfg.dim_head) * gates[..., None]
        ).reshape(b, t, cfg.heads * cfg.dim_head)

    return linear_row_parallel(p["to_out"], out, cfg.tp_axis)


def init_attention(key: jax.Array, cfg: AttentionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    context_dim = cfg.query_dim if cfg.context_dim is None else cfg.context_dim
    inner = cfg.inner_dim
    p: Params = {
        "to_q": init_linear(ks[0], cfg.query_dim, inner, dtype=dtype),
        "to_k": init_linear(ks[1], context_dim, inner, dtype=dtype),
        "to_v": init_linear(ks[2], context_dim, inner, dtype=dtype),
        "to_out": init_linear(ks[3], inner, cfg.query_dim, dtype=dtype),
        "q_norm": {"weight": jnp.ones((inner,), dtype)},
        "k_norm": {"weight": jnp.ones((inner,), dtype)},
    }
    if cfg.apply_gated_attention:
        p["to_gate_logits"] = init_linear(ks[4], cfg.query_dim, cfg.heads, dtype=dtype)
    return p


def feed_forward_apply(
    p: Params, x: jnp.ndarray, tp_axis: Optional[str] = None
) -> jnp.ndarray:
    """Linear -> gelu_tanh -> Linear, mult=4 (feed_forward.py:29-54).

    XLA fuses the GELU into the first matmul's epilogue on TPU. tp_axis:
    Megatron split — project_in column-parallel (automatic under explicit
    sharding), project_out row-parallel (psum via linear_row_parallel).
    """
    h = linear(p["project_in"]["proj"], x)
    h = jax.nn.gelu(h, approximate=True)
    return linear_row_parallel(p["project_out"], h, tp_axis)


def swiglu_apply(
    p: Params, x: jnp.ndarray, tp_axis: Optional[str] = None
) -> jnp.ndarray:
    """SwiGLU alternative FFN (feed_forward.py:57-74)."""
    from ltx2_tpu.ops.common import silu_mul

    return linear_row_parallel(
        p["w_down"], silu_mul(linear(p["w_gate"], x), linear(p["w_up"], x)), tp_axis
    )


def init_feed_forward(
    key: jax.Array, dim: int, dim_out: int, mult: int = 4, dtype=jnp.float32
) -> Params:
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {
        "project_in": {"proj": init_linear(k1, dim, inner, dtype=dtype)},
        "project_out": init_linear(k2, inner, dim_out, dtype=dtype),
    }
