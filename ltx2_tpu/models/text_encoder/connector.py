"""1D embeddings connector (text-feature refiner).

Capability parity with reference
LTX_2_MLX/model/text_encoder/connector.py (Embeddings1DConnector):
V1 = 2 blocks of 30 heads x 128 d; V2.3 = 8 blocks with gated attention and
config from checkpoint metadata. Learnable registers: 128 register tokens
tiled and APPENDED to extend the sequence to >= 1024 tokens; the attention
mask is then cleared so everything attends (connector.py:175-228). RoPE over
token index, f64 frequency grid when the checkpoint says so.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.core import rms_norm
from ltx2_tpu.models.transformer.attention import (
    AttentionConfig,
    attention_apply,
    feed_forward_apply,
    init_attention,
    init_feed_forward,
)
from ltx2_tpu.ops.common import Params
from ltx2_tpu.ops.rope import LTXRopeType, precompute_freqs_cis


@dataclass(frozen=True)
class ConnectorConfig:
    attention_head_dim: int = 128
    num_attention_heads: int = 30
    num_layers: int = 2
    positional_embedding_theta: float = 10000.0
    positional_embedding_max_pos: Tuple[int, ...] = (1,)
    num_learnable_registers: Optional[int] = 128
    rope_type: LTXRopeType = LTXRopeType.INTERLEAVED
    norm_eps: float = 1e-6
    apply_gated_attention: bool = False
    double_precision_rope: bool = False
    min_sequence_length: int = 1024

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    def attention_config(self) -> AttentionConfig:
        return AttentionConfig(
            query_dim=self.inner_dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            norm_eps=self.norm_eps,
            rope_type=self.rope_type,
            apply_gated_attention=self.apply_gated_attention,
        )


def _block_apply(
    p: Params,
    cfg: ConnectorConfig,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    pe,
) -> jnp.ndarray:
    """RMSNorm -> self-attn (RoPE) -> +res; RMSNorm -> FFN -> +res
    (BasicTransformerBlock1D, connector.py:13-98)."""
    attn_cfg = cfg.attention_config()
    h = attention_apply(p["attn1"], attn_cfg, rms_norm(x, None, cfg.norm_eps), mask=mask, pe=pe)
    x = x + h
    h = feed_forward_apply(p["ff"], rms_norm(x, None, cfg.norm_eps))
    return x + h


def append_learnable_registers(
    registers: jnp.ndarray,
    hidden_states: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    min_sequence_length: int = 1024,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Extend sequence to >= min_sequence_length with tiled registers;
    clear the mask (connector.py:175-228)."""
    batch, seq_len, hidden_dim = hidden_states.shape
    num_registers = registers.shape[0]

    target_len = max(min_sequence_length, seq_len)
    num_dup = math.ceil(target_len / num_registers)
    tiled = jnp.tile(registers, (num_dup, 1))
    extra = tiled[seq_len:]
    if extra.shape[0] > 0:
        extra_b = jnp.broadcast_to(
            extra[None], (batch, extra.shape[0], hidden_dim)
        ).astype(hidden_states.dtype)
        hidden_states = jnp.concatenate([hidden_states, extra_b], axis=1)

    new_len = hidden_states.shape[1]
    if attention_mask is not None:
        attention_mask = jnp.zeros((1, 1, 1, new_len), attention_mask.dtype)
    return hidden_states, attention_mask


def connector_apply(
    params: Params,
    cfg: ConnectorConfig,
    hidden_states: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Connector forward (connector.py:230-283). Returns (states, mask)."""
    if cfg.num_learnable_registers:
        hidden_states, attention_mask = append_learnable_registers(
            params["learnable_registers"],
            hidden_states,
            attention_mask,
            cfg.min_sequence_length,
        )

    seq_len = hidden_states.shape[1]
    indices_grid = jnp.arange(seq_len, dtype=jnp.float32)[None, None, :]
    pe = precompute_freqs_cis(
        indices_grid=indices_grid,
        dim=cfg.inner_dim,
        out_dtype=hidden_states.dtype,
        theta=cfg.positional_embedding_theta,
        max_pos=list(cfg.positional_embedding_max_pos),
        num_attention_heads=cfg.num_attention_heads,
        rope_type=cfg.rope_type,
        use_double_precision=cfg.double_precision_rope,
    )

    for block in params["transformer_1d_blocks"]:
        hidden_states = _block_apply(block, cfg, hidden_states, attention_mask, pe)

    hidden_states = rms_norm(hidden_states, None, cfg.norm_eps)

    if attention_mask is None:
        attention_mask = jnp.zeros(
            (hidden_states.shape[0], 1, 1, hidden_states.shape[1]), hidden_states.dtype
        )
    return hidden_states, attention_mask


def init_connector(key: jax.Array, cfg: ConnectorConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.num_layers + 1)
    blocks = []
    for i in range(cfg.num_layers):
        ka, kf = jax.random.split(ks[i])
        blocks.append(
            {
                "attn1": init_attention(ka, cfg.attention_config(), dtype),
                "ff": init_feed_forward(kf, cfg.inner_dim, cfg.inner_dim, dtype=dtype),
            }
        )
    p: Params = {"transformer_1d_blocks": blocks}
    if cfg.num_learnable_registers:
        p["learnable_registers"] = jax.random.uniform(
            ks[-1], (cfg.num_learnable_registers, cfg.inner_dim), dtype, -1.0, 1.0
        )
    return p
