"""Gemma feature extractors (V1 and V2).

Capability parity with reference
LTX_2_MLX/model/text_encoder/feature_extractor.py:
- V1 (GemmaFeaturesExtractorProjLinear): stack 49 hidden states -> per-layer
  masked range-normalization over valid tokens -> concat (B, T, 3840*49) ->
  single bias-free Linear -> 3840.
- V2 (GemmaFeaturesExtractorV2, LTX-2.3): per-token RMS norm variant; dual
  heads projecting DIRECTLY to video 4096 / audio 2048 with sqrt(dim ratio)
  input scaling.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.ops.common import Params, linear


def norm_and_concat_padded_batch(
    encoded_text: jnp.ndarray,
    sequence_lengths: jnp.ndarray,
    padding_side: str = "right",
) -> jnp.ndarray:
    """Per-batch per-layer masked range normalization (V1,
    feature_extractor.py:9-76).

    encoded_text: (B, T, D, L); returns (B, T, D*L) with padding zeroed.
    """
    b, t, d, num_layers = encoded_text.shape
    eps = 1e-6

    token_indices = jnp.arange(t)[None, :]
    if padding_side == "right":
        mask = token_indices < sequence_lengths[:, None]
    elif padding_side == "left":
        mask = token_indices >= (t - sequence_lengths[:, None])
    else:
        raise ValueError(f"padding_side must be 'left' or 'right', got {padding_side}")

    mask4 = mask[:, :, None, None]
    x = encoded_text.astype(jnp.float32)
    masked = jnp.where(mask4, x, 0.0)

    denom = (sequence_lengths * d).reshape(b, 1, 1, 1).astype(jnp.float32)
    mean = masked.sum(axis=(1, 2), keepdims=True) / (denom + eps)

    large = 1e9
    x_min = jnp.where(mask4, x, large).min(axis=(1, 2), keepdims=True)
    x_max = jnp.where(mask4, x, -large).max(axis=(1, 2), keepdims=True)
    range_ = x_max - x_min

    normed = 8.0 * (x - mean) / (range_ + eps)
    normed = normed.reshape(b, t, d * num_layers)
    return jnp.where(mask[:, :, None], normed, 0.0).astype(encoded_text.dtype)


def extract_features_v1(
    params: Params,
    hidden_states: jnp.ndarray,
    attention_mask: jnp.ndarray,
    padding_side: str = "left",
) -> jnp.ndarray:
    """V1 path: norm -> concat -> aggregate_embed Linear
    (feature_extractor.py:125-157).

    hidden_states: (L, B, T, D) stacked (the gemma3_apply output layout).
    """
    stacked = jnp.transpose(hidden_states, (1, 2, 3, 0))  # (B, T, D, L)
    sequence_lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
    normed = norm_and_concat_padded_batch(stacked, sequence_lengths, padding_side)
    return linear(params["aggregate_embed"], normed)


def norm_and_concat_per_token_rms(
    encoded_text: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-token RMS normalization (V2, feature_extractor.py:160-178).

    encoded_text: (B, T, D, L); returns (B, T, D*L)."""
    b, t, d, num_layers = encoded_text.shape
    x = encoded_text.astype(jnp.float32)
    variance = jnp.mean(x * x, axis=2, keepdims=True)
    normed = x * jax.lax.rsqrt(variance + 1e-6)
    normed = normed.reshape(b, t, d * num_layers)
    mask = attention_mask.astype(bool)[:, :, None]
    return jnp.where(mask, normed, 0.0).astype(encoded_text.dtype)


def extract_features_v2(
    params: Params,
    hidden_states: jnp.ndarray,
    attention_mask: jnp.ndarray,
    hidden_dim: int = 3840,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """V2 path: per-token RMS norm -> dual heads with sqrt(dim ratio) input
    scaling (feature_extractor.py:206-230). Returns (video, audio) features."""
    stacked = jnp.transpose(hidden_states, (1, 2, 3, 0))
    normed = norm_and_concat_per_token_rms(stacked, attention_mask)

    v_dim = params["video_aggregate_embed"]["weight"].shape[0]
    a_dim = params["audio_aggregate_embed"]["weight"].shape[0]
    video = linear(params["video_aggregate_embed"], normed * math.sqrt(v_dim / hidden_dim))
    audio = linear(params["audio_aggregate_embed"], normed * math.sqrt(a_dim / hidden_dim))
    return video, audio


def init_feature_extractor_v1(
    key: jax.Array, hidden_dim: int = 3840, num_layers: int = 49, dtype=jnp.float32
) -> Params:
    from ltx2_tpu.ops.common import init_linear

    return {
        "aggregate_embed": init_linear(
            key, hidden_dim * num_layers, hidden_dim, bias=False, dtype=dtype
        )
    }


def init_feature_extractor_v2(
    key: jax.Array,
    hidden_dim: int = 3840,
    num_layers: int = 49,
    video_inner_dim: int = 4096,
    audio_inner_dim: int = 2048,
    dtype=jnp.float32,
) -> Params:
    from ltx2_tpu.ops.common import init_linear

    k1, k2 = jax.random.split(key)
    flat = hidden_dim * num_layers
    return {
        "video_aggregate_embed": init_linear(k1, flat, video_inner_dim, dtype=dtype),
        "audio_aggregate_embed": init_linear(k2, flat, audio_inner_dim, dtype=dtype),
    }
