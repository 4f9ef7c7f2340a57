"""Timestep embeddings and AdaLN-single parameter generation.

Capability parity with reference
LTX_2_MLX/model/transformer/timestep_embedding.py: DDPM sinusoidal embedding
(256-d, flip_sin_to_cos), 2-layer SiLU MLP, and AdaLayerNormSingle producing
`num_embeddings x D` AdaLN params plus the raw embedded timestep.

Functional: each block is `apply(params, ...)` over a checkpoint-shaped param
dict. Embedding math runs in fp32 (AdaLN tables are a known parity hazard,
SURVEY.md hard-parts #1).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.ops.common import Params, init_linear, linear


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """DDPM sinusoidal embeddings for possibly-fractional timesteps
    (timestep_embedding.py:10-60). Input (N,), output (N, embedding_dim)."""
    assert timesteps.ndim == 1, "Timesteps should be a 1d-array"
    half_dim = embedding_dim // 2

    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)

    emb = jnp.exp(exponent)
    emb = timesteps[:, None].astype(jnp.float32) * emb[None, :]
    emb = scale * emb

    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def timestep_embedding_apply(
    p: Params,
    sample: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """2-layer SiLU MLP over the sinusoidal embedding
    (timestep_embedding.py:89-124). Param keys: linear_1, linear_2[, cond_proj]."""
    if condition is not None and "cond_proj" in p:
        sample = sample + linear(p["cond_proj"], condition)
    sample = linear(p["linear_1"], sample)
    sample = jax.nn.silu(sample)
    return linear(p["linear_2"], sample)


def combined_timestep_embedding_apply(p: Params, timestep: jnp.ndarray) -> jnp.ndarray:
    """PixArtAlphaCombinedTimestepSizeEmbeddings: sinusoidal(256) -> MLP
    (timestep_embedding.py:127-163). Param keys: timestep_embedder.{linear_1,linear_2}."""
    proj = get_timestep_embedding(
        timestep, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0
    )
    return timestep_embedding_apply(p["timestep_embedder"], proj)


def adaln_single_apply(
    p: Params, timestep: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AdaLayerNormSingle (timestep_embedding.py:166-202).

    Returns (adaln_params (N, num_embeddings*D), embedded_timestep (N, D)).
    Param keys: emb.timestep_embedder.{linear_1,linear_2}, linear.
    """
    embedded_timestep = combined_timestep_embedding_apply(p["emb"], timestep)
    emb = jax.nn.silu(embedded_timestep)
    emb = linear(p["linear"], emb)
    return emb, embedded_timestep


def init_adaln_single(
    key: jax.Array, embedding_dim: int, num_embeddings: int = 6, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "emb": {
            "timestep_embedder": {
                "linear_1": init_linear(k1, 256, embedding_dim, dtype=dtype),
                "linear_2": init_linear(k2, embedding_dim, embedding_dim, dtype=dtype),
            }
        },
        "linear": init_linear(k3, embedding_dim, num_embeddings * embedding_dim, dtype=dtype),
    }
