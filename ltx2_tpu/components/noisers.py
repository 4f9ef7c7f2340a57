"""Noise injection for the initial latent state.

Capability parity with reference LTX_2_MLX/components/noisers.py. JAX PRNG
keys are threaded explicitly — both noisers are pure functions of their key.
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp

from ltx2_tpu.types import LatentState


def _blend(latent_state: LatentState, noise: jnp.ndarray, noise_scale: float) -> LatentState:
    """latent = noise*mask*scale + latent*(1 - mask*scale) (noisers.py:64-78)."""
    mask = latent_state.denoise_mask
    if mask.ndim == 2:  # (B, N) -> (B, N, 1)
        mask = mask[..., None]
    scaled_mask = mask.astype(jnp.float32) * noise_scale
    latent = (
        noise.astype(jnp.float32) * scaled_mask
        + latent_state.latent.astype(jnp.float32) * (1 - scaled_mask)
    )
    return latent_state.replace(latent=latent.astype(latent_state.latent.dtype))


class NoiserProtocol(Protocol):
    def __call__(
        self, key: jax.Array, latent_state: LatentState, noise_scale: float = 1.0
    ) -> LatentState: ...


class GaussianNoiser:
    """Gaussian noise blended by the denoise mask (noisers.py:18-78)."""

    def __call__(
        self, key: jax.Array, latent_state: LatentState, noise_scale: float = 1.0
    ) -> LatentState:
        noise = jax.random.normal(key, latent_state.latent.shape, jnp.float32)
        return _blend(latent_state, noise, noise_scale)


class DeterministicNoiser:
    """Fixed-seed noise for reproducible debugging (noisers.py:81-125)."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(
        self, key: jax.Array | None, latent_state: LatentState, noise_scale: float = 1.0
    ) -> LatentState:
        del key
        fixed = jax.random.PRNGKey(self.seed)
        noise = jax.random.normal(fixed, latent_state.latent.shape, jnp.float32)
        return _blend(latent_state, noise, noise_scale)
