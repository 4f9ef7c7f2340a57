"""Video VAE tensor ops: pixel patchify/unpatchify, pixel norm, statistics.

Capability parity with reference LTX_2_MLX/model/video_vae/ops.py. The
channel-packing order (c, p, r_w, r_h) for 5D patchify matches the PyTorch
einops pattern "b c (f p) (h q) (w r) -> b (c p r q) f h w" (ops.py:47-58,
110-123) — this ordering is parity-critical for checkpoint weights.

Public tensors are (B, C, F, H, W) like the reference; the VAE internals use
channels-last (see conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch_size_hw: int, patch_size_t: int = 1) -> jnp.ndarray:
    """Space-to-depth on (B, C, F, H, W) or (B, C, H, W)."""
    if patch_size_hw == 1 and patch_size_t == 1:
        return x

    if x.ndim == 4:
        b, c, h, w = x.shape
        q = r = patch_size_hw
        x = x.reshape(b, c, h // q, q, w // r, r)
        x = x.transpose(0, 1, 5, 3, 2, 4)  # pack (c, r_w, r_h)
        return x.reshape(b, c * r * q, h // q, w // r)

    if x.ndim == 5:
        b, c, f, h, w = x.shape
        p = patch_size_t
        q = r = patch_size_hw
        x = x.reshape(b, c, f // p, p, h // q, q, w // r, r)
        x = x.transpose(0, 1, 3, 7, 5, 2, 4, 6)  # pack (c, p, r_w, r_h)
        return x.reshape(b, c * p * q * r, f // p, h // q, w // r)

    raise ValueError(f"Invalid input shape: {x.shape}, expected 4D or 5D")


def unpatchify(x: jnp.ndarray, patch_size_hw: int, patch_size_t: int = 1) -> jnp.ndarray:
    """Depth-to-space; inverse of patchify."""
    if patch_size_hw == 1 and patch_size_t == 1:
        return x

    if x.ndim == 4:
        b, c_packed, h, w = x.shape
        r = patch_size_hw
        c = c_packed // (r * r)
        x = x.reshape(b, c, r, r, h, w)
        x = x.transpose(0, 1, 4, 3, 5, 2)
        return x.reshape(b, c, h * r, w * r)

    if x.ndim == 5:
        b, c_packed, f, h, w = x.shape
        p = patch_size_t
        r = patch_size_hw
        c = c_packed // (p * r * r)
        x = x.reshape(b, c, p, r, r, f, h, w)
        x = x.transpose(0, 1, 5, 2, 6, 4, 7, 3)
        return x.reshape(b, c, f * p, h * r, w * r)

    raise ValueError(f"Invalid input shape: {x.shape}, expected 4D or 5D")


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """RMS norm across the channel axis, fp32 accumulation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=axis, keepdims=True)
    return (xf * jax.lax.rsqrt(variance + eps)).astype(dtype)


def pixel_shuffle_3d(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """(B, C*r^2, F, H, W) -> (B, C, F, H*r, W*r) (ops.py:215-240)."""
    r = upscale_factor
    b, c_packed, f, h, w = x.shape
    c = c_packed // (r * r)
    x = x.reshape(b, c, r, r, f, h, w)
    x = x.transpose(0, 1, 4, 5, 2, 6, 3)
    return x.reshape(b, c, f, h * r, w * r)


def pixel_unshuffle_3d(x: jnp.ndarray, downscale_factor: int) -> jnp.ndarray:
    """(B, C, F, H, W) -> (B, C*r^2, F, H/r, W/r) (ops.py:245-269)."""
    r = downscale_factor
    b, c, f, h, w = x.shape
    x = x.reshape(b, c, f, h // r, r, w // r, r)
    x = x.transpose(0, 1, 4, 6, 2, 3, 5)
    return x.reshape(b, c * r * r, f, h // r, w // r)


# Checkpoint keys are hyphenated (ops.py:188-210).
STAT_KEY_MAP = {
    "std-of-means": "std_of_means",
    "mean-of-means": "mean_of_means",
    "mean-of-stds": "mean_of_stds",
    "mean-of-stds_over_std-of-means": "mean_of_stds_over_std_of_means",
    "channel": "channel",
}


def normalize_latent(x: jnp.ndarray, stats: dict) -> jnp.ndarray:
    """(x - mean_of_means) / std_of_means over the 128 channels of a
    (B, C, F, H, W) latent (ops.py:173-186)."""
    std = stats["std_of_means"].reshape(1, -1, 1, 1, 1)
    mean = stats["mean_of_means"].reshape(1, -1, 1, 1, 1)
    return (x - mean) / std


def un_normalize_latent(x: jnp.ndarray, stats: dict) -> jnp.ndarray:
    std = stats["std_of_means"].reshape(1, -1, 1, 1, 1)
    mean = stats["mean_of_means"].reshape(1, -1, 1, 1, 1)
    return x * std + mean
