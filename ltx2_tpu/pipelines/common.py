"""Shared pipeline utilities.

Capability parity with reference LTX_2_MLX/pipelines/common.py: image
loading (aspect-preserving resize + center-crop), image -> latent-index
conditionings, denoise-mask post-processing, and Modality construction with
per-token timesteps = denoise_mask * sigma (common.py:193-232).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.conditioning.item import ConditioningItem
from ltx2_tpu.conditioning.latent import VideoConditionByLatentIndex
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.models.transformer.model import Modality
from ltx2_tpu.types import LatentState


@dataclass
class ImageCondition:
    image_path: str
    frame_index: int
    strength: float = 0.95


def load_image_tensor(
    image_path: str,
    height: int,
    width: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Load image -> (1, 3, 1, H, W) in [-1, 1] with aspect-preserving
    resize + center crop (common.py:32-102)."""
    from PIL import Image

    if not os.path.exists(image_path):
        raise FileNotFoundError(f"Image not found: {image_path}")
    try:
        img = Image.open(image_path)
    except Exception as e:
        raise ValueError(f"Failed to open image {image_path}: {e}")
    if img.mode not in ["RGB", "RGBA", "L"]:
        raise ValueError(
            f"Unsupported image format: {img.mode}. Supported formats: RGB, RGBA, L"
        )

    img = img.convert("RGB")
    src_w, src_h = img.size
    target_aspect = width / height
    src_aspect = src_w / src_h

    if abs(src_aspect - target_aspect) < 0.01:
        img = img.resize((width, height), Image.Resampling.LANCZOS)
    else:
        if src_aspect > target_aspect:
            new_h = height
            new_w = int(src_w * (height / src_h))
        else:
            new_w = width
            new_h = int(src_h * (width / src_w))
        img = img.resize((new_w, new_h), Image.Resampling.LANCZOS)
        left = (new_w - width) // 2
        top = (new_h - height) // 2
        img = img.crop((left, top, left + width, top + height))

    arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
    arr = arr.transpose(2, 0, 1)[None, :, None]  # (1, C, 1, H, W)
    return jnp.asarray(arr, dtype)


def create_image_conditionings(
    images: List[ImageCondition],
    encode_fn,
    height: int,
    width: int,
    dtype=jnp.float32,
) -> List[ConditioningItem]:
    """Encode images -> latent-index conditionings (common.py:105-146).

    encode_fn: (1, 3, 1, H, W) pixel tensor -> (1, 128, 1, H/32, W/32)
    latent (the jitted VAE encoder)."""
    conditionings = []
    for img_cond in images:
        image_tensor = load_image_tensor(img_cond.image_path, height, width, dtype)
        encoded = encode_fn(image_tensor)
        conditionings.append(
            VideoConditionByLatentIndex(
                latent=encoded,
                strength=img_cond.strength,
                latent_idx=img_cond.frame_index,
            )
        )
    return conditionings


def apply_conditionings(
    latent_state: LatentState,
    conditionings: List[ConditioningItem],
    video_tools: VideoLatentTools,
) -> LatentState:
    for conditioning in conditionings:
        latent_state = conditioning.apply_to(latent_state, video_tools)
    return latent_state


def consolidate_latent(latent):
    """Gather a multi-device (token/row-sharded) latent to the host.

    Denoise loops under SP/PP return sharded outputs. The conv phases after
    them (upscalers, VAE decode) must NOT consume sharded inputs: GSPMD's
    conv halo exchange silently miscomputes when a shard is smaller than the
    halo width (observed on XLA:CPU with a 2D-sharded tiny latent). The
    gather goes through the HOST (np.ndarray) rather than one device: a
    device-committed array cannot feed a later stage's multi-device
    shard_map (two-stage pipelines re-enter a loop after upscaling), while
    an uncommitted host array places freely — and the latent is MBs, so the
    transfer is the natural sequential-residency phase boundary. Multi-chip
    decode goes through the tile-DP path (models/video_vae/tiling.py),
    which shards whole tiles, never halos.
    """
    import jax as _jax
    import numpy as _np

    if isinstance(latent, _jax.Array) and len(latent.sharding.device_set) > 1:
        return _np.asarray(latent)
    return latent


def post_process_latent(
    denoised: jnp.ndarray,
    denoise_mask: jnp.ndarray,
    clean_latent: jnp.ndarray,
) -> jnp.ndarray:
    """denoised*mask + clean*(1-mask) (common.py:169-190)."""
    if denoise_mask.ndim == 2 and denoised.ndim == 3:
        denoise_mask = denoise_mask[..., None]
    mask = denoise_mask.astype(jnp.float32)
    return (
        denoised.astype(jnp.float32) * mask
        + clean_latent.astype(jnp.float32) * (1 - mask)
    ).astype(denoised.dtype)


def bucketed_tokens(n: int, bucket: int) -> int:
    """Round a token count UP to the bucket grid (multiple of `bucket`)."""
    return ((n + bucket - 1) // bucket) * bucket


def pad_state_tokens(state: LatentState, n_bucket: int):
    """Pad a LatentState's token axis to `n_bucket` for shape-bucketed
    serving. Returns (padded_state, token_mask (B, n_bucket) bool).

    Padding content: zeros for latent/clean (masked out of attention keys,
    so values are irrelevant — zeros keep everything finite), denoise_mask
    ones (pad tokens just denoise garbage), positions edge-replicated
    (keeps RoPE finite). The loop slices back with slice_state_tokens.
    """
    n = state.latent.shape[1]
    pad = n_bucket - n
    if pad < 0:
        raise ValueError(f"token count {n} exceeds bucket {n_bucket}")
    if pad == 0:
        # Exactly on the bucket grid: no mask at all, so the loop keeps the
        # unmasked flash-attention path instead of paying the masked one.
        return state, None
    b = state.latent.shape[0]
    token_mask = jnp.concatenate(
        [jnp.ones((b, n), bool), jnp.zeros((b, pad), bool)], axis=1
    )

    def pad1(x):
        return jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))

    return LatentState(
        latent=pad1(state.latent),
        clean_latent=pad1(state.clean_latent),
        denoise_mask=jnp.pad(
            state.denoise_mask,
            [(0, 0), (0, pad)] + [(0, 0)] * (state.denoise_mask.ndim - 2),
            constant_values=1,
        ),
        positions=jnp.pad(
            state.positions, [(0, 0), (0, 0), (0, pad), (0, 0)], mode="edge"
        ),
    ), token_mask


def slice_state_tokens(state: LatentState, n: int) -> LatentState:
    """Inverse of pad_state_tokens: drop the padding tokens."""
    if state.latent.shape[1] == n:
        return state
    return LatentState(
        latent=state.latent[:, :n],
        clean_latent=state.clean_latent[:, :n],
        denoise_mask=state.denoise_mask[:, :n],
        positions=state.positions[:, :, :n],
    )


def timesteps_from_mask(denoise_mask: jnp.ndarray, sigma) -> jnp.ndarray:
    """(B, N[, 1]) mask * sigma -> (B, N) per-token timesteps
    (common.py:193-203)."""
    t = denoise_mask.astype(jnp.float32) * sigma
    if t.ndim == 3:
        t = t[..., 0]
    return t


def modality_from_state(
    state: LatentState,
    context: jnp.ndarray,
    sigma,
    uniform_timesteps: bool = False,
    token_mask=None,
) -> Modality:
    """LatentState + context + sigma -> transformer Modality
    (common.py:206-232). Works for both video and audio states.

    uniform_timesteps: STATIC promise that the denoise mask is all-ones
    (pure generation, no token conditioning) — timesteps collapse from
    per-token (B, N) to per-batch (B,), so the DiT's AdaLN embeddings are
    (B, 1, n_emb, D) instead of (B, N, n_emb, D): at 6144 tokens that is
    0.6 GB of fp32 saved plus the per-block broadcast bandwidth."""
    sigma_arr = jnp.asarray(sigma, jnp.float32).reshape(-1)
    if sigma_arr.shape[0] != state.latent.shape[0]:
        sigma_arr = jnp.broadcast_to(sigma_arr[:1], (state.latent.shape[0],))
    return Modality(
        latent=state.latent,
        timesteps=sigma_arr if uniform_timesteps
        else timesteps_from_mask(state.denoise_mask, sigma),
        positions=state.positions,
        context=context,
        context_mask=None,
        sigma=sigma_arr,
        token_mask=token_mask,
    )


audio_modality_from_state = modality_from_state

# ---------------------------------------------------------------------------
# Cached jitted component applies. A fresh `jax.jit(lambda ...)` per pipeline
# call would RE-TRACE AND RE-COMPILE on every request (jit caches on function
# identity) — caught as seconds of recompile per request in the serving loop
# and the two-stage benchmark. Keyed on the frozen (hashable) config.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def jitted_video_encoder(cfg):
    from ltx2_tpu.models.video_vae import video_encoder_apply

    return jax.jit(lambda p, x: video_encoder_apply(p, cfg, x))


@lru_cache(maxsize=32)
def jitted_spatial_upscaler(cfg):
    from ltx2_tpu.models.upscaler import spatial_upscaler_apply

    return jax.jit(lambda p, z: spatial_upscaler_apply(p, cfg, z))


@lru_cache(maxsize=32)
def jitted_temporal_upscaler(cfg):
    from ltx2_tpu.models.upscaler import temporal_upscaler_apply

    return jax.jit(lambda p, z: temporal_upscaler_apply(p, cfg, z))


@lru_cache(maxsize=32)
def jitted_audio_decoder(cfg):
    from ltx2_tpu.models.audio_vae import audio_decoder_apply

    return jax.jit(lambda p, z: audio_decoder_apply(p, cfg, z))


@lru_cache(maxsize=32)
def jitted_tile_decoder(cfg):
    """Tiled-decode inner: timestep and noise key ride as TRACED args so one
    compile serves every tile round and every request seed."""
    from ltx2_tpu.models.video_vae import video_decoder_apply

    return jax.jit(
        lambda p, tile, timestep, key: video_decoder_apply(
            p, cfg, tile, timestep=timestep, noise_key=key
        )
    )
