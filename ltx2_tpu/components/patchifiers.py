"""Patchification between latent grids and token sequences.

Capability parity with reference LTX_2_MLX/components/patchifiers.py
(VideoLatentPatchifier, AudioPatchifier, get_pixel_coords). Pure jnp
reshape/transpose ops — XLA compiles these to layout changes, usually free
when fused with the adjacent projection matmul.
"""

from __future__ import annotations

import math
from typing import Protocol, Tuple

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.types import (
    AudioLatentShape,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
)


class PatchifierProtocol(Protocol):
    @property
    def patch_size(self) -> Tuple[int, int, int]: ...
    def patchify(self, latents: jnp.ndarray) -> jnp.ndarray: ...
    def unpatchify(self, latents: jnp.ndarray, output_shape) -> jnp.ndarray: ...


class VideoLatentPatchifier:
    """(B, C, F, H, W) <-> (B, N, D) with patch (1, p, p)
    (patchifiers.py:36-199)."""

    def __init__(self, patch_size: int = 1):
        self._patch_size = (1, patch_size, patch_size)

    @property
    def patch_size(self) -> Tuple[int, int, int]:
        return self._patch_size

    def get_token_count(self, tgt_shape: VideoLatentShape) -> int:
        return (
            tgt_shape.frames * tgt_shape.height * tgt_shape.width
        ) // math.prod(self._patch_size)

    def patchify(self, latents: jnp.ndarray) -> jnp.ndarray:
        b, c, f, h, w = latents.shape
        p1, p2, p3 = self._patch_size
        x = latents.reshape(b, c, f // p1, p1, h // p2, p2, w // p3, p3)
        # Group grid dims first, channel+patch last: (B, gF, gH, gW, C, p1, p2, p3)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        n = (f // p1) * (h // p2) * (w // p3)
        return x.reshape(b, n, c * p1 * p2 * p3)

    def unpatchify(self, latents: jnp.ndarray, output_shape: VideoLatentShape) -> jnp.ndarray:
        assert self._patch_size[0] == 1, "Temporal patch size must be 1"
        b = latents.shape[0]
        c, f, h, w = (
            output_shape.channels,
            output_shape.frames,
            output_shape.height,
            output_shape.width,
        )
        p1, p2, p3 = self._patch_size
        x = latents.reshape(b, f // p1, h // p2, w // p3, c, p1, p2, p3)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, c, f, h, w)

    def get_patch_grid_bounds(self, output_shape: VideoLatentShape) -> jnp.ndarray:
        """(batch, 3, num_patches, 2) start/end bounds per patch per axis
        (patchifiers.py:147-199). Host-side numpy — positions are static."""
        f, h, w = output_shape.frames, output_shape.height, output_shape.width
        fc = np.arange(0, f, self._patch_size[0])
        hc = np.arange(0, h, self._patch_size[1])
        wc = np.arange(0, w, self._patch_size[2])
        gf, gh, gw = np.meshgrid(fc, hc, wc, indexing="ij")
        starts = np.stack([gf, gh, gw], axis=0)  # (3, gF, gH, gW)
        ends = starts + np.asarray(self._patch_size).reshape(3, 1, 1, 1)
        coords = np.stack([starts, ends], axis=-1)  # (3, gF, gH, gW, 2)
        coords = coords.reshape(3, gf.size, 2)
        coords = np.broadcast_to(coords[None], (output_shape.batch, 3, gf.size, 2))
        return jnp.asarray(coords, dtype=jnp.int32)


def get_pixel_coords(
    latent_coords: jnp.ndarray,
    scale_factors: SpatioTemporalScaleFactors,
    causal_fix: bool = False,
) -> jnp.ndarray:
    """Latent [start, end) bounds -> pixel-space bounds (patchifiers.py:202-240).

    causal_fix: the causal VAE maps the first latent frame to one pixel frame,
    so temporal coords shift by (1 - time_scale), clamped at 0.
    """
    scale = jnp.asarray(
        [scale_factors.time, scale_factors.height, scale_factors.width]
    ).reshape(1, 3, 1, 1)
    pixel_coords = latent_coords * scale
    if causal_fix:
        t = pixel_coords[:, 0:1, ...] + 1 - scale_factors.time
        t = jnp.maximum(t, 0)
        pixel_coords = jnp.concatenate([t, pixel_coords[:, 1:, ...]], axis=1)
    return pixel_coords


class AudioPatchifier:
    """(B, C, T, F) <-> (B, T, C*F); positions are start/end timestamps in
    seconds (patchifiers.py:243-411)."""

    def __init__(
        self,
        patch_size: int,
        sample_rate: int = 16000,
        hop_length: int = 160,
        audio_latent_downsample_factor: int = 4,
        is_causal: bool = True,
        shift: int = 0,
    ):
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.audio_latent_downsample_factor = audio_latent_downsample_factor
        self.is_causal = is_causal
        self.shift = shift
        self._patch_size = (1, patch_size, patch_size)

    @property
    def patch_size(self) -> Tuple[int, int, int]:
        return self._patch_size

    def get_token_count(self, tgt_shape: AudioLatentShape) -> int:
        return tgt_shape.frames

    def _latent_time_in_sec(self, start_latent: int, end_latent: int) -> np.ndarray:
        frame = np.arange(start_latent, end_latent, dtype=np.float32)
        mel_frame = frame * self.audio_latent_downsample_factor
        if self.is_causal:
            mel_frame = np.maximum(mel_frame + 1 - self.audio_latent_downsample_factor, 0)
        return mel_frame * self.hop_length / self.sample_rate

    def patchify(self, audio_latents: jnp.ndarray) -> jnp.ndarray:
        b, c, t, f = audio_latents.shape
        return audio_latents.transpose(0, 2, 1, 3).reshape(b, t, c * f)

    def unpatchify(self, audio_latents: jnp.ndarray, output_shape: AudioLatentShape) -> jnp.ndarray:
        b, t, _ = audio_latents.shape
        c, f = output_shape.channels, output_shape.mel_bins
        return audio_latents.reshape(b, t, c, f).transpose(0, 2, 1, 3)

    def get_patch_grid_bounds(self, output_shape: AudioLatentShape) -> jnp.ndarray:
        """(batch, 1, frames, 2) start/end timestamps in seconds."""
        n = output_shape.frames
        start = self._latent_time_in_sec(self.shift, n + self.shift)
        end = self._latent_time_in_sec(self.shift + 1, n + self.shift + 1)
        timings = np.stack([start, end], axis=-1)  # (T, 2)
        timings = np.broadcast_to(timings[None, None], (output_shape.batch, 1, n, 2))
        return jnp.asarray(timings, dtype=jnp.float32)
