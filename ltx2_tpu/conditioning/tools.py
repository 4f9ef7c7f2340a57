"""Latent-state construction tools.

Capability parity with reference LTX_2_MLX/conditioning/tools.py
(VideoLatentTools, AudioLatentTools). Host-side shape logic + pure jnp ops;
states are pytrees so they flow into the jitted denoise loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ltx2_tpu.components.patchifiers import (
    AudioPatchifier,
    VideoLatentPatchifier,
    get_pixel_coords,
)
from ltx2_tpu.types import (
    AudioLatentShape,
    LatentState,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
)

DEFAULT_SCALE_FACTORS = SpatioTemporalScaleFactors.default()


@dataclass(frozen=True)
class VideoLatentTools:
    """Builds video LatentStates (tools.py:25-164).

    Positions: patch bounds -> pixel coords (causal fix) with the temporal
    axis divided by fps, i.e. SECONDS (tools.py:75-78).
    """

    patchifier: VideoLatentPatchifier
    target_shape: VideoLatentShape
    fps: float
    scale_factors: SpatioTemporalScaleFactors = DEFAULT_SCALE_FACTORS
    causal_fix: bool = True

    def create_initial_state(
        self,
        dtype=jnp.float32,
        initial_latent: Optional[jnp.ndarray] = None,
    ) -> LatentState:
        if initial_latent is not None:
            if tuple(initial_latent.shape) != self.target_shape.to_tuple():
                raise ValueError(
                    f"Initial latent shape {initial_latent.shape} does not match "
                    f"target shape {self.target_shape.to_tuple()}"
                )
        else:
            initial_latent = jnp.zeros(self.target_shape.to_tuple(), dtype)

        denoise_mask = jnp.ones(self.target_shape.mask_shape().to_tuple(), jnp.float32)

        latent_coords = self.patchifier.get_patch_grid_bounds(self.target_shape)
        positions = get_pixel_coords(
            latent_coords, self.scale_factors, causal_fix=self.causal_fix
        ).astype(jnp.float32)
        positions = jnp.concatenate(
            [positions[:, 0:1] / self.fps, positions[:, 1:]], axis=1
        )

        return self.patchify(
            LatentState(
                latent=initial_latent,
                denoise_mask=denoise_mask,
                positions=positions,
                clean_latent=initial_latent,
            )
        )

    def patchify(self, latent_state: LatentState) -> LatentState:
        return latent_state.replace(
            latent=self.patchifier.patchify(latent_state.latent),
            clean_latent=self.patchifier.patchify(latent_state.clean_latent),
            denoise_mask=self.patchifier.patchify(latent_state.denoise_mask),
        )

    def unpatchify(self, latent_state: LatentState) -> LatentState:
        return latent_state.replace(
            latent=self.patchifier.unpatchify(latent_state.latent, self.target_shape),
            clean_latent=self.patchifier.unpatchify(
                latent_state.clean_latent, self.target_shape
            ),
            denoise_mask=self.patchifier.unpatchify(
                latent_state.denoise_mask, self.target_shape.mask_shape()
            ),
        )

    def clear_conditioning(self, latent_state: LatentState) -> LatentState:
        """Truncate appended conditioning tokens (appended-at-end invariant,
        tools.py:139-164)."""
        n = self.patchifier.get_token_count(self.target_shape)
        return LatentState(
            latent=latent_state.latent[:, :n],
            denoise_mask=jnp.ones_like(latent_state.denoise_mask)[:, :n],
            positions=latent_state.positions[:, :, :n],
            clean_latent=latent_state.clean_latent[:, :n],
        )


@dataclass(frozen=True)
class AudioLatentTools:
    """Builds audio LatentStates (tools.py:168-297)."""

    patchifier: AudioPatchifier
    target_shape: AudioLatentShape

    def create_initial_state(
        self,
        dtype=jnp.float32,
        initial_latent: Optional[jnp.ndarray] = None,
    ) -> LatentState:
        if initial_latent is not None:
            if tuple(initial_latent.shape) != self.target_shape.to_tuple():
                raise ValueError(
                    f"Initial latent shape {initial_latent.shape} does not match "
                    f"target shape {self.target_shape.to_tuple()}"
                )
        else:
            initial_latent = jnp.zeros(self.target_shape.to_tuple(), dtype)

        denoise_mask = jnp.ones(self.target_shape.mask_shape().to_tuple(), jnp.float32)
        # Positions are (start, end) TIMESTAMPS in seconds — always fp32,
        # like the video path above: at the 0.04 s audio-latent spacing,
        # bf16 collapses adjacent timestamps past ~8 s into identical RoPE
        # positions (duplicated/jittered audio tokens on longer clips).
        positions = self.patchifier.get_patch_grid_bounds(self.target_shape).astype(
            jnp.float32
        )

        return self.patchify(
            LatentState(
                latent=initial_latent,
                denoise_mask=denoise_mask,
                positions=positions,
                clean_latent=initial_latent,
            )
        )

    def patchify(self, latent_state: LatentState) -> LatentState:
        return latent_state.replace(
            latent=self.patchifier.patchify(latent_state.latent),
            clean_latent=self.patchifier.patchify(latent_state.clean_latent),
            denoise_mask=self.patchifier.patchify(latent_state.denoise_mask),
        )

    def unpatchify(self, latent_state: LatentState) -> LatentState:
        return latent_state.replace(
            latent=self.patchifier.unpatchify(latent_state.latent, self.target_shape),
            clean_latent=self.patchifier.unpatchify(
                latent_state.clean_latent, self.target_shape
            ),
            denoise_mask=self.patchifier.unpatchify(
                latent_state.denoise_mask, self.target_shape.mask_shape()
            ),
        )

    def clear_conditioning(self, latent_state: LatentState) -> LatentState:
        n = self.patchifier.get_token_count(self.target_shape)
        return LatentState(
            latent=latent_state.latent[:, :n],
            denoise_mask=jnp.ones_like(latent_state.denoise_mask)[:, :n],
            positions=latent_state.positions[:, :, :n],
            clean_latent=latent_state.clean_latent[:, :n],
        )
