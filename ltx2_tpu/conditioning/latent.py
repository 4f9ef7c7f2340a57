"""Latent-index conditioning (i2v / v2v).

Capability parity with reference LTX_2_MLX/conditioning/latent.py
(VideoConditionByLatentIndex): REPLACE tokens at a latent-frame index with
encoded content and set denoise strength there to 1 - strength.

TPU note: the token offsets are host-computed (shapes are static), so the
replacement is plain static slicing + concatenate, which XLA fuses the same
as an in-place dynamic_update_slice would.
"""

from __future__ import annotations

import jax.numpy as jnp

from ltx2_tpu.conditioning.item import ConditioningError
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.types import LatentState


class VideoConditionByLatentIndex:
    def __init__(self, latent: jnp.ndarray, strength: float, latent_idx: int):
        self.latent = latent
        self.strength = strength
        self.latent_idx = latent_idx

    def apply_to(
        self, latent_state: LatentState, latent_tools: VideoLatentTools
    ) -> LatentState:
        cond_batch, cond_channels, _, cond_height, cond_width = self.latent.shape
        tgt = latent_tools.target_shape

        if (cond_batch, cond_channels, cond_height, cond_width) != (
            tgt.batch, tgt.channels, tgt.height, tgt.width,
        ):
            raise ConditioningError(
                f"Cannot apply image conditioning item to latent with shape {tgt}. "
                f"Expected shape is ({tgt.batch}, {tgt.channels}, _, "
                f"{tgt.height}, {tgt.width}). "
                "Make sure the image and latent have the same spatial shape."
            )

        tokens = latent_tools.patchifier.patchify(self.latent)

        start_token = latent_tools.patchifier.get_token_count(
            tgt._replace(frames=self.latent_idx)
        )
        stop_token = start_token + tokens.shape[1]
        max_tokens = latent_tools.patchifier.get_token_count(tgt)
        if stop_token > max_tokens:
            raise ValueError(
                f"Conditioning tokens exceed latent sequence length: "
                f"stop_token={stop_token} > max_tokens={max_tokens}. "
                f"latent_idx={self.latent_idx}, tokens.shape={tokens.shape}"
            )

        tokens = tokens.astype(latent_state.latent.dtype)
        new_latent = jnp.concatenate(
            [latent_state.latent[:, :start_token], tokens, latent_state.latent[:, stop_token:]],
            axis=1,
        )
        new_clean = jnp.concatenate(
            [
                latent_state.clean_latent[:, :start_token],
                tokens,
                latent_state.clean_latent[:, stop_token:],
            ],
            axis=1,
        )
        cond_mask = jnp.full(
            (tokens.shape[0], tokens.shape[1], 1),
            1.0 - self.strength,
            latent_state.denoise_mask.dtype,
        )
        new_mask = jnp.concatenate(
            [
                latent_state.denoise_mask[:, :start_token],
                cond_mask,
                latent_state.denoise_mask[:, stop_token:],
            ],
            axis=1,
        )

        return LatentState(
            latent=new_latent,
            denoise_mask=new_mask,
            positions=latent_state.positions,
            clean_latent=new_clean,
        )
