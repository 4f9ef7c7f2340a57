"""Keyframe interpolation pipeline.

Capability parity with reference
LTX_2_MLX/pipelines/keyframe_interpolation.py (KeyframeInterpolationPipeline,
keyframe_interpolation.py:172-503): keyframes are VAE-encoded and APPENDED
past the sequence end with temporally-offset positions
(VideoConditionByKeyframeIndex); two-stage distilled generation inbetween.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
from ltx2_tpu.pipelines.common import load_image_tensor
from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline


@dataclass
class Keyframe:
    """A keyframe image pinned at a pixel-frame index
    (keyframe_interpolation.py:86-92)."""

    image_path: str
    frame_index: int
    strength: float = 0.95


@dataclass
class KeyframeInterpolationConfig(DistilledConfig):
    """Reference KeyframeInterpolationConfig surface
    (keyframe_interpolation.py:46-84)."""


def create_keyframe_conditionings(
    keyframes: List[Keyframe],
    encode_fn,
    height: int,
    width: int,
    fps: float,
    dtype=jnp.float32,
) -> List[VideoConditionByKeyframeIndex]:
    """Encode keyframe images -> append conditionings
    (keyframe_interpolation.py:129-170). frame_index stays in PIXEL frames:
    VideoConditionByKeyframeIndex offsets pixel-frame temporal coordinates
    (positions[:, 0] + frame_idx) / fps — converting to latent frames here
    would collapse every keyframe toward t=0 at 1/8th the intended time
    (reference keyframe_interpolation.py:160-164 passes it raw)."""
    conditionings = []
    for kf in keyframes:
        image = load_image_tensor(kf.image_path, height, width, dtype)
        encoded = encode_fn(image)  # (1, 128, 1, H/32, W/32)
        conditionings.append(
            VideoConditionByKeyframeIndex(
                keyframes=encoded,
                frame_idx=kf.frame_index,
                strength=kf.strength,
            )
        )
    return conditionings


class KeyframeInterpolationPipeline(DistilledPipeline):
    """Distilled two-stage generation guided by appended keyframes."""

    def __call__(  # type: ignore[override]
        self,
        text_encoding: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        config: KeyframeInterpolationConfig,
        keyframes: Optional[List[Keyframe]] = None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
    ) -> Union[np.ndarray, Tuple[np.ndarray, Optional[jnp.ndarray]]]:
        keyframes = keyframes or []

        def make_conditionings(height, width):
            return create_keyframe_conditionings(
                keyframes, self._encode_image, height, width, config.fps,
                jnp.dtype(config.dtype),
            )

        # Drive the distilled two-stage flow with keyframe conditionings
        # injected per stage resolution.
        self._stage_extra_conditionings = make_conditionings
        try:
            return super().__call__(
                text_encoding, text_mask, config,
                images=None, callback=callback,
                audio_encoding=audio_encoding, skip_decode=skip_decode,
            )
        finally:
            self._stage_extra_conditionings = None

    # Hook into _run_stage to add the per-resolution keyframe conditionings.
    def _run_stage(self, pixel_shape, *args, **kwargs):
        maker = getattr(self, "_stage_extra_conditionings", None)
        if maker is not None and not kwargs.get("extra_conditionings"):
            kwargs["extra_conditionings"] = maker(
                pixel_shape.height, pixel_shape.width
            )
        return super()._run_stage(pixel_shape, *args, **kwargs)


def create_keyframe_pipeline(**kwargs) -> KeyframeInterpolationPipeline:
    return KeyframeInterpolationPipeline(**kwargs)
