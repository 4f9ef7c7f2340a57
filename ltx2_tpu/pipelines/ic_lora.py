"""IC-LoRA control-signal video-to-video pipeline.

Capability parity with reference LTX_2_MLX/pipelines/ic_lora.py
(ICLoraPipeline, ic_lora.py:414-756): a control video (canny / depth / pose
/ raw) is preprocessed, VAE-encoded, and APPENDED to the sequence via
keyframe conditioning at frame 0 (ic_lora.py:345-412); the IC-LoRA is fused
into the transformer for STAGE 1 ONLY, then removed; stage 2 is the
distilled refinement.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import Callable, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params, unfuse_lora_deltas
from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline


class ControlType(Enum):
    # The reference ships only CANNY in-repo preprocessing; depth/pose
    # control videos must be pre-processed externally and passed as RAW
    # (reference ic_lora.py:147-214).
    RAW = "raw"  # pre-processed control video (depth/pose/etc.)
    CANNY = "canny"


@dataclass
class ICLoraConfig(DistilledConfig):
    """Reference ICLoraConfig surface (ic_lora.py:242-275)."""

    ic_lora_config: Optional[LoRAConfig] = None


@dataclass
class VideoCondition:
    """A control-signal video (ic_lora.py:277-288)."""

    video_path: str
    strength: float = 0.95
    control_type: ControlType = ControlType.RAW
    canny_low: int = 100
    canny_high: int = 200
    save_control: bool = False


def preprocess_canny(
    video_path: Union[str, Path],
    height: int,
    width: int,
    num_frames: int,
    low_threshold: int = 100,
    high_threshold: int = 200,
) -> np.ndarray:
    """Canny edge control signal, (F, H, W, 3) in [0, 255]
    (ic_lora.py:55-123). Requires OpenCV.

    Provenance: mirrors the reference's thin OpenCV wrapper (same resize
    interpolation, grayscale conversion, and default thresholds) — the cv2
    call sequence IS the behavioral contract, so it matches by necessity.
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "OpenCV required for Canny preprocessing. Install opencv-python."
        ) from e

    cap = cv2.VideoCapture(str(video_path))
    frames = []
    while len(frames) < num_frames:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.resize(frame, (width, height), interpolation=cv2.INTER_LANCZOS4)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        edges = cv2.Canny(gray, low_threshold, high_threshold)
        frames.append(cv2.cvtColor(edges, cv2.COLOR_GRAY2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"Could not read any frames from {video_path}")
    while len(frames) < num_frames:
        frames.append(frames[-1])
    return np.stack(frames, axis=0)


def preprocess_control_signal(
    video_path: Union[str, Path],
    control_type: ControlType,
    height: int,
    width: int,
    num_frames: int,
    **kwargs,
) -> np.ndarray:
    """Dispatch preprocessing by control type (ic_lora.py:147-214)."""
    if control_type == ControlType.CANNY:
        return preprocess_canny(
            video_path, height, width, num_frames,
            kwargs.get("low_threshold", 100), kwargs.get("high_threshold", 200),
        )
    raise ValueError(
        f"Control type {control_type} requires external preprocessing; "
        "use ControlType.RAW with a pre-processed video."
    )


def load_control_signal_tensor(control_signal: np.ndarray) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (1, 3, F, H, W) in [-1, 1] (ic_lora.py:216-240)."""
    video = control_signal.astype(np.float32) / 127.5 - 1.0
    return video.transpose(3, 0, 1, 2)[None]


def create_video_conditionings(
    videos: List[VideoCondition],
    encode_fn,
    height: int,
    width: int,
    num_frames: int,
    dtype=jnp.float32,
) -> List[VideoConditionByKeyframeIndex]:
    """Control videos -> VAE-encoded keyframe-APPEND conditionings at frame 0
    (ic_lora.py:345-412)."""
    conditionings = []
    for vc in videos:
        if vc.control_type == ControlType.CANNY:
            signal = preprocess_control_signal(
                vc.video_path, vc.control_type, height, width, num_frames,
                low_threshold=vc.canny_low, high_threshold=vc.canny_high,
            )
            tensor = load_control_signal_tensor(signal)
        else:
            # Dispatches to the pure-Python readers (GIF/y4m/AVI-MJPEG)
            # when possible; ffmpeg pipe otherwise.
            from ltx2_tpu.pipelines.retake import load_video_frames

            tensor = load_video_frames(vc.video_path, height, width, num_frames)
        if vc.save_control:
            # Debug artifact (reference --save-control): the exact signal
            # fed to the VAE, written next to the source (no ffmpeg).
            from ltx2_tpu.utils.video_io import write_avi_mjpeg

            frames_u8 = (
                (tensor[0].transpose(1, 2, 3, 0) + 1.0) * 127.5
            ).clip(0, 255).astype(np.uint8)
            out = str(vc.video_path) + ".control.avi"
            write_avi_mjpeg(out, frames_u8, fps=24.0)
        encoded = encode_fn(jnp.asarray(tensor, dtype))
        conditionings.append(
            VideoConditionByKeyframeIndex(
                keyframes=encoded, frame_idx=0, strength=vc.strength
            )
        )
    return conditionings


class ICLoraPipeline(DistilledPipeline):
    """Control-signal two-stage generation with stage-1-only IC-LoRA."""

    def __call__(  # type: ignore[override]
        self,
        text_encoding: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        config: ICLoraConfig,
        videos: Optional[List[VideoCondition]] = None,
        control_conditionings=None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
    ):
        """control_conditionings: optional pre-built conditioning items
        (bypasses video IO; used by tests)."""
        videos = videos or []

        # The IC-LoRA applies to STAGE 1 only (ic_lora.py:479-501): fuse now,
        # unfuse right after stage 1 by hooking _run_stage.
        applied = None
        if config.ic_lora_config is not None:
            self.transformer_params, applied = fuse_lora_into_params(
                self.transformer_params, [config.ic_lora_config], return_deltas=True
            )
        self._ic_stage_count = 0
        self._ic_applied = applied

        def make_conditionings(height, width):
            if control_conditionings is not None:
                return list(control_conditionings)
            return create_video_conditionings(
                videos, self._encode_image, height, width, config.num_frames,
                jnp.dtype(config.dtype),
            )

        self._stage_extra_conditionings = make_conditionings
        try:
            return super().__call__(
                text_encoding, text_mask, config,
                images=None, callback=callback,
                audio_encoding=audio_encoding, skip_decode=skip_decode,
            )
        finally:
            self._stage_extra_conditionings = None
            if self._ic_applied is not None:
                self.transformer_params = unfuse_lora_deltas(
                    self.transformer_params, self._ic_applied
                )
                self._ic_applied = None

    def _run_stage(self, pixel_shape, *args, **kwargs):
        maker = getattr(self, "_stage_extra_conditionings", None)
        if maker is not None and self._ic_stage_count == 0 and not kwargs.get("extra_conditionings"):
            # Control conditioning applies to stage 1 only.
            kwargs["extra_conditionings"] = maker(pixel_shape.height, pixel_shape.width)
        result = super()._run_stage(pixel_shape, *args, **kwargs)
        self._ic_stage_count += 1
        # Remove the IC-LoRA after stage 1 (stage 2 runs the base weights).
        if self._ic_stage_count == 1 and getattr(self, "_ic_applied", None) is not None:
            self.transformer_params = unfuse_lora_deltas(
                self.transformer_params, self._ic_applied
            )
            self._ic_applied = None
        return result


def create_ic_lora_pipeline(**kwargs) -> ICLoraPipeline:
    return ICLoraPipeline(**kwargs)
