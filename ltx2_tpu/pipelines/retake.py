"""Retake pipeline: regenerate a time window of an existing video.

Capability parity with reference LTX_2_MLX/pipelines/retake.py
(RetakePipeline, retake.py:199-...): load source video (ffmpeg), VAE-encode
it as the initial/clean latent, build a TemporalRegionMask so only latent
frames inside [start_time, end_time) get denoise_mask=1, noise that region,
run the CFG denoise loop (mask blending preserves the rest), decode.
"""

from __future__ import annotations

import subprocess
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import CFGGuider, GaussianNoiser, LTX2Scheduler
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.models.video_vae import TilingConfig
from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop, mesh_loop_kwargs
from ltx2_tpu.pipelines.one_stage import OneStagePipeline
from ltx2_tpu.types import LatentState, VideoLatentShape


@dataclass
class RetakeConfig:
    """Reference RetakeConfig surface (retake.py:48-65)."""

    start_time: float = 0.0
    end_time: float = 1.0
    seed: int = 42
    num_inference_steps: int = 30
    cfg_scale: float = 3.0
    # Guidance reuse (denoise.py): uncond forward every k-th step.
    cfg_interval: int = 1
    dtype: str = "float32"
    latent_channels: int = 128
    tiling_config: Optional[TilingConfig] = None
    # Reference anchor (4096) by default; True = resolution-aware shift.
    token_dependent_shift: bool = False

    def __post_init__(self):
        if self.end_time <= self.start_time:
            raise ValueError("end_time must be greater than start_time")


def get_video_metadata(video_path: str) -> Tuple[float, int, int, int]:
    """(fps, num_frames, height, width) — pure-Python probe for the
    formats we decode without ffmpeg, ffprobe otherwise (retake.py:67-95)."""
    from ltx2_tpu.utils.video_io import (
        _cv2_or_none,
        decodes_pure_python,
        probe_cv2,
        probe_video,
    )

    if decodes_pure_python(video_path):
        return probe_video(video_path)
    if _cv2_or_none() is not None:
        return probe_cv2(video_path)
    import json

    cmd = [
        "ffprobe", "-v", "quiet", "-print_format", "json",
        "-show_streams", "-show_format", video_path,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    data = json.loads(out)
    for stream in data.get("streams", []):
        if stream.get("codec_type") != "video":
            continue
        width, height = int(stream["width"]), int(stream["height"])
        num, _, den = str(stream.get("r_frame_rate", "24/1")).partition("/")
        fps = float(num) / float(den or 1)
        nb = str(stream.get("nb_frames", "0"))
        num_frames = int(nb) if nb.isdigit() else 0
        if num_frames <= 0:
            # MKV/WebM streams report nb_frames as 'N/A': fall back to
            # duration * fps (retake.py:88-91) — returning 0 would snap to
            # n_frames = -7 and feed ffmpeg `-frames:v -7`.
            duration = float(data.get("format", {}).get("duration", 0) or 0)
            num_frames = int(duration * fps)
        if num_frames <= 0:
            raise ValueError(
                f"{video_path}: could not determine frame count "
                "(no nb_frames and no container duration)"
            )
        return fps, num_frames, height, width
    raise ValueError(f"No video stream found in {video_path}")


def load_video_frames(
    video_path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """Decode frames via ffmpeg rawvideo pipe -> (1, 3, F, H, W) in [-1, 1]
    (retake.py:97-139). GIF/WebP/y4m/AVI-MJPEG decode in pure Python even
    without ffmpeg (utils/video_io.py)."""
    from ltx2_tpu.utils.video_io import (
        _cv2_or_none,
        decodes_pure_python,
        read_cv2,
        read_video_any,
    )

    if decodes_pure_python(video_path):
        return read_video_any(video_path, height, width, num_frames)
    if _cv2_or_none() is not None:
        return read_cv2(video_path, height, width, num_frames)
    cmd = [
        "ffmpeg", "-v", "quiet", "-i", video_path,
        "-vf", f"scale={width}:{height}",
        "-frames:v", str(num_frames),
        "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
    ]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    frames = np.frombuffer(raw, np.uint8)
    n = len(frames) // (height * width * 3)
    frames = frames[: n * height * width * 3].reshape(n, height, width, 3)
    while frames.shape[0] < num_frames:
        frames = np.concatenate([frames, frames[-1:]], axis=0)
    video = frames.astype(np.float32) / 127.5 - 1.0
    return video.transpose(3, 0, 1, 2)[None]  # (1, 3, F, H, W)


class TemporalRegionMask:
    """Sets denoise_mask=1 inside [start_time, end_time), 0 elsewhere
    (retake.py:141-196)."""

    def __init__(self, start_time: float, end_time: float, fps: float):
        self.start_time = start_time
        self.end_time = end_time
        self.fps = fps

    def apply_to(self, latent_state: LatentState, latent_tools: VideoLatentTools) -> LatentState:
        shape = latent_tools.target_shape
        start_pixel = int(self.start_time * self.fps)
        end_pixel = int(self.end_time * self.fps)
        start_latent = max(0, (start_pixel - 1) // 8)
        end_latent = min(shape.frames, (end_pixel - 1) // 8 + 1)

        tokens_per_frame = shape.height * shape.width
        total = shape.frames * tokens_per_frame
        mask = np.zeros((1, total, 1), np.float32)
        if start_latent < end_latent:
            mask[:, start_latent * tokens_per_frame : end_latent * tokens_per_frame] = 1.0
        return latent_state.replace(
            denoise_mask=jnp.asarray(mask, latent_state.denoise_mask.dtype)
        )


class RetakePipeline(OneStagePipeline):
    """Masked re-generation of a temporal region."""

    def __call__(  # type: ignore[override]
        self,
        video_path: str,
        positive_encoding: jnp.ndarray,
        negative_encoding: jnp.ndarray,
        config: RetakeConfig,
        callback: Optional[Callable[[int, int], None]] = None,
        source_video: Optional[jnp.ndarray] = None,
        fps: Optional[float] = None,
        skip_decode: bool = False,
    ):
        """source_video: optional pre-loaded (1, 3, F, H, W) tensor in
        [-1, 1] (bypasses ffmpeg; used by tests)."""
        if source_video is None:
            fps_meta, n_frames, height, width = get_video_metadata(video_path)
            fps = fps or fps_meta
            n_frames = n_frames - (n_frames - 1) % 8  # snap to 8k+1
            source_video = jnp.asarray(
                load_video_frames(video_path, height, width, n_frames)
            )
        if fps is None:
            fps = 24.0

        _, _, n_frames, height, width = source_video.shape
        key = jax.random.PRNGKey(config.seed)
        noise_key, decode_key = jax.random.split(key)

        # Encode the source video to the clean latent.
        from ltx2_tpu.pipelines.common import jitted_video_encoder

        encode = jitted_video_encoder(self.video_encoder_cfg)
        clean_latent = encode(self.video_encoder_params, source_video).astype(
            jnp.dtype(config.dtype)
        )

        latent_shape = VideoLatentShape.from_shape(clean_latent.shape)
        video_tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=latent_shape, fps=fps
        )
        state = video_tools.create_initial_state(
            dtype=jnp.dtype(config.dtype), initial_latent=clean_latent
        )
        state = TemporalRegionMask(config.start_time, config.end_time, fps).apply_to(
            state, video_tools
        )

        sigmas = jnp.asarray(
            LTX2Scheduler().execute(
                steps=config.num_inference_steps,
                # Reference retake.py:365 uses the fixed 4096 anchor.
                tokens=(
                    latent_shape.tokens
                    if config.token_dependent_shift else None
                ),
            )
        )
        state = GaussianNoiser()(noise_key, state, noise_scale=1.0)

        loop = make_video_denoise_loop(
            self.transformer_cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(scale=config.cfg_scale),
                cfg_interval=config.cfg_interval,
            ),
            **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh),
        )
        state = loop(
            self.transformer_params, state, sigmas, positive_encoding, negative_encoding
        )
        if callback:
            callback(config.num_inference_steps, config.num_inference_steps)

        state = video_tools.clear_conditioning(state)
        state = video_tools.unpatchify(state)

        if skip_decode:
            return np.asarray(state.latent)

        from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig

        decode_cfg = OneStageCFGConfig(
            height=height, width=width, num_frames=n_frames,
            tiling_config=config.tiling_config, latent_channels=config.latent_channels,
        )
        return self._decode_video(state.latent, decode_cfg, decode_key)


def create_retake_pipeline(**kwargs) -> RetakePipeline:
    return RetakePipeline(**kwargs)
