"""Keyframe interpolation pipeline.

Capability parity with reference
LTX_2_MLX/pipelines/keyframe_interpolation.py (KeyframeInterpolationPipeline,
keyframe_interpolation.py:172-503): keyframes are VAE-encoded and APPENDED
past the sequence end with temporally-offset positions
(VideoConditionByKeyframeIndex).

Recipe (reference :332-497): stage 1 runs a CFG Euler loop (default 30
steps, cfg_scale 7.5, zeros negative context when none given) at half
resolution over LTX2Scheduler sigmas with the keyframe conditionings
applied; stage 2 upscales 2x (un-normalize -> upscale -> re-normalize),
re-applies the conditionings at full resolution, noises at the first
distilled sigma, and refines over STAGE_2_DISTILLED_SIGMA_VALUES
[: stage_2_steps + 1] with CFG disabled. use_two_stage=False decodes the
stage-1 latent directly at full resolution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import CFGGuider, GaussianNoiser, LTX2Scheduler
from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.pipelines.common import (
    apply_conditionings,
    load_image_tensor,
)
from ltx2_tpu.pipelines.denoise import (
    DenoiseLoopConfig,
    make_video_denoise_loop,
    mesh_loop_kwargs,
)
from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline
from ltx2_tpu.types import VideoLatentShape, VideoPixelShape


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

    num_inference_steps: int = 30
    cfg_scale: float = 7.5
    use_two_stage: bool = True
    stage_2_steps: int = 3


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
    """Stage-1 CFG + stage-2 distilled refinement guided by appended
    keyframes (the reference recipe; NOT the fully-distilled flow)."""

    def _cfg_stage(
        self,
        config: KeyframeInterpolationConfig,
        height: int,
        width: int,
        conditionings,
        sigmas: jnp.ndarray,
        noise_key,
        noise_scale: float,
        text_encoding,
        negative_encoding,
        cfg_scale: float,
        initial_latent=None,
    ):
        """One denoise stage of the reference recipe: build the state,
        apply the keyframe conditionings, noise, run the (CFG) loop."""
        dtype = jnp.dtype(config.dtype)
        shape = VideoPixelShape(
            batch=1, frames=config.num_frames,
            height=height, width=width, fps=config.fps,
        )
        latent_shape = VideoLatentShape.from_pixel_shape(
            shape, latent_channels=config.latent_channels
        )
        tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=latent_shape, fps=config.fps
        )
        state = tools.create_initial_state(
            dtype=dtype, initial_latent=initial_latent
        )
        state = apply_conditionings(state, conditionings, tools)
        state = GaussianNoiser()(noise_key, state, noise_scale=noise_scale)

        loop = make_video_denoise_loop(
            self.transformer_cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(cfg_scale),
                uniform_timesteps=not conditionings,
            ),
            **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh),
        )
        state = loop(
            self.transformer_params, state, sigmas,
            text_encoding, negative_encoding,
        )
        state = tools.clear_conditioning(state)
        state = tools.unpatchify(state)
        return state.latent

    def __call__(  # type: ignore[override]
        self,
        text_encoding: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        config: KeyframeInterpolationConfig,
        keyframes: Optional[List[Keyframe]] = None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
        negative_encoding: Optional[jnp.ndarray] = None,
    ) -> Union[np.ndarray, Tuple[np.ndarray, Optional[jnp.ndarray]]]:
        keyframes = keyframes or []
        key = jax.random.PRNGKey(config.seed)
        k1, k2, decode_key = jax.random.split(key, 3)
        dtype = jnp.dtype(config.dtype)

        # Reference :327-333 CFGs against a ZEROS negative context when
        # none is provided.
        if negative_encoding is None:
            negative_encoding = jnp.zeros_like(text_encoding)

        two_stage = config.use_two_stage and self.spatial_upscaler_params is not None

        # ===== Stage 1: CFG Euler loop (half res under two-stage) =====
        s1_h = config.height // 2 if two_stage else config.height
        s1_w = config.width // 2 if two_stage else config.width
        sigmas = jnp.asarray(
            LTX2Scheduler().execute(
                steps=config.num_inference_steps,
                # Reference keyframe_interpolation.py:373: fixed anchor.
                tokens=(
                    ((config.num_frames - 1) // 8 + 1)
                    * (s1_h // 32) * (s1_w // 32)
                    if config.token_dependent_shift else None
                ),
            ),
            jnp.float32,
        )
        final_latent = self._cfg_stage(
            config, s1_h, s1_w,
            create_keyframe_conditionings(
                keyframes, self._encode_image, s1_h, s1_w, config.fps, dtype
            ),
            sigmas, k1, 1.0,
            text_encoding, negative_encoding, config.cfg_scale,
        )
        if callback:
            callback("stage1", config.num_inference_steps, config.num_inference_steps)

        # ===== Stage 2: upscale + distilled refinement, no CFG =====
        if two_stage:
            from ltx2_tpu.components import STAGE_2_DISTILLED_SIGMA_VALUES

            upscaled = self._upscale_latent(final_latent, dtype)

            distilled = jnp.asarray(
                STAGE_2_DISTILLED_SIGMA_VALUES[: config.stage_2_steps + 1],
                jnp.float32,
            )
            final_latent = self._cfg_stage(
                config, config.height, config.width,
                create_keyframe_conditionings(
                    keyframes, self._encode_image,
                    config.height, config.width, config.fps, dtype,
                ),
                distilled, k2, float(distilled[0]),
                # Reference :480-486: positive context on both rows,
                # CFGGuider(1.0) — guidance disabled.
                text_encoding, text_encoding, 1.0,
                initial_latent=upscaled,
            )
            if callback:
                callback("stage2", config.stage_2_steps, config.stage_2_steps)

        # The reference keyframe pipeline is video-only; AV callers get
        # (video, None) so the (video, audio) unpacking stays uniform.
        if skip_decode:
            out = np.asarray(final_latent)
            return (out, None) if config.audio_enabled else out

        from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig

        decode_cfg = OneStageCFGConfig(
            height=config.height if two_stage else s1_h,
            width=config.width if two_stage else s1_w,
            num_frames=config.num_frames,
            tiling_config=config.tiling_config,
            latent_channels=config.latent_channels,
        )
        video = self._decode_video(final_latent, decode_cfg, decode_key)
        return (video, None) if config.audio_enabled else video


def create_keyframe_pipeline(**kwargs) -> KeyframeInterpolationPipeline:
    return KeyframeInterpolationPipeline(**kwargs)
