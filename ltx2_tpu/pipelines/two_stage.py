"""Two-stage CFG pipeline with distilled-LoRA refinement.

Capability parity with reference LTX_2_MLX/pipelines/two_stage.py
(TwoStagePipeline, two_stage.py:495-804): stage 1 at half resolution under
the MultiModalGuider (CFG + modality-isolation) -> un-normalize ->
SpatialUpscaler -> re-normalize -> fuse the distilled LoRA -> stage 2 with
the distilled sigma tail (no CFG) -> restore original weights.
Resolution must be divisible by 64 (two_stage.py:130-141).

TPU note: LoRA fuse/restore happens OUTSIDE jit on the param tree via
delta subtraction (loader/lora.py) — no second copy of the model is kept.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import (
    CFGGuider,
    GaussianNoiser,
    LTX2Scheduler,
    STAGE_2_DISTILLED_SIGMA_VALUES,
)
from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params, unfuse_lora_deltas
from ltx2_tpu.models.video_vae import TilingConfig
from ltx2_tpu.pipelines.common import (
    ImageCondition,
    apply_conditionings,
    create_image_conditionings,
)
from ltx2_tpu.pipelines.denoise import (
    DenoiseLoopConfig,
    MultiModalLoopConfig,
    make_multimodal_av_denoise_loop,
    make_video_denoise_loop,
    mesh_loop_kwargs,
)
from ltx2_tpu.pipelines.distilled import DistilledPipeline
from ltx2_tpu.types import AudioLatentShape, VideoLatentShape, VideoPixelShape


@dataclass
class TwoStageCFGConfig:
    """Reference TwoStageCFGConfig surface (two_stage.py:88-141)."""

    height: int = 480
    width: int = 704
    num_frames: int = 97

    seed: int = 42
    fps: float = 25.0
    num_inference_steps: int = 30

    cfg_scale: float = 3.0
    audio_cfg_scale: float = 7.0
    guidance_rescale: float = 0.0
    modality_scale: float = 3.0
    # Guidance reuse (denoise.py): stage-1 uncond (and, for the AV
    # multi-modal guider, modality-isolation) rows every k-th step,
    # carried deltas in between; 1 = exact CFG.
    cfg_interval: int = 1

    distilled_lora_config: Optional[LoRAConfig] = None
    stage_2_sigmas: Optional[list] = None
    tiling_config: Optional[TilingConfig] = None
    dtype: str = "float32"
    latent_channels: int = 128

    audio_enabled: bool = False
    use_internal_audio_branch: bool = True
    audio_vae_channels: int = 8
    audio_mel_bins: int = 16
    audio_sample_rate: int = 16000
    audio_hop_length: int = 160
    audio_downsample_factor: int = 4
    audio_output_sample_rate: int = 24000

    # Reference anchor (4096) by default; True = resolution-aware shift.
    token_dependent_shift: bool = False

    def __post_init__(self):
        if self.num_frames % 8 != 1:
            raise ValueError(
                f"num_frames must be 8*k + 1, got {self.num_frames}. "
                f"Valid values: 1, 9, 17, 25, 33, ..., 121"
            )
        if self.height % 64 != 0 or self.width % 64 != 0:
            raise ValueError(
                f"Resolution ({self.height}x{self.width}) "
                f"must be divisible by 64 for two-stage pipeline."
            )


class TwoStagePipeline(DistilledPipeline):
    """Stage 1 CFG (multi-modal guidance) + stage 2 distilled refinement."""

    def __call__(  # type: ignore[override]
        self,
        positive_encoding: jnp.ndarray,
        negative_encoding: jnp.ndarray,
        config: TwoStageCFGConfig,
        images: Optional[List[ImageCondition]] = None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        positive_audio_encoding: Optional[jnp.ndarray] = None,
        negative_audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
    ) -> Tuple[np.ndarray, Optional[jnp.ndarray]]:
        images = images or []
        internal_audio_active = self.is_av_model and (
            config.use_internal_audio_branch or config.audio_enabled
        )
        if (config.audio_enabled or internal_audio_active) and (
            positive_audio_encoding is None or negative_audio_encoding is None
        ):
            raise ValueError(
                "Audio encoding required for AudioVideo generation. "
                "Provide positive_audio_encoding and negative_audio_encoding."
            )

        key = jax.random.PRNGKey(config.seed)
        k1, k1a, k2, k2a, decode_key = jax.random.split(key, 5)
        noiser = GaussianNoiser()
        scheduler = LTX2Scheduler()
        dtype = jnp.dtype(config.dtype)

        # ====== STAGE 1: half resolution, MultiModalGuider CFG ======
        stage_1_shape = VideoPixelShape(
            batch=1, frames=config.num_frames,
            height=config.height // 2, width=config.width // 2, fps=config.fps,
        )
        stage_1_latent_shape = VideoLatentShape.from_pixel_shape(
            stage_1_shape, latent_channels=config.latent_channels
        )
        video_tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=stage_1_latent_shape, fps=config.fps
        )
        conditionings = create_image_conditionings(
            images, self._encode_image, stage_1_shape.height, stage_1_shape.width, dtype
        )
        video_state = video_tools.create_initial_state(dtype=dtype)
        video_state = apply_conditionings(video_state, conditionings, video_tools)
        sigmas = jnp.asarray(
            scheduler.execute(
                steps=config.num_inference_steps,
                # Reference two_stage.py:598 uses the fixed 4096 anchor.
                tokens=(
                    stage_1_latent_shape.tokens
                    if config.token_dependent_shift else None
                ),
            )
        )
        video_state = noiser(k1, video_state, noise_scale=1.0)

        if internal_audio_active:
            audio_shape = AudioLatentShape.from_video_pixel_shape(
                stage_1_shape,
                channels=config.audio_vae_channels,
                mel_bins=config.audio_mel_bins,
                sample_rate=config.audio_sample_rate,
                hop_length=config.audio_hop_length,
                audio_latent_downsample_factor=config.audio_downsample_factor,
            )
            audio_tools = AudioLatentTools(
                patchifier=self.audio_patchifier, target_shape=audio_shape
            )
            audio_state = audio_tools.create_initial_state(dtype=dtype)
            audio_state = noiser(k1a, audio_state, noise_scale=1.0)

            mm = MultiModalLoopConfig(
                video_cfg_scale=config.cfg_scale,
                audio_cfg_scale=config.audio_cfg_scale,
                rescale_scale=config.guidance_rescale,
                modality_scale=config.modality_scale,
                cfg_interval=config.cfg_interval,
            )
            loop = make_multimodal_av_denoise_loop(
                self.transformer_cfg, mm, **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh)
            )
            video_state, audio_state = loop(
                self.transformer_params, video_state, audio_state, sigmas,
                positive_encoding, negative_encoding,
                positive_audio_encoding, negative_audio_encoding,
            )
            audio_state = audio_tools.clear_conditioning(audio_state)
            audio_state = audio_tools.unpatchify(audio_state)
            stage_1_audio_latent = audio_state.latent
        else:
            # guidance_rescale applies in the video-only CFG loop too
            # (reference two_stage.py:288-290 rescale_noise_cfg).
            if config.guidance_rescale > 0:
                from ltx2_tpu.components.guiders import RescaledCFGGuider

                guider = RescaledCFGGuider(
                    scale=config.cfg_scale, rescale=config.guidance_rescale
                )
            else:
                guider = CFGGuider(scale=config.cfg_scale)
            loop = make_video_denoise_loop(
                self.transformer_cfg,
                DenoiseLoopConfig(
                    guider=guider, uniform_timesteps=not conditionings,
                    cfg_interval=config.cfg_interval,
                ),
                **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh),
            )
            video_state = loop(
                self.transformer_params, video_state, sigmas,
                positive_encoding, negative_encoding,
            )
            stage_1_audio_latent = None

        video_state = video_tools.clear_conditioning(video_state)
        video_state = video_tools.unpatchify(video_state)
        stage_1_video_latent = video_state.latent
        if callback:
            callback("stage1", config.num_inference_steps, config.num_inference_steps)

        # ====== STAGE 2: upscale + distilled-LoRA refinement ======
        final_audio_latent = stage_1_audio_latent
        if self.spatial_upscaler_params is not None:
            upscaled_video_latent = self._upscale_latent(
                stage_1_video_latent, dtype
            )

            # Fuse distilled LoRA; keep the deltas to restore afterwards
            # (two_stage.py:676-691,778-782).
            applied = None
            if config.distilled_lora_config is not None:
                self.transformer_params, applied = fuse_lora_into_params(
                    self.transformer_params,
                    [config.distilled_lora_config],
                    return_deltas=True,
                )

            try:
                stage_2_sigmas = np.asarray(
                    config.stage_2_sigmas or STAGE_2_DISTILLED_SIGMA_VALUES, np.float32
                )
                stage_2_shape = VideoPixelShape(
                    batch=1, frames=config.num_frames,
                    height=config.height, width=config.width, fps=config.fps,
                )
                final_video_latent, stage_2_audio = self._run_stage(
                    stage_2_shape, stage_2_sigmas,
                    positive_encoding, positive_audio_encoding,
                    _distilled_view(config), images, k2,
                    float(stage_2_sigmas[0]), internal_audio_active,
                    initial_video_latent=upscaled_video_latent,
                    initial_audio_latent=stage_1_audio_latent,
                )
                if stage_2_audio is not None:
                    final_audio_latent = stage_2_audio
            finally:
                if applied is not None:
                    self.transformer_params = unfuse_lora_deltas(
                        self.transformer_params, applied
                    )
            if callback:
                n = len(stage_2_sigmas) - 1
                callback("stage2", n, n)
        else:
            final_video_latent = stage_1_video_latent

        if skip_decode:
            return np.asarray(final_video_latent), final_audio_latent

        from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig

        decode_cfg = OneStageCFGConfig(
            height=config.height, width=config.width, num_frames=config.num_frames,
            tiling_config=config.tiling_config, latent_channels=config.latent_channels,
        )
        video = self._decode_video(final_video_latent, decode_cfg, decode_key)

        audio_waveform = None
        if config.audio_enabled and final_audio_latent is not None:
            audio_waveform = self._decode_audio(final_audio_latent)
        return video, audio_waveform


def _distilled_view(config: TwoStageCFGConfig):
    """Adapter: TwoStageCFGConfig -> the DistilledConfig fields _run_stage
    needs (audio setup + dtype + latent channels)."""
    from ltx2_tpu.pipelines.distilled import DistilledConfig

    return DistilledConfig(
        height=config.height, width=config.width, num_frames=config.num_frames,
        seed=config.seed, fps=config.fps, dtype=config.dtype,
        latent_channels=config.latent_channels,
        audio_enabled=config.audio_enabled,
        use_internal_audio_branch=config.use_internal_audio_branch,
        audio_vae_channels=config.audio_vae_channels,
        audio_mel_bins=config.audio_mel_bins,
        audio_sample_rate=config.audio_sample_rate,
        audio_hop_length=config.audio_hop_length,
        audio_downsample_factor=config.audio_downsample_factor,
    )


def create_two_stage_pipeline(**kwargs) -> TwoStagePipeline:
    return TwoStagePipeline(**kwargs)
