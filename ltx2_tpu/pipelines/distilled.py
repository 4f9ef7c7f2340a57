"""Distilled two-stage pipeline (no CFG).

Capability parity with reference LTX_2_MLX/pipelines/distilled.py
(DistilledPipeline, distilled.py:101-506): stage 1 at half resolution with
the 8 hard-coded distilled sigmas -> 2x learned spatial upscale
(un-normalize / upscale / re-normalize) -> stage 2 refinement with the
3-sigma tail, plus the internal audio branch with the channelwise noise
normalization fix (distilled.py:166-186).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import (
    CFGGuider,
    DISTILLED_SIGMA_VALUES,
    GaussianNoiser,
    STAGE_2_DISTILLED_SIGMA_VALUES,
)
from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
from ltx2_tpu.models.upscaler import SpatialUpscalerConfig
from ltx2_tpu.models.video_vae import (
    TilingConfig,
    normalize_latent,
    un_normalize_latent,
)
from ltx2_tpu.pipelines.common import (
    ImageCondition,
    apply_conditionings,
    consolidate_latent,
    create_image_conditionings,
)
from ltx2_tpu.pipelines.denoise import (
    DenoiseLoopConfig,
    make_av_denoise_loop,
    make_video_denoise_loop,
    mesh_loop_kwargs,
)
from ltx2_tpu.pipelines.one_stage import OneStagePipeline
from ltx2_tpu.types import AudioLatentShape, VideoLatentShape, VideoPixelShape


@dataclass
class DistilledConfig:
    """Reference DistilledConfig surface (distilled.py:49-99)."""

    height: int = 704
    width: int = 1024
    num_frames: int = 121
    seed: int = 42
    fps: float = 24.0
    dtype: str = "float32"
    tiling_config: Optional[TilingConfig] = None
    latent_channels: int = 128

    audio_enabled: bool = False
    use_internal_audio_branch: bool = True
    audio_vae_channels: int = 8
    audio_mel_bins: int = 16
    audio_sample_rate: int = 16000
    audio_hop_length: int = 160
    audio_downsample_factor: int = 4

    # Sigma-schedule shift: False (default) anchors at the reference's
    # fixed 4096 tokens (its pipelines never pass a latent); True shifts
    # by the actual token count (upstream-LTX resolution-aware opt-in).
    # Consumed by the scheduler-driven stage-1 loops (ti2vid-hq); the
    # distilled stages use fixed sigma tables.
    token_dependent_shift: bool = False

    def __post_init__(self):
        if self.num_frames % 8 != 1:
            raise ValueError(
                f"num_frames must be 8*k + 1, got {self.num_frames}."
            )
        # Two-stage: stage 1 runs at half res, so 64-divisibility required.
        if self.height % 64 != 0 or self.width % 64 != 0:
            raise ValueError(
                f"Resolution ({self.height}x{self.width}) must be divisible "
                f"by 64 for the distilled two-stage pipeline."
            )

    def effective_tiling(self) -> Optional[TilingConfig]:
        latent_frames = (self.num_frames - 1) // 8 + 1
        if self.tiling_config is not None:
            return self.tiling_config
        if latent_frames * (self.height // 32) * (self.width // 32) > 4000:
            return TilingConfig.default()
        return None


def channelwise_normalize_audio(latent: jnp.ndarray) -> jnp.ndarray:
    """Length-invariant audio noise normalization (distilled.py:166-186):
    global zero-mean/unit-std, then per-feature unit-std over tokens."""
    x = latent.astype(jnp.float32)
    x = (x - jnp.mean(x)) / (jnp.std(x) + 1e-8)
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.std(x, axis=1, keepdims=True) + 1e-8
    return ((x - mean) / std).astype(latent.dtype)


class DistilledPipeline(OneStagePipeline):
    """Two-stage distilled generation over functional params."""

    def __init__(
        self,
        *args,
        spatial_upscaler_params=None,
        spatial_upscaler_cfg: Optional[SpatialUpscalerConfig] = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.spatial_upscaler_params = spatial_upscaler_params
        self.spatial_upscaler_cfg = spatial_upscaler_cfg or SpatialUpscalerConfig()

    def _stats(self):
        if self.video_decoder_params is not None:
            return self.video_decoder_params["per_channel_statistics"]
        if self.video_encoder_params is not None:
            return self.video_encoder_params["per_channel_statistics"]
        raise ValueError("per-channel statistics unavailable (no VAE params)")

    def _upscale_latent(self, latent, dtype):
        """The shared stage-boundary bracket: consolidate (SP/PP loop
        outputs are sharded; the upscaler convs need a full latent) ->
        un-normalize (the upscaler is trained on un-normalized latents) ->
        2x spatial upscale -> re-normalize -> cast. ONE definition for all
        four staged pipelines so the bracket cannot drift (review r4)."""
        from ltx2_tpu.pipelines.common import jitted_spatial_upscaler

        stats = self._stats()
        upscale = jitted_spatial_upscaler(self.spatial_upscaler_cfg)
        upscaled = upscale(
            self.spatial_upscaler_params,
            un_normalize_latent(consolidate_latent(latent), stats),
        )
        return normalize_latent(upscaled, stats).astype(jnp.dtype(dtype))

    def _run_stage(
        self,
        pixel_shape: VideoPixelShape,
        sigmas: np.ndarray,
        text_encoding,
        audio_encoding,
        config: DistilledConfig,
        images: List[ImageCondition],
        noise_key,
        noise_scale: float,
        internal_audio_active: bool,
        initial_video_latent=None,
        initial_audio_latent=None,
        normalize_audio_noise: bool = False,
        extra_conditionings=None,
        freeze_audio: bool = False,
    ):
        latent_shape = VideoLatentShape.from_pixel_shape(
            pixel_shape, latent_channels=config.latent_channels
        )
        video_tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=latent_shape, fps=config.fps
        )
        conditionings = create_image_conditionings(
            images, self._encode_image, pixel_shape.height, pixel_shape.width,
            jnp.dtype(config.dtype),
        )
        if extra_conditionings:
            conditionings = conditionings + list(extra_conditionings)
        video_state = video_tools.create_initial_state(
            dtype=jnp.dtype(config.dtype), initial_latent=initial_video_latent
        )
        video_state = apply_conditionings(video_state, conditionings, video_tools)

        noiser = GaussianNoiser()
        vkey, akey = jax.random.split(noise_key)
        video_state = noiser(vkey, video_state, noise_scale=noise_scale)

        # distilled: no CFG; per-batch timesteps when nothing conditions the
        # mask (stage 2 always conditions via initial_video_latent... the
        # mask stays all-ones there too — only conditionings write to it).
        # freeze_audio forces per-token timesteps: the frozen audio tokens
        # must see timestep = mask * sigma = 0 (reference one_stage
        # semantics, pinned by the a2vid recipe oracle).
        loop_cfg = DenoiseLoopConfig(
            guider=CFGGuider(1.0),
            uniform_timesteps=not conditionings and not freeze_audio,
        )
        sig = jnp.asarray(sigmas, jnp.float32)

        audio_state = None
        audio_tools = None
        if internal_audio_active:
            audio_shape = AudioLatentShape.from_video_pixel_shape(
                pixel_shape,
                channels=config.audio_vae_channels,
                mel_bins=config.audio_mel_bins,
                sample_rate=config.audio_sample_rate,
                hop_length=config.audio_hop_length,
                audio_latent_downsample_factor=config.audio_downsample_factor,
            )
            audio_tools = AudioLatentTools(
                patchifier=self.audio_patchifier, target_shape=audio_shape
            )
            audio_state = audio_tools.create_initial_state(
                dtype=jnp.dtype(config.dtype), initial_latent=initial_audio_latent
            )

            def _freeze(state):
                # mask=0 + latent==clean: the Euler velocity is exactly 0,
                # so the latent is bit-frozen through the loop (a2vid).
                return state.replace(
                    clean_latent=state.latent,
                    denoise_mask=jnp.zeros_like(state.denoise_mask),
                )

            if freeze_audio and initial_audio_latent is not None:
                # Encoded conditioning: freeze BEFORE the noiser (mask 0
                # no-ops the blend, keeping the encoded latent noise-free —
                # reference a2vid's encoded branch).
                audio_state = _freeze(audio_state)
            audio_state = noiser(akey, audio_state, noise_scale=noise_scale)
            if normalize_audio_noise and not freeze_audio:
                audio_state = audio_state.replace(
                    latent=channelwise_normalize_audio(audio_state.latent)
                )
            if freeze_audio and initial_audio_latent is None:
                # Reference fallback: noise init, frozen through the loop
                # (a2vid_two_stage.py _video_only_denoise_loop never steps
                # the audio latent).
                audio_state = _freeze(audio_state)
            loop = make_av_denoise_loop(
                self.transformer_cfg, loop_cfg, **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh)
            )
            video_state, audio_state = loop(
                self.transformer_params, video_state, audio_state, sig,
                text_encoding, text_encoding, audio_encoding, audio_encoding,
            )
        else:
            loop = make_video_denoise_loop(
                self.transformer_cfg, loop_cfg, **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh)
            )
            video_state = loop(
                self.transformer_params, video_state, sig, text_encoding, text_encoding
            )

        video_state = video_tools.clear_conditioning(video_state)
        video_state = video_tools.unpatchify(video_state)
        audio_latent = None
        if audio_state is not None and audio_tools is not None:
            audio_state = audio_tools.clear_conditioning(audio_state)
            audio_state = audio_tools.unpatchify(audio_state)
            audio_latent = audio_state.latent
        return video_state.latent, audio_latent

    def __call__(
        self,
        text_encoding: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        config: DistilledConfig,
        images: Optional[List[ImageCondition]] = None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
        freeze_audio: bool = False,
        initial_audio_latent=None,
    ) -> Union[np.ndarray, Tuple[np.ndarray, Optional[jnp.ndarray]]]:
        images = images or []
        key = jax.random.PRNGKey(config.seed)
        k1, k2, decode_key = jax.random.split(key, 3)

        internal_audio_active = self.is_av_model and (
            config.use_internal_audio_branch or config.audio_enabled
        )
        if internal_audio_active and audio_encoding is None:
            audio_encoding = text_encoding

        # ====== STAGE 1: half resolution, 8 distilled sigmas ======
        stage_1_shape = VideoPixelShape(
            batch=1, frames=config.num_frames,
            height=config.height // 2, width=config.width // 2, fps=config.fps,
        )
        stage_1_latent, stage_1_audio = self._run_stage(
            stage_1_shape, np.asarray(DISTILLED_SIGMA_VALUES, np.float32),
            text_encoding, audio_encoding, config, images, k1, 1.0,
            internal_audio_active, normalize_audio_noise=True,
            initial_audio_latent=initial_audio_latent,
            freeze_audio=freeze_audio,
        )
        if callback:
            callback("stage1", len(DISTILLED_SIGMA_VALUES) - 1, len(DISTILLED_SIGMA_VALUES) - 1)

        # ====== STAGE 2: 2x spatial upscale + 3-sigma refinement ======
        final_audio_latent = stage_1_audio
        if self.spatial_upscaler_params is not None:
            upscaled_video_latent = self._upscale_latent(
                stage_1_latent, config.dtype
            )

            stage_2_shape = VideoPixelShape(
                batch=1, frames=config.num_frames,
                height=config.height, width=config.width, fps=config.fps,
            )
            final_video_latent, stage_2_audio = self._run_stage(
                stage_2_shape,
                np.asarray(STAGE_2_DISTILLED_SIGMA_VALUES, np.float32),
                text_encoding, audio_encoding, config, images, k2,
                float(STAGE_2_DISTILLED_SIGMA_VALUES[0]),
                internal_audio_active,
                initial_video_latent=upscaled_video_latent,
                initial_audio_latent=stage_1_audio,
                freeze_audio=freeze_audio,
            )
            if stage_2_audio is not None:
                final_audio_latent = stage_2_audio
            if callback:
                n = len(STAGE_2_DISTILLED_SIGMA_VALUES) - 1
                callback("stage2", n, n)
        else:
            final_video_latent = stage_1_latent

        if skip_decode:
            if config.audio_enabled:
                return np.asarray(final_video_latent), final_audio_latent
            return np.asarray(final_video_latent)

        # Reuse one-stage decode machinery (auto-tiling included).
        from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig

        decode_cfg = OneStageCFGConfig(
            height=config.height, width=config.width, num_frames=config.num_frames,
            tiling_config=config.tiling_config, latent_channels=config.latent_channels,
        )
        video = self._decode_video(final_video_latent, decode_cfg, decode_key)

        audio_waveform = None
        if config.audio_enabled and final_audio_latent is not None:
            audio_waveform = self._decode_audio(final_audio_latent)
        if config.audio_enabled:
            return video, audio_waveform
        return video


def create_distilled_pipeline(**kwargs) -> DistilledPipeline:
    return DistilledPipeline(**kwargs)
