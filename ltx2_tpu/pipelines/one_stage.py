"""Single-stage CFG text/image-to-video pipeline.

Capability parity with reference LTX_2_MLX/pipelines/one_stage.py
(OneStagePipeline, one_stage.py:113-1011): LTX2Scheduler sigmas, CFG/CFG*
(or guider override e.g. APG), optional STG extra pass, GE velocity
correction, Euler or Heun sampling, image conditioning by latent
replacement, optional joint audio-video generation, late-block cross-attn
scaling, temporal-upscaler hook, and auto-tiled VAE decode.

TPU-first: the entire denoise loop is one jitted lax.scan (denoise.py);
CFG/STG ride the batch axis. The pipeline object holds params + static
configs and orchestrates host-side phases (conditioning, decode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import (
    CFGGuider,
    CFGStarRescalingGuider,
    GaussianNoiser,
    LTX2Scheduler,
    AudioPatchifier,
    VideoLatentPatchifier,
)
from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
from ltx2_tpu.models.transformer.model import LTXModelConfig, LTXModelType
from ltx2_tpu.models.video_vae import (
    TilingConfig,
    VideoDecoderConfig,
    VideoEncoderConfig,
    decode_latent,
    decode_tiled,
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
from ltx2_tpu.types import (
    AudioLatentShape,
    VideoLatentShape,
    VideoPixelShape,
)


@dataclass
class OneStageCFGConfig:
    """Pipeline configuration (one_stage.py:52-110)."""

    height: int = 480
    width: int = 704
    num_frames: int = 97  # must be 8k + 1

    seed: int = 42
    fps: float = 24.0
    num_inference_steps: int = 30

    cfg_scale: float = 3.0
    audio_cfg_scale: float = 7.0
    rescale_scale: float = 0.7
    # Guidance reuse (denoise.py): run the uncond forward every k-th step
    # and carry the guidance delta between (AV loops carry separate
    # video/audio deltas); 1 = exact CFG.
    cfg_interval: int = 1

    tiling_config: Optional[TilingConfig] = None

    dtype: str = "float32"

    audio_enabled: bool = False
    use_internal_audio_branch: bool = True
    audio_vae_channels: int = 8
    audio_mel_bins: int = 16
    audio_sample_rate: int = 16000
    audio_hop_length: int = 160
    audio_downsample_factor: int = 4
    audio_output_sample_rate: int = 24000

    latent_channels: int = 128

    # Shape-bucketed serving: round the video token count UP to a multiple
    # of this, mask the padding out of self-attention, slice after the
    # loop. Any (height, width, frames) landing in the same bucket reuses
    # ONE compiled denoise loop — a never-seen shape inside a warm bucket
    # costs zero new XLA compiles. 0 = off. Video-only (padded video keys
    # would leak into the a2v/v2a cross-modal attention).
    token_bucket: int = 0

    # False (default) = the reference's fixed 4096-token shift anchor
    # (its pipelines never pass a latent to the scheduler); True = shift
    # the sigma schedule by the actual latent token count (the upstream
    # LTX resolution-aware design; beyond-reference opt-in).
    token_dependent_shift: bool = False

    def __post_init__(self):
        if self.num_frames % 8 != 1:
            raise ValueError(
                f"num_frames must be 8*k + 1, got {self.num_frames}. "
                f"Valid values: 1, 9, 17, 25, 33, ..., 121"
            )
        if self.height % 32 != 0 or self.width % 32 != 0:
            raise ValueError(
                f"Resolution ({self.height}x{self.width}) "
                f"must be divisible by 32 for single-stage pipeline."
            )

    def effective_tiling(self) -> Optional[TilingConfig]:
        """Auto-enable tiling above ~4000 latent voxels (one_stage.py:74-84)."""
        if self.tiling_config is not None:
            return self.tiling_config
        latent_frames = (self.num_frames - 1) // 8 + 1
        if latent_frames * (self.height // 32) * (self.width // 32) > 4000:
            return TilingConfig.default()
        return None


class OneStagePipeline:
    """Single-stage CFG pipeline over functional params."""

    def __init__(
        self,
        transformer_params,
        transformer_cfg: LTXModelConfig,
        video_encoder_params=None,
        video_encoder_cfg: Optional[VideoEncoderConfig] = None,
        video_decoder_params=None,
        video_decoder_cfg: Optional[VideoDecoderConfig] = None,
        audio_decoder_params=None,
        audio_decoder_cfg=None,
        vocoder_params=None,
        vocoder_cfg=None,
        sequence_mesh=None,
        pipeline_mesh=None,
        vae_mesh=None,
        vae_w_mesh=None,
    ):
        # Optional jax.sharding.Mesh with a 'seq' axis: the denoise loops run
        # token-sharded (ring attention) end-to-end (SURVEY §2.12).
        self.sequence_mesh = sequence_mesh
        # Optional Mesh with a 'pipe' axis: block stack GPipe-pipelined
        # (params layer-sharded; shard with shard_pipeline_params first).
        self.pipeline_mesh = pipeline_mesh
        # Optional Mesh with a 'data' axis: tiled VAE decode runs
        # data-parallel, same-shape tiles batched one per chip.
        self.vae_mesh = vae_mesh
        # Optional Mesh with a 'data' axis: UNTILED decode runs W-sharded
        # with explicit per-conv halo exchange (tiling.decode_w_sharded) —
        # a single oversized frame splits across chips, no tile replication.
        self.vae_w_mesh = vae_w_mesh
        self.transformer_params = transformer_params
        self.transformer_cfg = transformer_cfg
        self.video_encoder_params = video_encoder_params
        self.video_encoder_cfg = video_encoder_cfg
        self.video_decoder_params = video_decoder_params
        self.video_decoder_cfg = video_decoder_cfg
        self.audio_decoder_params = audio_decoder_params
        self.audio_decoder_cfg = audio_decoder_cfg
        self.vocoder_params = vocoder_params
        self.vocoder_cfg = vocoder_cfg

        self.is_av_model = transformer_cfg.model_type == LTXModelType.AudioVideo
        self.patchifier = VideoLatentPatchifier(patch_size=1)
        self.audio_patchifier = AudioPatchifier(patch_size=1)
        self.scheduler = LTX2Scheduler()

    # -- helpers -----------------------------------------------------------
    def _encode_image(self, image_tensor: jnp.ndarray) -> jnp.ndarray:
        if self.video_encoder_params is None:
            raise ValueError("video encoder required for image conditioning")
        from ltx2_tpu.pipelines.common import jitted_video_encoder

        fn = jitted_video_encoder(self.video_encoder_cfg)
        return fn(self.video_encoder_params, image_tensor)

    def _decode_video(self, latent: jnp.ndarray, config: OneStageCFGConfig, key):
        latent = consolidate_latent(latent)
        tiling = config.effective_tiling()
        if tiling is None and self.vae_mesh is not None:
            from ltx2_tpu.utils.profiling import log

            log.warning(
                "--vae-dp-devices has no effect without tiling (pass "
                "--tile-size or exceed the auto-tile threshold); decoding "
                "on one chip"
            )
        if tiling is not None:
            from ltx2_tpu.pipelines.common import jitted_tile_decoder

            jit_dec = jitted_tile_decoder(self.video_decoder_cfg)
            decoder_fn = lambda tile, timestep=0.05: jit_dec(  # noqa: E731
                self.video_decoder_params, tile, timestep, key
            )
            chunks = list(
                decode_tiled(latent, decoder_fn, tiling, mesh=self.vae_mesh)
            )
            video = chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=2)
            video = np.clip((video + 1) / 2, 0, 1) * 255
            return video.astype(np.uint8)[0].transpose(1, 2, 3, 0)
        if self.vae_w_mesh is not None:
            from ltx2_tpu.models.video_vae.chunking import _to_uint8_frames
            from ltx2_tpu.models.video_vae.tiling import decode_w_sharded

            video = decode_w_sharded(
                jnp.asarray(latent), self.video_decoder_params,
                self.video_decoder_cfg, self.vae_w_mesh, key=key,
            )
            return np.asarray(_to_uint8_frames(video))
        return decode_latent(
            latent, self.video_decoder_params, self.video_decoder_cfg, key=key
        )

    def _decode_audio(self, audio_latent: jnp.ndarray) -> jnp.ndarray:
        audio_latent = consolidate_latent(audio_latent)
        if self.audio_decoder_params is None or self.vocoder_params is None:
            raise ValueError("Audio decoder and vocoder required for audio decoding")
        from ltx2_tpu.models.audio_vae import (
            VocoderWithBWEConfig,
            audio_decoder_apply,
            vocoder_apply,
            vocoder_with_bwe_apply,
        )

        from ltx2_tpu.pipelines.common import jitted_audio_decoder

        mel = jitted_audio_decoder(self.audio_decoder_cfg)(
            self.audio_decoder_params, audio_latent
        )
        # LTX-2.3 checkpoints carry the BWE chain (24->48 kHz); dispatch on
        # the config type the ledger loaded (generate.py:155-221 semantics).
        if isinstance(self.vocoder_cfg, VocoderWithBWEConfig):
            return vocoder_with_bwe_apply(self.vocoder_params, self.vocoder_cfg, mel)
        return vocoder_apply(self.vocoder_params, self.vocoder_cfg, mel)

    # -- main --------------------------------------------------------------
    def __call__(
        self,
        positive_encoding: jnp.ndarray,
        negative_encoding: jnp.ndarray,
        config: OneStageCFGConfig,
        images: Optional[List[ImageCondition]] = None,
        callback: Optional[Callable[[int, int], None]] = None,
        positive_audio_encoding: Optional[jnp.ndarray] = None,
        negative_audio_encoding: Optional[jnp.ndarray] = None,
        stg_scale: float = 0.0,
        stg_blocks: Optional[List[int]] = None,
        stg_cutoff: float = 1.0,
        stg_mode: str = "video",
        guider_override=None,
        ge_gamma: float = 0.0,
        sampler: str = "euler",
        spatial_upscaler: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        temporal_upscaler: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        cross_attn_scale: float = 1.0,
        cross_attn_start_block: int = 40,
        skip_decode: bool = False,
        cache_text_kv: bool = False,
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
        if (
            stg_scale > 0
            and stg_mode in ("audio", "both")
            and not internal_audio_active
        ):
            # Without the audio branch there is no audio self-attention to
            # perturb: the STG delta would be exactly 0 while every step
            # still pays the extra guidance row. Fail loudly instead.
            raise ValueError(
                f"stg_mode={stg_mode!r} requires the audio branch "
                "(--audio / use_internal_audio_branch); on a video-only run "
                "the audio perturbation is a no-op. Use stg_mode='video'."
            )

        key = jax.random.PRNGKey(config.seed)
        key, noise_key, audio_noise_key, decode_key = jax.random.split(key, 4)
        noiser = GaussianNoiser()

        if guider_override is not None:
            video_guider = guider_override
        elif config.rescale_scale > 0:
            video_guider = CFGStarRescalingGuider(scale=config.cfg_scale)
        else:
            video_guider = CFGGuider(scale=config.cfg_scale)
        if config.rescale_scale > 0:
            audio_guider = CFGStarRescalingGuider(scale=config.audio_cfg_scale)
        else:
            audio_guider = CFGGuider(scale=config.audio_cfg_scale)

        pixel_shape = VideoPixelShape(
            batch=1, frames=config.num_frames,
            height=config.height, width=config.width, fps=config.fps,
        )
        latent_shape = VideoLatentShape.from_pixel_shape(
            pixel_shape, latent_channels=config.latent_channels
        )
        video_tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=latent_shape, fps=config.fps
        )

        conditionings = create_image_conditionings(
            images, self._encode_image, config.height, config.width, jnp.dtype(config.dtype)
        )

        video_state = video_tools.create_initial_state(dtype=jnp.dtype(config.dtype))
        video_state = apply_conditionings(video_state, conditionings, video_tools)

        sigmas = jnp.asarray(
            self.scheduler.execute(
                steps=config.num_inference_steps,
                # Reference pipelines call execute(steps) with no latent, so
                # the shift anchors at the fixed 4096 tokens (schedulers.py:
                # 55-58, one_stage.py:840). token_dependent_shift is the
                # opt-in resolution-aware shift (the upstream LTX design).
                tokens=(
                    latent_shape.tokens
                    if config.token_dependent_shift else None
                ),
            )
        )
        video_state = noiser(noise_key, video_state, noise_scale=1.0)

        loop_cfg = DenoiseLoopConfig(
            guider=video_guider,
            audio_guider=audio_guider,
            stg_scale=stg_scale,
            stg_blocks=tuple(stg_blocks) if stg_blocks else None,
            stg_cutoff=stg_cutoff,
            stg_mode=stg_mode,
            ge_gamma=ge_gamma,
            sampler=sampler,
            cross_attn_scale=cross_attn_scale,
            cross_attn_start_block=cross_attn_start_block,
            cache_text_kv=cache_text_kv,
            # No token conditioning -> mask is all-ones -> per-batch
            # timesteps (saves the (B,N,n,D) fp32 AdaLN expansion).
            uniform_timesteps=not conditionings,
            cfg_interval=config.cfg_interval,
        )

        if config.token_bucket and internal_audio_active:
            raise ValueError(
                "token_bucket is video-only: padded video keys would leak "
                "into the a2v/v2a cross-modal attention unmasked"
            )

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
            audio_state = audio_tools.create_initial_state(dtype=jnp.dtype(config.dtype))
            audio_state = noiser(audio_noise_key, audio_state, noise_scale=1.0)

            loop = make_av_denoise_loop(
                self.transformer_cfg, loop_cfg,
                **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh),
            )
            video_state, audio_state = loop(
                self.transformer_params, video_state, audio_state, sigmas,
                positive_encoding, negative_encoding,
                positive_audio_encoding, negative_audio_encoding,
            )
        else:
            loop = make_video_denoise_loop(
                self.transformer_cfg, loop_cfg,
                **mesh_loop_kwargs(self.sequence_mesh, self.pipeline_mesh),
            )
            token_mask = None
            n_real = video_state.latent.shape[1]
            if config.token_bucket:
                from ltx2_tpu.pipelines.common import (
                    bucketed_tokens,
                    pad_state_tokens,
                    slice_state_tokens,
                )

                n_bucket = bucketed_tokens(n_real, config.token_bucket)
                video_state, token_mask = pad_state_tokens(video_state, n_bucket)
            video_state = loop(
                self.transformer_params, video_state, sigmas,
                positive_encoding, negative_encoding, token_mask=token_mask,
            )
            if config.token_bucket:
                video_state = slice_state_tokens(video_state, n_real)
        if callback:
            callback(config.num_inference_steps, config.num_inference_steps)

        video_state = video_tools.clear_conditioning(video_state)
        video_state = video_tools.unpatchify(video_state)
        # Loop outputs are sharded under SP/PP; the conv consumers below
        # (temporal upscaler, VAE decode) need a consolidated latent.
        final_video_latent = consolidate_latent(video_state.latent)

        # Post-hoc latent upscaling, spatial before temporal (the reference's
        # standard-pipeline order, generate.py:2000-2060). Each upscaler runs
        # on UN-normalized latents (trained that way) with its own
        # un-normalize/re-normalize bracket, exactly like the reference.
        for upscaler in (spatial_upscaler, temporal_upscaler):
            if upscaler is None:
                continue
            if self.video_decoder_params is None:
                # Reference fallback (generate.py:2027-2031): no VAE stats
                # available — upscale the normalized latent directly.
                final_video_latent = upscaler(final_video_latent)
                continue
            from ltx2_tpu.models.video_vae import (
                normalize_latent,
                un_normalize_latent,
            )

            stats = self.video_decoder_params["per_channel_statistics"]
            latent_upscaled = upscaler(un_normalize_latent(final_video_latent, stats))
            final_video_latent = normalize_latent(latent_upscaled, stats)

        if skip_decode:
            # Same audio-latent contract as the decode path and the staged
            # pipelines (review r4): conditioning cleared + unpatchified to
            # the (B, C, T, mel) grid the audio decoder consumes — not raw
            # (B, N, C) loop tokens.
            audio_latent = None
            if audio_state is not None:
                if audio_tools is not None:
                    a = audio_tools.clear_conditioning(audio_state)
                    audio_latent = np.asarray(audio_tools.unpatchify(a).latent)
                else:
                    audio_latent = np.asarray(audio_state.latent)
            return np.asarray(final_video_latent), audio_latent

        video = self._decode_video(final_video_latent, config, decode_key)

        audio_waveform = None
        if config.audio_enabled and audio_state is not None and audio_tools is not None:
            audio_state = audio_tools.clear_conditioning(audio_state)
            audio_state = audio_tools.unpatchify(audio_state)
            audio_waveform = self._decode_audio(audio_state.latent)

        return video, audio_waveform


def create_one_stage_pipeline(**kwargs) -> OneStagePipeline:
    return OneStagePipeline(**kwargs)
