"""TI2Vid-HQ pipeline: two-stage generation with the Res2s 2nd-order sampler.

Capability parity with reference LTX_2_MLX/pipelines/ti2vid_hq.py
(TI2VidHQPipeline, ti2vid_hq.py:100-531): stage 1 at half resolution with a
Res2s exponential-integrator RK loop under CFG (about half the steps of
Euler for the same quality), 2x spatial upscale, stage 2 distilled-tail
refinement.

The Res2s RK coefficients are pure host float math over the static sigma
schedule (components/res2s.py); the per-step CFG evaluation is one jitted
batched forward. The reference's 100-iteration "Bong" anchor refinement
(ti2vid_hq.py:240-247) is an affine fixed-point iteration — we use its
closed form: anchor* = (x_mid - c*denoised) / (1 - c), c = h*a21.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltx2_tpu.components import GaussianNoiser, LTX2Scheduler
from ltx2_tpu.components.res2s import get_res2s_coefficients
from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
from ltx2_tpu.models.transformer.model import LTXModelConfig
from ltx2_tpu.pipelines.common import (
    modality_from_state,
    post_process_latent,
)
from ltx2_tpu.pipelines.denoise import _precompute_video_pe, _tile_rows
from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline
from ltx2_tpu.types import AudioLatentShape, LatentState, VideoLatentShape, VideoPixelShape


@dataclass
class TI2VidHQConfig(DistilledConfig):
    """Reference TI2VidHQConfig surface (ti2vid_hq.py:53-98)."""

    num_inference_steps: int = 15
    cfg_scale: float = 3.0
    audio_cfg_scale: float = 7.0


@lru_cache(maxsize=8)
def _make_cfg_eval(model_cfg: LTXModelConfig, need_cfg: bool, av: bool):
    """Jitted batched-row CFG evaluation used twice per Res2s step."""
    rows = 2 if need_cfg else 1

    def eval_fn(params, v_latent, v_mask, v_positions, v_clean, v_ctx,
                a_latent, a_mask, a_positions, a_clean, a_ctx, sigma,
                video_pe):
        # video_pe is precomputed ONCE per generation by the caller
        # (review r4): positions are loop-invariant, and computing the
        # RoPE grid inside this jitted eval re-ran it on device twice per
        # Res2s step — the exact recompute denoise.py's scan loops hoist.
        from ltx2_tpu.models.transformer.model import x0_model_apply

        v_state = LatentState(
            latent=_tile_rows(v_latent, rows),
            denoise_mask=_tile_rows(v_mask, rows),
            positions=_tile_rows(v_positions, rows),
            clean_latent=_tile_rows(v_clean, rows),
        )
        kwargs = dict(video=modality_from_state(v_state, v_ctx, sigma), video_pe=video_pe)
        if av:
            a_state = LatentState(
                latent=_tile_rows(a_latent, rows),
                denoise_mask=_tile_rows(a_mask, rows),
                positions=_tile_rows(a_positions, rows),
                clean_latent=_tile_rows(a_clean, rows),
            )
            kwargs["audio"] = modality_from_state(a_state, a_ctx, sigma)
        out = x0_model_apply(params, model_cfg, **kwargs)
        if av:
            v_out, a_out = out
        else:
            v_out, a_out = out, None
        # Return raw rows; the caller applies guidance.
        return v_out, a_out

    return jax.jit(eval_fn)


class TI2VidHQPipeline(DistilledPipeline):
    """Res2s-sampled two-stage pipeline."""

    def _res2s_denoise(
        self,
        video_state: LatentState,
        audio_state: Optional[LatentState],
        sigmas: np.ndarray,
        pos_v, neg_v, pos_a, neg_a,
        cfg_scale: float,
        audio_cfg_scale: float,
        callback=None,
    ):
        """Host-driven Res2s loop (ti2vid_hq.py:153-273); two jitted CFG
        evals per step."""
        av_cfg = audio_state is not None and audio_cfg_scale != 1.0
        # Audio CFG alone still needs the uncond row (ti2vid_hq.py:299
        # gates on `cfg_scale > 1.0 or audio_cfg_scale > 1.0`); video
        # guidance at scale 1 is then the identity neg + 1*(pos-neg).
        need_cfg = (cfg_scale != 1.0 or av_cfg) and neg_v is not None
        av = audio_state is not None
        eval_fn = _make_cfg_eval(self.transformer_cfg, need_cfg, av)
        video_pe = _precompute_video_pe(
            self.transformer_cfg, video_state.positions, 2 if need_cfg else 1
        )

        sig = [float(s) for s in sigmas]
        if sig[-1] == 0.0:
            sig = sig[:-1] + [0.0011, 0.0]
        hs = [
            -math.log(sig[i + 1] / sig[i]) if sig[i] > 0 and sig[i + 1] > 0 else 0.0
            for i in range(len(sig) - 1)
        ]
        # DELIBERATE reference parity (ti2vid_hq.py:167-185): num_steps
        # counts the ORIGINAL schedule even though sig grew by one entry,
        # so the appended 0.0011 tail step never executes — the loop ends
        # with the full RK step TO sigma=0.0011 and the final denoise at
        # 0.0011 is dead code in the reference executable too. Matching
        # the executable (docs/PARITY.md rule) means matching this.
        num_steps = len(sigmas) - 1
        phi_cache: dict = {}
        c2 = 0.5

        def ctx(pos, neg):
            return jnp.concatenate([pos, neg], axis=0) if need_cfg else pos

        v_ctx = ctx(pos_v, neg_v)
        a_ctx = ctx(pos_a, neg_a) if av else None
        zeros = jnp.zeros((1, 1, 1))

        def cfg_eval(v_latent, a_latent, sigma):
            v_out, a_out = eval_fn(
                self.transformer_params,
                v_latent, video_state.denoise_mask, video_state.positions,
                video_state.clean_latent, v_ctx,
                a_latent if av else zeros,
                audio_state.denoise_mask if av else zeros,
                audio_state.positions if av else zeros,
                audio_state.clean_latent if av else zeros,
                a_ctx if av else zeros,
                jnp.float32(sigma),
                video_pe,
            )

            def guide(o, scale):
                if o is None:
                    return None
                if not need_cfg:
                    return o[0:1]
                pos, neg = o[0:1], o[1:2]
                return neg + scale * (pos - neg)

            return guide(v_out, cfg_scale), guide(a_out, audio_cfg_scale)

        v_latent = video_state.latent
        a_latent = audio_state.latent if av else None

        for step_idx in range(num_steps):
            sigma, sigma_next = sig[step_idx], sig[step_idx + 1]
            d_v, d_a = cfg_eval(v_latent, a_latent, sigma)
            d_v = post_process_latent(d_v, video_state.denoise_mask, video_state.clean_latent)
            if av and d_a is not None:
                d_a = post_process_latent(d_a, audio_state.denoise_mask, audio_state.clean_latent)

            h = hs[step_idx]
            if h == 0.0 or sigma_next <= 0.001:
                v_latent = d_v
                if av and d_a is not None:
                    a_latent = d_a
                break

            a21, b1, b2 = get_res2s_coefficients(h, phi_cache, c2)
            sub_sigma = math.sqrt(sigma * sigma_next)
            c = h * a21

            def advance(latent, denoised):
                anchor = latent.astype(jnp.float32)
                eps1 = denoised.astype(jnp.float32) - anchor
                x_mid = anchor + c * eps1
                # Bong-iteration fixed point (closed form) when applicable.
                if h < 0.5 and sigma > 0.03 and abs(1 - c) > 1e-6:
                    anchor = (x_mid - c * denoised.astype(jnp.float32)) / (1 - c)
                    eps1 = denoised.astype(jnp.float32) - anchor
                return anchor, eps1, x_mid

            anchor_v, eps1_v, x_mid_v = advance(v_latent, d_v)
            if av and d_a is not None:
                anchor_a, eps1_a, x_mid_a = advance(a_latent, d_a)
            else:
                x_mid_a = None

            d_v2, d_a2 = cfg_eval(
                x_mid_v.astype(v_latent.dtype),
                x_mid_a.astype(a_latent.dtype) if x_mid_a is not None else a_latent,
                sub_sigma,
            )
            d_v2 = post_process_latent(d_v2, video_state.denoise_mask, video_state.clean_latent)
            eps2_v = d_v2.astype(jnp.float32) - anchor_v
            v_latent = (anchor_v + h * (b1 * eps1_v + b2 * eps2_v)).astype(v_latent.dtype)

            if av and d_a2 is not None:
                d_a2 = post_process_latent(d_a2, audio_state.denoise_mask, audio_state.clean_latent)
                eps2_a = d_a2.astype(jnp.float32) - anchor_a
                a_latent = (anchor_a + h * (b1 * eps1_a + b2 * eps2_a)).astype(a_latent.dtype)

            if callback:
                callback(step_idx + 1, num_steps)

        video_state = video_state.replace(latent=v_latent)
        if av:
            audio_state = audio_state.replace(latent=a_latent)
        return video_state, audio_state

    def __call__(  # type: ignore[override]
        self,
        positive_encoding: jnp.ndarray,
        negative_encoding: jnp.ndarray,
        config: TI2VidHQConfig,
        images=None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        positive_audio_encoding: Optional[jnp.ndarray] = None,
        negative_audio_encoding: Optional[jnp.ndarray] = None,
        skip_decode: bool = False,
    ):
        images = images or []
        key = jax.random.PRNGKey(config.seed)
        k1, k1a, k2, decode_key = jax.random.split(key, 4)
        dtype = jnp.dtype(config.dtype)
        noiser = GaussianNoiser()

        internal_audio_active = self.is_av_model and (
            config.use_internal_audio_branch or config.audio_enabled
        )
        if internal_audio_active and positive_audio_encoding is None:
            positive_audio_encoding = positive_encoding
            negative_audio_encoding = negative_encoding

        # ===== Stage 1: half-res Res2s CFG =====
        stage_1_shape = VideoPixelShape(
            batch=1, frames=config.num_frames,
            height=config.height // 2, width=config.width // 2, fps=config.fps,
        )
        latent_shape = VideoLatentShape.from_pixel_shape(
            stage_1_shape, latent_channels=config.latent_channels
        )
        video_tools = VideoLatentTools(
            patchifier=self.patchifier, target_shape=latent_shape, fps=config.fps
        )
        video_state = video_tools.create_initial_state(dtype=dtype)
        # Image conditionings apply to STAGE 1 too (ti2vid_hq.py:387-392):
        # the half-res Res2s loop is where the content forms — without them
        # i2v would silently degrade to weak stage-2-only conditioning.
        from ltx2_tpu.pipelines.common import (
            apply_conditionings,
            create_image_conditionings,
        )

        stage_1_conditionings = create_image_conditionings(
            images, self._encode_image,
            stage_1_shape.height, stage_1_shape.width, dtype,
        )
        video_state = apply_conditionings(
            video_state, stage_1_conditionings, video_tools
        )
        sigmas = LTX2Scheduler().execute(
            steps=config.num_inference_steps,
            # Reference ti2vid_hq.py:395 uses the fixed 4096 anchor.
            tokens=(
                latent_shape.tokens if config.token_dependent_shift else None
            ),
        )
        video_state = noiser(k1, video_state, noise_scale=1.0)

        audio_state = None
        audio_tools = None
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
            audio_state = noiser(k1a, audio_tools.create_initial_state(dtype=dtype), 1.0)

        video_state, audio_state = self._res2s_denoise(
            video_state, audio_state, sigmas,
            positive_encoding, negative_encoding,
            positive_audio_encoding, negative_audio_encoding,
            config.cfg_scale, config.audio_cfg_scale,
            callback=(lambda s, t: callback("stage1", s, t)) if callback else None,
        )

        video_state = video_tools.clear_conditioning(video_state)
        video_state = video_tools.unpatchify(video_state)
        stage_1_latent = video_state.latent
        stage_1_audio = None
        if audio_state is not None and audio_tools is not None:
            audio_state = audio_tools.clear_conditioning(audio_state)
            audio_state = audio_tools.unpatchify(audio_state)
            stage_1_audio = audio_state.latent

        # ===== Stage 2: upscale + distilled tail (reuse distilled stage) =====
        final_audio_latent = stage_1_audio
        if self.spatial_upscaler_params is not None:
            from ltx2_tpu.components import STAGE_2_DISTILLED_SIGMA_VALUES

            upscaled = self._upscale_latent(stage_1_latent, dtype)

            stage_2_shape = VideoPixelShape(
                batch=1, frames=config.num_frames,
                height=config.height, width=config.width, fps=config.fps,
            )
            final_video_latent, stage_2_audio = self._run_stage(
                stage_2_shape,
                np.asarray(STAGE_2_DISTILLED_SIGMA_VALUES, np.float32),
                positive_encoding, positive_audio_encoding,
                config, images, k2, float(STAGE_2_DISTILLED_SIGMA_VALUES[0]),
                internal_audio_active,
                initial_video_latent=upscaled,
                initial_audio_latent=stage_1_audio,
            )
            if stage_2_audio is not None:
                final_audio_latent = stage_2_audio
        else:
            final_video_latent = stage_1_latent

        if skip_decode:
            if config.audio_enabled:
                return np.asarray(final_video_latent), final_audio_latent
            return np.asarray(final_video_latent)

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


def create_ti2vid_hq_pipeline(**kwargs) -> TI2VidHQPipeline:
    return TI2VidHQPipeline(**kwargs)
