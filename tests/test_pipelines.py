"""Pipeline tests: config validation, jitted denoise loop semantics, and a
tiny end-to-end one-stage run (random weights).

Mirrors reference tests/test_pipelines.py strategy (config validation +
mock-pipeline shape/seed/CFG preparation without weights, SURVEY.md §4).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.models.transformer.model import LTXModelType
from ltx2_tpu.pipelines.common import (
    modality_from_state,
    post_process_latent,
    timesteps_from_mask,
)
from ltx2_tpu.pipelines.denoise import (
    DenoiseLoopConfig,
    make_av_denoise_loop,
    make_video_denoise_loop,
)
from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig, OneStagePipeline
from ltx2_tpu.types import LatentState, VideoLatentShape
from tests.helpers import cached_params
from tests.test_dit import tiny_config
from tests.test_video_vae import TINY_DECODER, TINY_ENCODER, tiny_decoder_params


def make_state(cfg, frames=2, height=2, width=3, key=0):
    shape = VideoLatentShape(
        batch=1, channels=cfg.in_channels, frames=frames, height=height, width=width
    )
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(patch_size=1), target_shape=shape, fps=24.0
    )
    state = tools.create_initial_state()
    return GaussianNoiser()(jax.random.PRNGKey(key), state, 1.0), tools


class TestConfig:
    def test_frame_validation(self):
        with pytest.raises(ValueError, match="num_frames"):
            OneStageCFGConfig(num_frames=10)
        OneStageCFGConfig(num_frames=9, height=64, width=64)

    def test_resolution_validation(self):
        with pytest.raises(ValueError, match="divisible by 32"):
            OneStageCFGConfig(num_frames=9, height=100, width=64)

    def test_auto_tiling(self):
        small = OneStageCFGConfig(num_frames=9, height=64, width=64)
        assert small.effective_tiling() is None
        big = OneStageCFGConfig(num_frames=121, height=512, width=768)
        assert big.effective_tiling() is not None


class TestCommon:
    def test_post_process_blend(self):
        denoised = jnp.full((1, 4, 2), 2.0)
        clean = jnp.zeros((1, 4, 2))
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.5]])
        out = np.asarray(post_process_latent(denoised, mask, clean))
        np.testing.assert_allclose(out[0, :, 0], [2.0, 2.0, 0.0, 1.0])

    def test_timesteps_from_mask(self):
        mask = jnp.asarray([[1.0, 0.0, 0.5]])[..., None]
        t = timesteps_from_mask(mask, 0.8)
        np.testing.assert_allclose(np.asarray(t), [[0.8, 0.0, 0.4]])

    def test_modality_from_state(self):
        cfg = tiny_config()
        state, _ = make_state(cfg)
        m = modality_from_state(state, jnp.zeros((1, 5, 24)), 0.7)
        assert m.timesteps.shape == (1, 12)
        np.testing.assert_allclose(np.asarray(m.sigma), [0.7])


class TestDenoiseLoop:
    def test_no_cfg_reaches_denoised(self):
        """With sigma schedule ending at 0, final latent is finite and
        differs from initial noise."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        loop = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(1.0)))
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        out = loop(params, state, sigmas, ctx, ctx)
        assert out.latent.shape == state.latent.shape
        assert bool(jnp.all(jnp.isfinite(out.latent)))
        assert not np.allclose(np.asarray(out.latent), np.asarray(state.latent))

    def test_cfg_changes_output(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        pos = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.caption_channels))
        base = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(1.0)))(
            params, state, sigmas, pos, neg
        )
        cfg_out = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(4.0)))(
            params, state, sigmas, pos, neg
        )
        assert not np.allclose(np.asarray(base.latent), np.asarray(cfg_out.latent))

    def test_cfg_same_context_equals_no_cfg(self):
        """CFG with identical pos/neg context must reduce to no guidance."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        no_cfg = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(1.0)))(
            params, state, sigmas, ctx, ctx
        )
        with_cfg = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))(
            params, state, sigmas, ctx, ctx
        )
        np.testing.assert_allclose(
            np.asarray(no_cfg.latent), np.asarray(with_cfg.latent), atol=2e-4
        )

    def test_stg_changes_output(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        base = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(1.0)))(
            params, state, sigmas, ctx, ctx
        )
        stg = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(1.0), stg_scale=2.0)
        )(params, state, sigmas, ctx, ctx)
        assert not np.allclose(np.asarray(base.latent), np.asarray(stg.latent))

    def test_heun_sampler_runs(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        out = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(1.0), sampler="heun")
        )(params, state, sigmas, ctx, ctx)
        assert bool(jnp.all(jnp.isfinite(out.latent)))

    def test_mask_freezes_conditioned_tokens(self):
        """Tokens with denoise_mask=0 must keep their clean values."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state, _ = make_state(cfg)
        clean_vals = jax.random.normal(jax.random.PRNGKey(7), state.latent.shape)
        mask = state.denoise_mask.at[:, :4].set(0.0)
        frozen = LatentState(
            latent=jnp.where(mask > 0, state.latent, clean_vals),
            denoise_mask=mask,
            positions=state.positions,
            clean_latent=clean_vals,
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        out = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(1.0)))(
            params, frozen, sigmas, ctx, ctx
        )
        np.testing.assert_allclose(
            np.asarray(out.latent[:, :4]), np.asarray(clean_vals[:, :4]), atol=1e-4
        )

    def test_audio_positions_stay_fp32_under_bf16(self):
        """Audio RoPE positions are timestamps in seconds; bf16 collapses
        adjacent 0.04 s-spaced timestamps past ~8 s, so create_initial_state
        must keep them fp32 regardless of the latent dtype (like the video
        path)."""
        from ltx2_tpu.components import AudioPatchifier
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.types import AudioLatentShape

        a_shape = AudioLatentShape(batch=1, channels=2, frames=640, mel_bins=4)
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(patch_size=4), target_shape=a_shape
        )
        state = a_tools.create_initial_state(dtype=jnp.bfloat16)
        assert state.latent.dtype == jnp.bfloat16
        assert state.positions.dtype == jnp.float32
        starts = np.asarray(state.positions)[0, 0, :, 0]
        assert np.all(np.diff(starts) > 0), "timestamps must stay distinct"

    def test_av_loop(self):
        from tests.test_dit import make_audio_modality

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state, _ = make_state(cfg)
        from ltx2_tpu.components import AudioPatchifier
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.types import AudioLatentShape

        a_shape = AudioLatentShape(batch=1, channels=2, frames=4, mel_bins=4)
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(patch_size=4), target_shape=a_shape
        )
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        v_ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        a_ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.caption_channels))
        loop = make_av_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(2.0), audio_guider=CFGGuider(3.0))
        )
        v_out, a_out = loop(params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx)
        assert v_out.latent.shape == v_state.latent.shape
        assert a_out.latent.shape == a_state.latent.shape
        assert bool(jnp.all(jnp.isfinite(v_out.latent)))
        assert bool(jnp.all(jnp.isfinite(a_out.latent)))

    def test_av_heun_corrector_is_cfg_only(self):
        """Reference one_stage.py:670-695: the AV Heun corrector evaluates
        the predicted point WITHOUT a perturbed pass — STG shapes only the
        first evaluation, like the video loop (review r4: the AV corrector
        previously ran the STG row and applied its delta). Pinned against a
        hand-rolled loop calling x0_model_apply directly."""
        from ltx2_tpu.components import AudioPatchifier
        from ltx2_tpu.components.perturbations import (
            BatchedPerturbationConfig,
            create_stg_perturbation,
        )
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import x0_model_apply
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state, _ = make_state(cfg)
        a_shape = AudioLatentShape(batch=1, channels=2, frames=4, mel_bins=4)
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(patch_size=4), target_shape=a_shape
        )
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.6, 0.0])
        v_ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        a_ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.caption_channels))

        stg_scale = 0.7
        loop = make_av_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(1.0), audio_guider=CFGGuider(1.0),
                stg_scale=stg_scale, stg_blocks=(0,), sampler="heun",
                stg_mode="video",
            ),
        )
        v_out, a_out = loop(
            params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx
        )

        # Hand-rolled reference loop: no CFG, STG (video) on the FIRST
        # evaluation only, plain pos evaluation in the corrector.
        stg_pert = BatchedPerturbationConfig(perturbations=(
            create_stg_perturbation(
                skip_video_self_attn=True, blocks=[0],
                skip_audio_self_attn=False,
            ),
        ))

        def x0(vl, al, sigma, perturb):
            v_s = LatentState(
                latent=vl, denoise_mask=v_state.denoise_mask,
                positions=v_state.positions, clean_latent=v_state.clean_latent,
            )
            a_s = LatentState(
                latent=al, denoise_mask=a_state.denoise_mask,
                positions=a_state.positions, clean_latent=a_state.clean_latent,
            )
            return x0_model_apply(
                params, cfg,
                video=modality_from_state(v_s, v_ctx, sigma),
                audio=modality_from_state(a_s, a_ctx, sigma),
                perturbations=perturb,
            )

        def euler(latent, denoised, s, sn):
            vel = (latent.astype(jnp.float32) - denoised.astype(jnp.float32)) / s
            return (latent.astype(jnp.float32) + vel * (sn - s)).astype(latent.dtype)

        vl, al = v_state.latent, a_state.latent
        for i in range(sigmas.shape[0] - 1):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            pv, pa = x0(vl, al, s, None)
            qv, _qa = x0(vl, al, s, stg_pert)
            dv = pv + stg_scale * (pv - qv)
            da = pa  # stg_mode="video": the audio stream takes no delta
            dv = post_process_latent(dv, v_state.denoise_mask, v_state.clean_latent)
            da = post_process_latent(da, a_state.denoise_mask, a_state.clean_latent)
            if sn == 0:
                vl, al = dv.astype(vl.dtype), da.astype(al.dtype)
                break
            pred_v, pred_a = euler(vl, dv, s, sn), euler(al, da, s, sn)
            d2v, d2a = x0(pred_v, pred_a, sn, None)  # corrector: NO STG row
            d2v = post_process_latent(d2v, v_state.denoise_mask, v_state.clean_latent)
            d2a = post_process_latent(d2a, a_state.denoise_mask, a_state.clean_latent)

            def heun(latent, d1, pred, d2):
                w1 = (latent.astype(jnp.float32) - d1) / s
                w2 = (pred.astype(jnp.float32) - d2) / sn
                return (
                    latent.astype(jnp.float32) + 0.5 * (w1 + w2) * (sn - s)
                ).astype(latent.dtype)

            vl, al = heun(vl, dv, pred_v, d2v), heun(al, da, pred_a, d2a)

        np.testing.assert_allclose(
            np.asarray(v_out.latent), np.asarray(vl), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a_out.latent), np.asarray(al), atol=1e-5, rtol=1e-5
        )


class TestOneStageEndToEnd:
    def test_tiny_generation(self):
        """Full pipeline on tiny configs: text ctx -> denoise -> VAE decode."""
        dit_cfg = tiny_config(in_channels=8, out_channels=8)
        pipeline = OneStagePipeline(
            transformer_params=cached_params(dit_cfg),
            transformer_cfg=dit_cfg,
            video_decoder_params=tiny_decoder_params(),
            video_decoder_cfg=TINY_DECODER,
        )
        config = OneStageCFGConfig(
            height=64, width=96, num_frames=9,
            num_inference_steps=2, cfg_scale=2.0, rescale_scale=0.0,
            latent_channels=8,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        video, audio = pipeline(pos, neg, config)
        # latent 2x2x3 -> decode: T 2*2-1=3, H 2*4=8, W 3*4=12
        assert video.shape == (3, 8, 12, 3)
        assert video.dtype == np.uint8
        assert audio is None

    def test_seed_determinism(self):
        dit_cfg = tiny_config(in_channels=8, out_channels=8)
        pipeline = OneStagePipeline(
            transformer_params=cached_params(dit_cfg),
            transformer_cfg=dit_cfg,
            video_decoder_params=tiny_decoder_params(),
            video_decoder_cfg=TINY_DECODER,
        )
        config = OneStageCFGConfig(
            height=64, width=96, num_frames=9,
            num_inference_steps=2, cfg_scale=1.0, rescale_scale=0.0,
            latent_channels=8,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        v1, _ = pipeline(pos, pos, config)
        v2, _ = pipeline(pos, pos, config)
        np.testing.assert_array_equal(v1, v2)

    def test_post_hoc_upscaler_hooks(self):
        """spatial/temporal hooks apply spatial-first on UN-normalized
        latents with separate un-/re-normalize brackets (reference
        generate.py:2000-2060). Verified against a manual application on
        the identical-seed baseline latent."""
        dit_cfg = tiny_config(in_channels=8, out_channels=8)
        dec_params = tiny_decoder_params()
        pipeline = OneStagePipeline(
            transformer_params=cached_params(dit_cfg),
            transformer_cfg=dit_cfg,
            video_decoder_params=dec_params,
            video_decoder_cfg=TINY_DECODER,
        )
        config = OneStageCFGConfig(
            height=64, width=96, num_frames=9,
            num_inference_steps=2, cfg_scale=1.0, rescale_scale=0.0,
            latent_channels=8,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        base, _ = pipeline(pos, pos, config, skip_decode=True)

        calls = []

        def spatial(z):
            calls.append(("spatial", z.shape))
            return jnp.repeat(jnp.repeat(z, 2, axis=3), 2, axis=4) * 0.5

        def temporal(z):
            calls.append(("temporal", z.shape))
            return jnp.repeat(z, 2, axis=2) + 1.0

        got, _ = pipeline(
            pos, pos, config, skip_decode=True,
            spatial_upscaler=spatial, temporal_upscaler=temporal,
        )
        assert [c[0] for c in calls] == ["spatial", "temporal"]
        stats = dec_params["per_channel_statistics"]
        std = np.asarray(stats["std_of_means"]).reshape(1, -1, 1, 1, 1)
        mean = np.asarray(stats["mean_of_means"]).reshape(1, -1, 1, 1, 1)
        want = base * std + mean
        want = np.repeat(np.repeat(want, 2, axis=3), 2, axis=4) * 0.5
        want = (want - mean) / std
        want = want * std + mean
        want = np.repeat(want, 2, axis=2) + 1.0
        want = (want - mean) / std
        assert got.shape == (
            base.shape[0], base.shape[1],
            base.shape[2] * 2, base.shape[3] * 2, base.shape[4] * 2,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_skip_decode_returns_latent(self):
        dit_cfg = tiny_config(in_channels=8, out_channels=8)
        pipeline = OneStagePipeline(
            transformer_params=cached_params(dit_cfg), transformer_cfg=dit_cfg
        )
        config = OneStageCFGConfig(
            height=64, width=96, num_frames=9,
            num_inference_steps=2, cfg_scale=1.0, rescale_scale=0.0,
            latent_channels=8,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent, _ = pipeline(pos, pos, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 2, 3)

    def test_skip_decode_audio_latent_is_unpatchified_grid(self):
        """skip_decode's audio latent follows the SAME contract as the
        decode path and the staged pipelines: conditioning cleared and
        unpatchified to the (B, C, T, mel) grid the audio decoder consumes
        (review r4: it previously returned raw (B, N, C) loop tokens)."""
        dit_cfg = tiny_config(
            in_channels=8, out_channels=8, model_type=LTXModelType.AudioVideo
        )
        pipeline = OneStagePipeline(
            transformer_params=cached_params(dit_cfg), transformer_cfg=dit_cfg
        )
        config = OneStageCFGConfig(
            height=64, width=96, num_frames=9,
            num_inference_steps=2, cfg_scale=1.0, rescale_scale=0.0,
            latent_channels=8, audio_enabled=True,
            audio_vae_channels=2, audio_mel_bins=4,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        pos_a = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent, audio_latent = pipeline(
            pos, pos, config, skip_decode=True,
            positive_audio_encoding=pos_a, negative_audio_encoding=pos_a,
        )
        assert latent.shape == (1, 8, 2, 2, 3)
        assert audio_latent is not None
        assert audio_latent.ndim == 4 and audio_latent.shape[:2] == (1, 2)
        assert audio_latent.shape[-1] == 4  # mel-bin axis restored


class TestTextKVCacheLoop:
    """The denoise loop with cache_text_kv=True must match the uncached loop
    bit-for-bit in structure (same math, hoisted)."""

    def test_video_loop_matches(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape
        from tests.helpers import cached_params
        from tests.test_dit import tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0)
        state = GaussianNoiser()(jax.random.PRNGKey(0), tools.create_initial_state(), 1.0)
        sigmas = jnp.asarray([1.0, 0.6, 0.2, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        base_loop = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        cached_loop = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), cache_text_kv=True)
        )
        base = np.asarray(base_loop(params, state, sigmas, ctx, ctx).latent)
        got = np.asarray(cached_loop(params, state, sigmas, ctx, ctx).latent)
        np.testing.assert_allclose(got, base, atol=1e-5)


class TestUniformTimesteps:
    """With an all-ones denoise mask, per-batch timesteps must reproduce the
    per-token path exactly (it is the same value broadcast)."""

    def test_loop_matches_per_token(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape
        from tests.helpers import cached_params
        from tests.test_dit import tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0)
        state = GaussianNoiser()(jax.random.PRNGKey(0), tools.create_initial_state(), 1.0)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        base = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        uni = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), uniform_timesteps=True)
        )
        expected = np.asarray(base(params, state, sigmas, ctx, ctx).latent)
        got = np.asarray(uni(params, state, sigmas, ctx, ctx).latent)
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestV2DenoiseLoop:
    """The scanned denoise loop must run the V2 (LTX-2.3) architecture:
    9-param AdaLN, prompt-table KV modulation, gated attention."""

    def test_v2_loop_runs_finite(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape
        from tests.helpers import cached_params
        from tests.test_dit import tiny_config

        cfg = tiny_config(
            caption_channels=None, cross_attention_dim=32,
            cross_attention_adaln=True, apply_gated_attention=True,
        )
        params = cached_params(cfg)
        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0)
        state = GaussianNoiser()(jax.random.PRNGKey(0), tools.create_initial_state(), 1.0)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.cross_attention_dim))

        loop = make_video_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(3.0), stg_scale=1.0, cache_text_kv=True
            ),  # cache_text_kv must auto-disable for V2
        )
        out = np.asarray(loop(params, state, sigmas, ctx, ctx).latent)
        assert np.isfinite(out).all()
        assert out.shape == state.latent.shape


class TestBatchedGeneration:
    """B>1 throughput batching: a batched loop must reproduce per-sample
    B=1 runs exactly (pass-major row layout)."""

    def test_batch2_matches_two_singles(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape
        from tests.helpers import cached_params
        from tests.test_dit import tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])

        states, ctxs = [], []
        for seed in (0, 1):
            s = GaussianNoiser()(jax.random.PRNGKey(seed), tools.create_initial_state(), 1.0)
            states.append(s)
            ctxs.append(
                jax.random.normal(jax.random.PRNGKey(10 + seed), (1, 5, cfg.caption_channels))
            )

        loop = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), stg_scale=0.5)
        )
        singles = [
            np.asarray(loop(params, s, sigmas, c, c * 0.5).latent)
            for s, c in zip(states, ctxs)
        ]

        batched_state = dataclasses.replace(
            states[0],
            latent=jnp.concatenate([s.latent for s in states], axis=0),
            denoise_mask=jnp.concatenate([s.denoise_mask for s in states], axis=0),
            positions=jnp.concatenate([s.positions for s in states], axis=0),
            clean_latent=jnp.concatenate([s.clean_latent for s in states], axis=0),
        )
        pos = jnp.concatenate(ctxs, axis=0)
        out = np.asarray(loop(params, batched_state, sigmas, pos, pos * 0.5).latent)
        np.testing.assert_allclose(out[0:1], singles[0], atol=2e-4)
        np.testing.assert_allclose(out[1:2], singles[1], atol=2e-4)


class TestGenerationCheckpointing:
    """Mid-run checkpoint/resume: splitting the schedule at a save point must
    reproduce the uninterrupted run exactly (the Euler loop is Markovian in
    (latent, sigma))."""

    def test_split_run_matches(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape
        from ltx2_tpu.utils.checkpointing import (
            load_generation_state,
            save_generation_state,
        )
        from tests.helpers import cached_params
        from tests.test_dit import tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0)
        state = GaussianNoiser()(jax.random.PRNGKey(0), tools.create_initial_state(), 1.0)
        sigmas = jnp.asarray([1.0, 0.75, 0.5, 0.25, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        loop = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        full = np.asarray(loop(params, state, sigmas, ctx, ctx).latent)

        # Run 2 steps, checkpoint, reload, run the rest.
        mid = loop(params, state, sigmas[:3], ctx, ctx)
        ckpt = tmp_path / "gen.npz"
        save_generation_state(str(ckpt), mid, sigmas, step=2)
        video, audio, remaining, step = load_generation_state(str(ckpt))
        assert audio is None and step == 2
        np.testing.assert_allclose(np.asarray(remaining), np.asarray(sigmas[2:]))
        resumed = np.asarray(loop(params, video, remaining, ctx, ctx).latent)
        np.testing.assert_allclose(resumed, full, atol=1e-5)

        # Extension-less path round-trip (review r4): np.savez(path_str)
        # appends '.npz' while load opens the literal path — save writes
        # through a handle so the SAME string always works.
        bare = tmp_path / "gen_state"
        save_generation_state(str(bare), mid, sigmas, step=2)
        assert bare.exists()
        v2, _, rem2, st2 = load_generation_state(str(bare))
        assert st2 == 2
        np.testing.assert_allclose(np.asarray(rem2), np.asarray(sigmas[2:]))
        np.testing.assert_array_equal(
            np.asarray(v2.latent), np.asarray(video.latent)
        )
