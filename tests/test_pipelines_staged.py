"""Tests for distilled / two-stage / text-to-video pipelines on tiny configs."""

import jax
import numpy as np
import pytest

from ltx2_tpu.loader import LoRAConfig, write_safetensors
from ltx2_tpu.models.transformer.model import LTXModelType
from ltx2_tpu.models.upscaler import SpatialUpscalerConfig, init_spatial_upscaler
from ltx2_tpu.pipelines.denoise import MultiModalLoopConfig
from ltx2_tpu.pipelines.distilled import (
    DistilledConfig,
    DistilledPipeline,
    channelwise_normalize_audio,
)
from ltx2_tpu.pipelines.text_to_video import TextToVideoConfig, TextToVideoPipeline
from ltx2_tpu.pipelines.two_stage import TwoStageCFGConfig, TwoStagePipeline
from tests.helpers import cached_params
from tests.test_dit import tiny_config
from tests.test_video_vae import TINY_DECODER, tiny_decoder_params

TINY_UPSCALER = SpatialUpscalerConfig(
    in_channels=8, mid_channels=16, num_blocks_per_stage=1, num_groups=4
)


def tiny_upscaler_params():
    return jax.jit(lambda k: init_spatial_upscaler(k, TINY_UPSCALER))(
        jax.random.PRNGKey(3)
    )


def make_pipeline(cls, model_type=LTXModelType.VideoOnly, with_upscaler=True):
    dit_cfg = tiny_config(in_channels=8, out_channels=8, model_type=model_type)
    kwargs = dict(
        transformer_params=cached_params(dit_cfg),
        transformer_cfg=dit_cfg,
        video_decoder_params=tiny_decoder_params(),
        video_decoder_cfg=TINY_DECODER,
    )
    if with_upscaler:
        kwargs.update(
            spatial_upscaler_params=tiny_upscaler_params(),
            spatial_upscaler_cfg=TINY_UPSCALER,
        )
    return cls(**kwargs), dit_cfg


class TestConfigs:
    def test_distilled_validation(self):
        with pytest.raises(ValueError, match="divisible by 64"):
            DistilledConfig(height=96, width=64, num_frames=9)
        with pytest.raises(ValueError, match="num_frames"):
            DistilledConfig(height=64, width=64, num_frames=8)

    def test_two_stage_validation(self):
        with pytest.raises(ValueError, match="divisible by 64"):
            TwoStageCFGConfig(height=96, width=64, num_frames=9)

    def test_mm_rows(self):
        mm = MultiModalLoopConfig(video_cfg_scale=3.0, modality_scale=3.0)
        assert mm.rows == 3  # cond + uncond + mod
        mm2 = MultiModalLoopConfig(
            video_cfg_scale=1.0, audio_cfg_scale=1.0, modality_scale=1.0
        )
        assert mm2.rows == 1

    def test_channelwise_normalize(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8)) * 7 + 3
        out = np.asarray(channelwise_normalize_audio(x))
        np.testing.assert_allclose(out.std(axis=1), 1.0, atol=1e-3)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-3)


class TestDistilled:
    def test_video_only_two_stages(self):
        pipeline, dit_cfg = make_pipeline(DistilledPipeline)
        config = DistilledConfig(
            height=64, width=64, num_frames=9, latent_channels=8
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(pos, None, config, skip_decode=True)
        # Stage 1: 32x32 pixels -> latent 1x1? No: latent = 64/2/32 = 1.
        # latent channels 8, frames (9-1)/8+1=2, spatial 1x1 -> upscaled 2x2.
        assert latent.shape == (1, 8, 2, 2, 2)

    def test_no_upscaler_stays_half_res(self):
        pipeline, dit_cfg = make_pipeline(DistilledPipeline, with_upscaler=False)
        config = DistilledConfig(height=64, width=64, num_frames=9, latent_channels=8)
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(pos, None, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 1, 1)

    def test_av_distilled(self):
        pipeline, dit_cfg = make_pipeline(
            DistilledPipeline, model_type=LTXModelType.AudioVideo
        )
        config = DistilledConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            audio_enabled=True, audio_vae_channels=2, audio_mel_bins=4,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent, audio_latent = pipeline(pos, None, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 2, 2)
        assert audio_latent is not None
        assert audio_latent.shape[1] == 2  # audio channels


class TestTwoStage:
    def test_video_only(self):
        pipeline, dit_cfg = make_pipeline(TwoStagePipeline)
        config = TwoStageCFGConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=2, cfg_scale=2.0,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent, audio = pipeline(pos, neg, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 2, 2)
        assert audio is None

    def test_av_multimodal_guider(self):
        pipeline, dit_cfg = make_pipeline(
            TwoStagePipeline, model_type=LTXModelType.AudioVideo
        )
        config = TwoStageCFGConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=2, cfg_scale=2.0, modality_scale=2.0,
            audio_vae_channels=2, audio_mel_bins=4,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent, audio_latent = pipeline(
            pos, neg, config,
            positive_audio_encoding=pos, negative_audio_encoding=neg,
            skip_decode=True,
        )
        assert latent.shape == (1, 8, 2, 2, 2)
        assert audio_latent is not None

    def test_lora_fuse_restore(self, tmp_path):
        """Weights must be restored after stage 2 (two_stage.py:778-782)."""
        pipeline, dit_cfg = make_pipeline(TwoStagePipeline)
        base = np.asarray(
            pipeline.transformer_params["transformer_blocks"]["attn1"]["to_q"]["weight"]
        ).copy()

        rng = np.random.default_rng(0)
        a = rng.normal(size=(2, dit_cfg.video_inner_dim)).astype(np.float32)
        b = rng.normal(size=(dit_cfg.video_inner_dim, 2)).astype(np.float32)
        lora_path = str(tmp_path / "lora.safetensors")
        write_safetensors(
            lora_path,
            {
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight": a,
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight": b,
            },
        )
        config = TwoStageCFGConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=2, cfg_scale=2.0,
            distilled_lora_config=LoRAConfig(path=lora_path, strength=1.0),
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        pipeline(pos, neg, config, skip_decode=True)
        restored = np.asarray(
            pipeline.transformer_params["transformer_blocks"]["attn1"]["to_q"]["weight"]
        )
        np.testing.assert_allclose(restored, base, atol=1e-5)


class TestTwoStageGuidanceRescale:
    def test_video_only_rescale_engaged(self):
        """guidance_rescale must apply in the VIDEO-ONLY stage-1 CFG loop
        too (reference two_stage.py:288-290 rescale_noise_cfg) — it was
        previously consumed only by the AV MultiModalGuider path."""
        pipeline, dit_cfg = make_pipeline(TwoStagePipeline, with_upscaler=False)
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))

        def run(rescale):
            config = TwoStageCFGConfig(
                height=64, width=64, num_frames=9, latent_channels=8,
                num_inference_steps=2, cfg_scale=3.0,
                guidance_rescale=rescale,
            )
            latent, _ = pipeline(pos, neg, config, skip_decode=True)
            return np.asarray(latent)

        assert not np.allclose(run(0.0), run(0.7)), (
            "guidance_rescale had no effect on the video-only stage 1"
        )


class TestMultiModalBatchedClips:
    def test_mm_loop_batch2_matches_per_sample(self):
        """The AV multimodal loop's row split must be batch-aware: a B=2
        run equals the two B=1 runs (previously _mm_split hard-coded
        outs[0:1]/outs[idx:idx+1], silently misassigning guidance rows)."""
        import jax.numpy as jnp

        from ltx2_tpu.components import (
            AudioPatchifier,
            GaussianNoiser,
            VideoLatentPatchifier,
        )
        from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import make_multimodal_av_denoise_loop
        from ltx2_tpu.types import AudioLatentShape, LatentState, VideoLatentShape
        from tests.test_dit import tiny_config

        cfg = tiny_config(
            in_channels=8, out_channels=8, model_type=LTXModelType.AudioVideo
        )
        params = cached_params(cfg)
        noiser = GaussianNoiser()

        v_shape = VideoLatentShape(batch=2, channels=8, frames=2, height=2, width=3)
        v_tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=v_shape, fps=24.0
        )
        v_state = noiser(jax.random.PRNGKey(0), v_tools.create_initial_state(), 1.0)
        a_shape = AudioLatentShape(
            batch=2, channels=cfg.audio_in_channels, frames=5, mel_bins=1
        )
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(1), target_shape=a_shape
        )
        a_state = noiser(jax.random.PRNGKey(1), a_tools.create_initial_state(), 1.0)

        k = jax.random.PRNGKey(7)
        pos_v, neg_v, pos_a, neg_a = (
            jax.random.normal(kk, (2, 5, cfg.caption_channels))
            for kk in jax.random.split(k, 4)
        )
        sigmas = jnp.asarray([1.0, 0.6, 0.2], jnp.float32)

        mm = MultiModalLoopConfig(
            video_cfg_scale=3.0, audio_cfg_scale=5.0, stg_scale=1.0,
            stg_blocks=None, rescale_scale=0.7, modality_scale=2.0,
        )
        loop = make_multimodal_av_denoise_loop(cfg, mm)
        gv, ga = loop(
            params, v_state, a_state, sigmas, pos_v, neg_v, pos_a, neg_a
        )

        def sl(state, i):
            return LatentState(
                latent=state.latent[i : i + 1],
                denoise_mask=state.denoise_mask[i : i + 1],
                positions=state.positions[i : i + 1],
                clean_latent=state.clean_latent[i : i + 1],
            )

        for i in range(2):
            gv1, ga1 = loop(
                params, sl(v_state, i), sl(a_state, i), sigmas,
                pos_v[i : i + 1], neg_v[i : i + 1],
                pos_a[i : i + 1], neg_a[i : i + 1],
            )
            np.testing.assert_allclose(
                np.asarray(gv.latent[i : i + 1]), np.asarray(gv1.latent),
                atol=2e-4,
            )
            np.testing.assert_allclose(
                np.asarray(ga.latent[i : i + 1]), np.asarray(ga1.latent),
                atol=2e-4,
            )


class TestTextToVideo:
    def test_generation(self):
        pipeline, dit_cfg = make_pipeline(TextToVideoPipeline, with_upscaler=False)
        config = TextToVideoConfig(
            height=64, width=96, num_frames=9, num_inference_steps=2,
            cfg_scale=3.0, latent_channels=8,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        video, audio = pipeline(pos, neg, config)
        assert video.dtype == np.uint8
        assert audio is None


class TestDistilledSequenceParallel:
    """Staged pipeline with a sequence mesh: stage-1 SP loop output must be
    consolidated before the upscaler convs (consolidate_latent) and the
    whole two-stage run must match the single-device result."""

    def test_matches_unsharded(self):
        from ltx2_tpu.parallel.mesh import create_mesh

        pipeline, dit_cfg = make_pipeline(DistilledPipeline)
        config = DistilledConfig(
            height=128, width=192, num_frames=9, latent_channels=8
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        expected = pipeline(pos, None, config, skip_decode=True)

        sp_pipeline, _ = make_pipeline(DistilledPipeline)
        sp_pipeline.sequence_mesh = create_mesh(
            data=1, model=1, seq=2, devices=jax.devices()[:2]
        )
        got = sp_pipeline(pos, None, config, skip_decode=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=5e-4
        )
