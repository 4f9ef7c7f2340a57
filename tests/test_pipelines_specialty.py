"""Tests for keyframe, retake, ti2vid_hq, a2vid, ic_lora pipelines."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import GaussianNoiser, VideoLatentPatchifier
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.models.transformer.model import LTXModelType
from ltx2_tpu.pipelines import (
    A2VidConfig,
    A2VidPipelineTwoStage,
    ICLoraConfig,
    ICLoraPipeline,
    Keyframe,
    KeyframeInterpolationConfig,
    KeyframeInterpolationPipeline,
    RetakeConfig,
    RetakePipeline,
    TemporalRegionMask,
    TI2VidHQConfig,
    TI2VidHQPipeline,
)
from ltx2_tpu.types import VideoLatentShape
from tests.helpers import cached_params
from tests.test_dit import tiny_config
from tests.test_pipelines_staged import TINY_UPSCALER, tiny_upscaler_params
from tests.test_video_vae import TINY_DECODER, TINY_ENCODER, tiny_decoder_params


def make_pipeline(cls, model_type=LTXModelType.VideoOnly, with_encoder=False, **extra):
    from ltx2_tpu.models.video_vae import init_video_encoder

    dit_cfg = tiny_config(in_channels=8, out_channels=8, model_type=model_type)
    kwargs = dict(
        transformer_params=cached_params(dit_cfg),
        transformer_cfg=dit_cfg,
        video_decoder_params=tiny_decoder_params(),
        video_decoder_cfg=TINY_DECODER,
    )
    if cls is not RetakePipeline:  # retake has no upscaling stage
        kwargs.update(
            spatial_upscaler_params=tiny_upscaler_params(),
            spatial_upscaler_cfg=TINY_UPSCALER,
        )
    if with_encoder:
        enc_params = jax.jit(lambda k: init_video_encoder(k, TINY_ENCODER))(
            jax.random.PRNGKey(5)
        )
        kwargs.update(video_encoder_params=enc_params, video_encoder_cfg=TINY_ENCODER)
    kwargs.update(extra)
    return cls(**kwargs), dit_cfg


class TestTemporalRegionMask:
    def test_mask_region(self):
        shape = VideoLatentShape(batch=1, channels=8, frames=4, height=2, width=2)
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = tools.create_initial_state()
        # 24 fps, 8x temporal: times [0.5, 1.0)s -> pixel frames 12..24 ->
        # latent frames 1..3.
        masked = TemporalRegionMask(0.5, 1.0, 24.0).apply_to(state, tools)
        mask = np.asarray(masked.denoise_mask).reshape(4, 4)
        assert mask[0].sum() == 0  # frame 0 untouched
        assert mask[1].sum() == 4 and mask[2].sum() == 4  # frames 1-2 regenerate
        assert mask[3].sum() == 0

    def test_invalid_times(self):
        with pytest.raises(ValueError):
            RetakeConfig(start_time=2.0, end_time=1.0)


class TestRetake:
    def test_masked_regeneration_preserves_outside(self):
        pipeline, dit_cfg = make_pipeline(RetakePipeline, with_encoder=True)
        config = RetakeConfig(
            start_time=0.4, end_time=0.8, num_inference_steps=2,
            cfg_scale=1.0, latent_channels=8,
        )
        # Source video sized for the tiny encoder: (1, 3, 9, 32, 32)
        # -> latent (1, 8, 5, 4, 4) with the TINY_ENCODER plan.
        source = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 9, 16, 16)) * 0.1
        pos = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(
            "", pos, pos, config, source_video=source, fps=24.0, skip_decode=True
        )
        assert latent.shape == (1, 8, 5, 4, 4)  # 16px / (2 patch * 2 down) = 4
        assert np.isfinite(latent).all()


class TestKeyframe:
    def test_keyframe_conditioning_appends(self, tmp_path):
        from PIL import Image

        img_path = str(tmp_path / "kf.png")
        Image.fromarray(
            (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(img_path)

        pipeline, dit_cfg = make_pipeline(
            KeyframeInterpolationPipeline, with_encoder=True
        )
        config = KeyframeInterpolationConfig(
            height=64, width=64, num_frames=9, latent_channels=8
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(
            pos, None, config,
            keyframes=[Keyframe(image_path=img_path, frame_index=0)],
            skip_decode=True,
        )
        assert latent.shape == (1, 8, 2, 2, 2)
        assert np.isfinite(latent).all()


class TestTI2VidHQ:
    def test_res2s_two_stage(self):
        pipeline, dit_cfg = make_pipeline(TI2VidHQPipeline)
        config = TI2VidHQConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=3, cfg_scale=2.0,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(pos, neg, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 2, 2)
        assert np.isfinite(latent).all()

    def test_res2s_av(self):
        pipeline, dit_cfg = make_pipeline(
            TI2VidHQPipeline, model_type=LTXModelType.AudioVideo
        )
        config = TI2VidHQConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=3, cfg_scale=2.0, audio_enabled=True,
            audio_vae_channels=2, audio_mel_bins=4,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        latent, audio = pipeline(pos, neg, config, skip_decode=True)
        assert latent.shape == (1, 8, 2, 2, 2)
        assert audio is not None


class TestTI2VidHQReviewFixes:
    def test_stage1_applies_image_conditioning(self, tmp_path):
        """Image conditionings must shape STAGE 1 (reference
        ti2vid_hq.py:387-392) — previously images were first consumed in
        stage 2, so i2v silently degraded to weak tail-only conditioning.
        No upscaler => the returned latent IS the stage-1 latent."""
        from PIL import Image

        from ltx2_tpu.pipelines import ImageCondition

        img_path = str(tmp_path / "cond.png")
        Image.fromarray(
            (np.random.default_rng(3).random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(img_path)

        pipeline, dit_cfg = make_pipeline(
            TI2VidHQPipeline, spatial_upscaler_params=None
        )
        # Stub the VAE encode with a stage-1-grid latent (the tiny test
        # encoder's stride does not match the real 32x pixel->latent grid).
        pipeline._encode_image = lambda img: jnp.full((1, 8, 1, 1, 1), 3.0)
        config = TI2VidHQConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            num_inference_steps=2, cfg_scale=2.0,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))
        plain = pipeline(pos, neg, config, skip_decode=True)
        conditioned = pipeline(
            pos, neg, config, skip_decode=True,
            images=[ImageCondition(image_path=img_path, frame_index=0)],
        )
        assert plain.shape == conditioned.shape
        assert not np.allclose(np.asarray(plain), np.asarray(conditioned)), (
            "stage-1 output ignored the conditioning image"
        )

    def test_audio_cfg_engages_without_video_cfg(self):
        """cfg_scale=1.0 with audio_cfg_scale>1 must still run the uncond
        row (reference ti2vid_hq.py:299 gates on EITHER scale) — previously
        audio CFG silently became 1.0 whenever video CFG was off."""
        pipeline, dit_cfg = make_pipeline(
            TI2VidHQPipeline, model_type=LTXModelType.AudioVideo,
            spatial_upscaler_params=None,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(1), (1, 5, dit_cfg.caption_channels))

        def run(audio_scale):
            config = TI2VidHQConfig(
                height=64, width=64, num_frames=9, latent_channels=8,
                num_inference_steps=2, cfg_scale=1.0,
                audio_cfg_scale=audio_scale, audio_enabled=True,
                audio_vae_channels=2, audio_mel_bins=4,
            )
            return pipeline(pos, neg, config, skip_decode=True)

        _, audio_off = run(1.0)
        _, audio_on = run(7.0)
        assert not np.allclose(np.asarray(audio_off), np.asarray(audio_on)), (
            "audio_cfg_scale had no effect at cfg_scale=1.0"
        )


class TestKeyframePixelFrameIndex:
    def test_frame_index_stays_in_pixel_frames(self, tmp_path):
        """The reference passes Keyframe.frame_index RAW into the position
        offset ((pixel_coords + frame_idx) / fps); a pixel->latent
        conversion here would place every keyframe at 1/8th the intended
        time."""
        from PIL import Image

        from ltx2_tpu.pipelines.keyframe_interpolation import (
            create_keyframe_conditionings,
        )

        img_path = str(tmp_path / "kf.png")
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
        conds = create_keyframe_conditionings(
            [Keyframe(image_path=img_path, frame_index=48, strength=0.9)],
            lambda x: jnp.zeros((1, 8, 1, 1, 1), x.dtype), 32, 32, 24.0,
        )
        assert conds[0].frame_idx == 48


class TestRetakeMetadataFallback:
    def _probe_with(self, monkeypatch, payload):
        import subprocess as sp

        from ltx2_tpu.pipelines import retake as retake_mod
        from ltx2_tpu.utils import video_io

        def fake_run(cmd, **kwargs):
            class R:
                stdout = payload
            return R()

        monkeypatch.setattr(retake_mod.subprocess, "run", fake_run)
        # Force the ffprobe branch: with OpenCV present the probe would be
        # served by cv2 and never reach the JSON fallback under test.
        monkeypatch.setattr(video_io, "_cv2_or_none", lambda: None)
        return retake_mod.get_video_metadata("clip.mkv")

    def test_nb_frames_na_falls_back_to_duration(self, monkeypatch):
        """MKV/WebM report nb_frames as 'N/A': duration * fps stands in
        (reference retake.py:88-91) — returning 0 snapped to n_frames=-7
        and fed ffmpeg `-frames:v -7`."""
        payload = (
            '{"streams": [{"codec_type": "video", "width": 64, "height": 32,'
            ' "r_frame_rate": "24/1", "nb_frames": "N/A"}],'
            ' "format": {"duration": "2.0"}}'
        )
        fps, n, h, w = self._probe_with(monkeypatch, payload)
        assert (fps, n, h, w) == (24.0, 48, 32, 64)

    def test_no_frames_and_no_duration_raises(self, monkeypatch):
        payload = (
            '{"streams": [{"codec_type": "video", "width": 64, "height": 32,'
            ' "r_frame_rate": "24/1"}], "format": {}}'
        )
        with pytest.raises(ValueError, match="frame count"):
            self._probe_with(monkeypatch, payload)


class TestA2VidTempFileCleanup:
    def test_ffmpeg_fallback_does_not_leak(self, tmp_path):
        """The ffmpeg-conversion fallback must unlink its temp WAV even on
        failure — a long-running server otherwise leaks one per request."""
        import glob
        import tempfile

        from ltx2_tpu.pipelines.a2vid_two_stage import load_audio_file

        bogus = tmp_path / "clip.mp3"
        bogus.write_bytes(b"\x00" * 64)
        before = set(glob.glob(str(Path(tempfile.gettempdir()) / "*.wav")))
        with pytest.raises(Exception):
            load_audio_file(str(bogus), target_sr=16000)
        after = set(glob.glob(str(Path(tempfile.gettempdir()) / "*.wav")))
        assert after == before, f"leaked temp wavs: {after - before}"

    def test_soundfile_decode_failure_falls_back_to_wave(self, tmp_path, monkeypatch):
        """An INSTALLED soundfile whose libsndfile can't decode the file
        (RuntimeError, not ImportError) must still reach the stdlib wave
        fallback for plain PCM wavs (review r4)."""
        import sys
        import types
        import wave as wave_mod

        from ltx2_tpu.pipelines import a2vid_two_stage

        path = tmp_path / "tone.wav"
        sr, n = 16000, 1600
        pcm = (np.sin(np.linspace(0, 40 * np.pi, n)) * 20000).astype(np.int16)
        with wave_mod.open(str(path), "w") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(pcm.tobytes())

        broken = types.ModuleType("soundfile")
        broken.read = lambda *a, **kw: (_ for _ in ()).throw(
            RuntimeError("libsndfile: unsupported format")
        )
        monkeypatch.setitem(sys.modules, "soundfile", broken)
        data, got_sr = a2vid_two_stage.load_audio_file(str(path), target_sr=sr)
        assert got_sr == sr
        assert data.shape[0] == 1 and data.shape[1] == n
        np.testing.assert_allclose(data[0], pcm.astype(np.float32) / 32768.0,
                                   atol=1e-6)


class TestA2Vid:
    def test_waveform_passthrough(self):
        pipeline, dit_cfg = make_pipeline(
            A2VidPipelineTwoStage, model_type=LTXModelType.AudioVideo
        )
        config = A2VidConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            audio_enabled=True, audio_vae_channels=2, audio_mel_bins=4,
        )
        waveform = np.random.default_rng(0).normal(size=(2, 1600)).astype(np.float32)
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent, audio, sr = pipeline(
            pos, None, config, source_waveform=waveform, skip_decode=True
        )
        assert latent.shape == (1, 8, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(audio)[0], waveform)
        # The passthrough must carry its TRUE rate (reference 3-tuple,
        # a2vid_two_stage.py:464): muxing 16 kHz source audio at the
        # vocoder's 24/48 kHz played it 1.5-3x too fast (review r4).
        assert sr == config.audio_sample_rate


class TestA2VidFrozenEncode:
    """Round-3 a2vid semantics: the audio latent — ENCODED from the source
    waveform via the wired audio VAE encoder (the reference's own encoder
    was never ported), or the noised init as fallback — stays bit-frozen
    through BOTH distilled stages while the video denoises against it."""

    def _audio_encoder(self):
        from ltx2_tpu.models.audio_vae.encoder import (
            AudioEncoderConfig,
            init_audio_encoder,
        )

        cfg = AudioEncoderConfig(ch=4, num_res_blocks=1, z_channels=2, mel_bins=4)
        params = jax.jit(lambda k: init_audio_encoder(k, cfg))(jax.random.PRNGKey(9))
        return params, cfg

    def test_encode_shape_chain(self):
        """waveform -> 16-mel analysis -> encoder -> (1, z, L, mel_bins)
        at the duration-matched latent frame count."""
        enc_params, enc_cfg = self._audio_encoder()
        pipeline, _ = make_pipeline(
            A2VidPipelineTwoStage, model_type=LTXModelType.AudioVideo,
            audio_encoder_params=enc_params, audio_encoder_cfg=enc_cfg,
        )
        config = A2VidConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            audio_enabled=True, audio_vae_channels=2, audio_mel_bins=4,
        )
        waveform = np.random.default_rng(1).normal(size=(2, 6000)).astype(np.float32)
        latent = pipeline._encode_audio_to_latent(
            waveform, config.audio_sample_rate, config
        )
        from ltx2_tpu.types import AudioLatentShape, VideoPixelShape

        shape = AudioLatentShape.from_video_pixel_shape(
            VideoPixelShape(batch=1, frames=9, height=64, width=64, fps=config.fps),
            channels=2, mel_bins=4,
            sample_rate=config.audio_sample_rate,
            hop_length=config.audio_hop_length,
            audio_latent_downsample_factor=config.audio_downsample_factor,
        )
        assert latent.shape == (1, 2, shape.frames, 4), latent.shape
        assert bool(jnp.all(jnp.isfinite(latent)))

    def test_encoded_latent_bit_frozen_through_both_stages(self):
        """DistilledPipeline with freeze_audio + an initial audio latent:
        the returned final audio latent is EXACTLY the input (velocity 0
        through every step of both stages)."""
        from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline

        pipeline, dit_cfg = make_pipeline(
            DistilledPipeline, model_type=LTXModelType.AudioVideo
        )
        config = DistilledConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            audio_enabled=True, audio_vae_channels=2, audio_mel_bins=4,
        )
        from ltx2_tpu.types import AudioLatentShape, VideoPixelShape

        shape = AudioLatentShape.from_video_pixel_shape(
            VideoPixelShape(batch=1, frames=9, height=64, width=64, fps=config.fps),
            channels=2, mel_bins=4,
            sample_rate=config.audio_sample_rate,
            hop_length=config.audio_hop_length,
            audio_latent_downsample_factor=config.audio_downsample_factor,
        )
        encoded = jax.random.normal(
            jax.random.PRNGKey(3), (1, 2, shape.frames, 4), jnp.float32
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent, final_audio = pipeline(
            pos, None, config, skip_decode=True,
            freeze_audio=True, initial_audio_latent=encoded,
        )
        assert latent.shape == (1, 8, 2, 2, 2)
        np.testing.assert_array_equal(
            np.asarray(final_audio), np.asarray(encoded),
            err_msg="frozen audio latent drifted through the two stages",
        )

    def test_fallback_freezes_noise(self):
        """No encoder weights: a2vid still freezes the (noised) audio init
        — the reference _video_only_denoise_loop behavior — and passes the
        source waveform through."""
        pipeline, dit_cfg = make_pipeline(
            A2VidPipelineTwoStage, model_type=LTXModelType.AudioVideo
        )
        assert pipeline.audio_encoder_params is None
        config = A2VidConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            audio_enabled=True, audio_vae_channels=2, audio_mel_bins=4,
        )
        waveform = np.random.default_rng(0).normal(size=(2, 1600)).astype(np.float32)
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent, audio, sr = pipeline(
            pos, None, config, source_waveform=waveform, skip_decode=True
        )
        assert bool(jnp.all(jnp.isfinite(latent)))
        np.testing.assert_allclose(np.asarray(audio)[0], waveform)
        assert sr == config.audio_sample_rate


class TestICLora:
    def test_control_conditioning_stage1_only(self, tmp_path):
        from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
        from ltx2_tpu.loader import LoRAConfig, write_safetensors

        pipeline, dit_cfg = make_pipeline(ICLoraPipeline, with_encoder=True)
        base = np.asarray(
            pipeline.transformer_params["transformer_blocks"]["attn1"]["to_q"]["weight"]
        ).copy()

        rng = np.random.default_rng(0)
        a = rng.normal(size=(2, dit_cfg.video_inner_dim)).astype(np.float32)
        b = rng.normal(size=(dit_cfg.video_inner_dim, 2)).astype(np.float32)
        lora_path = str(tmp_path / "ic_lora.safetensors")
        write_safetensors(
            lora_path,
            {
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight": a,
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight": b,
            },
        )
        # Pre-built control conditioning: a half-res latent appended at frame 0.
        control_latent = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1, 1, 1))
        cond = VideoConditionByKeyframeIndex(
            keyframes=control_latent, frame_idx=0, strength=0.9
        )

        config = ICLoraConfig(
            height=64, width=64, num_frames=9, latent_channels=8,
            ic_lora_config=LoRAConfig(path=lora_path, strength=1.0),
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (1, 5, dit_cfg.caption_channels))
        latent = pipeline(
            pos, None, config, control_conditionings=[cond], skip_decode=True
        )
        assert latent.shape == (1, 8, 2, 2, 2)
        # Weights restored after the run.
        restored = np.asarray(
            pipeline.transformer_params["transformer_blocks"]["attn1"]["to_q"]["weight"]
        )
        np.testing.assert_allclose(restored, base, atol=1e-5)
