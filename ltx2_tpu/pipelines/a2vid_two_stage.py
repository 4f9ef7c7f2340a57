"""Audio-to-video two-stage pipeline.

Capability parity with reference LTX_2_MLX/pipelines/a2vid_two_stage.py
(A2VidPipelineTwoStage, a2vid_two_stage.py:158-464): an input audio file
drives video generation — the audio latent is FROZEN (denoise_mask=0) while
the video stream denoises against it across the two distilled stages; the
original waveform is passed through to the output.

When an audio VAE encoder is available the waveform is mel-encoded to the
frozen latent; otherwise (as in the reference, a2vid_two_stage.py:206-224)
the audio is generated from the prompt and the source waveform is still the
output audio.

TPU note: freezing falls out of the existing AV loop for free — with
denoise_mask=0 and latent == clean_latent the Euler update is exactly zero,
so no special-case loop is needed.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import wave
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.pipelines.distilled import DistilledConfig, DistilledPipeline


@dataclass
class A2VidConfig(DistilledConfig):
    """Reference A2VidConfig surface (a2vid_two_stage.py:50-94)."""

    audio_path: str = ""
    audio_start_time: float = 0.0


def load_audio_file(
    audio_path: str,
    target_sr: int = 16000,
    start_time: float = 0.0,
    max_duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Load + resample audio -> ((channels, samples), sr)
    (a2vid_two_stage.py:96-156). soundfile if present; plain PCM .wav via
    the stdlib (no external deps); anything else via ffmpeg."""

    def _read_wave(path):
        with wave.open(path, "r") as wf:
            if wf.getsampwidth() != 2:
                # Only 16-bit PCM decodes correctly here; 8/24/32-bit wavs
                # must fall through to ffmpeg (which converts to s16) —
                # reinterpreting their bytes as int16 would silently
                # corrupt the audio.
                raise wave.Error(
                    f"{wf.getsampwidth() * 8}-bit PCM needs ffmpeg"
                )
            sr = wf.getframerate()
            n = wf.getnframes()
            raw = np.frombuffer(wf.readframes(n), dtype=np.int16)
            return (
                raw.astype(np.float32) / 32768.0
            ).reshape(-1, wf.getnchannels()), sr

    suffix = audio_path.lower().rsplit(".", 1)[-1] if "." in audio_path else ""
    pcm_out = None
    if suffix in ("avi", "mov", "mp4", "m4v"):
        # Pull the PCM track straight out of the container (e.g. this
        # framework's own no-ffmpeg outputs) — drive a2vid from a previous
        # clip's audio. A compressed track (AAC mp4, ...) returns None and
        # falls through to soundfile/ffmpeg below.
        from ltx2_tpu.utils.video_io import read_avi_audio, read_mov_audio

        reader = read_avi_audio if suffix == "avi" else read_mov_audio
        pcm_out = reader(audio_path)
        if pcm_out is None and suffix == "avi":
            raise ValueError(f"{audio_path}: no PCM audio stream")
    if pcm_out is not None:
        pcm, sr = pcm_out
        data = pcm.T  # (N, C) like the other readers below
    else:
        try:
            import soundfile as sf

            data, sr = sf.read(audio_path)
        except Exception:
            # Not just ImportError: an INSTALLED soundfile whose libsndfile
            # can't decode this file (old build without mp3, corrupt
            # container) raises sf.LibsndfileError/RuntimeError — the
            # documented fallback chain must still reach wave/ffmpeg
            # (review r4).
            try:
                data, sr = _read_wave(audio_path)
            except (wave.Error, EOFError):
                # delete=False so ffmpeg can reopen the path; unlink
                # ourselves or a long-running serving process leaks one
                # multi-MB WAV per non-wav request until /tmp fills.
                with tempfile.NamedTemporaryFile(
                    suffix=".wav", delete=False
                ) as tmp:
                    pass
                try:
                    cmd = [
                        "ffmpeg", "-v", "quiet", "-i", audio_path,
                        "-ar", str(target_sr), "-ac", "2", "-y", tmp.name,
                    ]
                    subprocess.run(cmd, check=True)
                    data, sr = _read_wave(tmp.name)
                finally:
                    os.unlink(tmp.name)

    if data.ndim == 1:
        data = data[:, np.newaxis]
    if data.shape[0] > data.shape[1]:
        data = data.T

    start_sample = int(start_time * sr)
    data = data[:, start_sample:]
    if max_duration is not None:
        data = data[:, : int(max_duration * sr)]

    if sr != target_sr:
        num_output = int(data.shape[1] * target_sr / sr)
        indices = np.linspace(0, data.shape[1] - 1, num_output).astype(int)
        data = data[:, indices]
        sr = target_sr
    return data.astype(np.float32), sr


class A2VidPipelineTwoStage(DistilledPipeline):
    """Distilled two-stage with a source-audio-driven audio branch."""

    def __init__(self, *args, audio_encoder_params=None, audio_encoder_cfg=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.audio_encoder_params = audio_encoder_params
        self.audio_encoder_cfg = audio_encoder_cfg

    def _encode_audio_to_latent(self, waveform: np.ndarray, sr: int, config: A2VidConfig):
        """Waveform -> frozen audio latent via the audio VAE encoder.

        BEYOND the reference: its `_encode_audio_to_latent` prints "Audio
        VAE encoder not yet ported" and always returns None
        (a2vid_two_stage.py:206-224), so its a2vid freezes NOISE. Here the
        full direction is wired — programmatic 64-mel analysis
        (audio_vae/analysis.py) -> audio_encoder_apply -> normalized
        latent at the duration-matched frame count. None when no encoder
        weights are resident (then the noise-freeze fallback applies,
        exactly the reference behavior)."""
        if self.audio_encoder_params is None:
            return None
        from ltx2_tpu.models.audio_vae.analysis import (
            AudioAnalysisConfig,
            waveform_to_latent,
        )
        from ltx2_tpu.types import AudioLatentShape, VideoPixelShape

        shape = AudioLatentShape.from_video_pixel_shape(
            VideoPixelShape(
                batch=1, frames=config.num_frames, height=config.height,
                width=config.width, fps=config.fps,
            ),
            channels=config.audio_vae_channels,
            mel_bins=config.audio_mel_bins,
            sample_rate=config.audio_sample_rate,
            hop_length=config.audio_hop_length,
            audio_latent_downsample_factor=config.audio_downsample_factor,
        )
        analysis = AudioAnalysisConfig(
            sample_rate=sr, hop_length=config.audio_hop_length,
            n_mels=config.audio_mel_bins * config.audio_downsample_factor,
        )
        return waveform_to_latent(
            waveform, self.audio_encoder_params, self.audio_encoder_cfg,
            analysis, shape.frames,
        )

    def __call__(  # type: ignore[override]
        self,
        text_encoding: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        config: A2VidConfig,
        images=None,
        callback: Optional[Callable[[str, int, int], None]] = None,
        audio_encoding: Optional[jnp.ndarray] = None,
        source_waveform: Optional[np.ndarray] = None,
        skip_decode: bool = False,
    ):
        """source_waveform: optional pre-loaded (channels, samples) array
        (bypasses file IO; used by tests)."""
        duration = config.num_frames / config.fps
        if source_waveform is None and config.audio_path:
            source_waveform, _sr = load_audio_file(
                config.audio_path,
                target_sr=config.audio_sample_rate,
                start_time=config.audio_start_time,
                max_duration=duration,
            )

        # Frozen-audio semantics (reference _video_only_denoise_loop): the
        # audio latent — encoded from the source waveform when encoder
        # weights are resident, otherwise the noised init — stays frozen
        # (denoise_mask=0) through BOTH stages while the video denoises
        # against it via the AV cross-modal attention.
        initial_audio_latent = None
        if source_waveform is not None:
            initial_audio_latent = self._encode_audio_to_latent(
                source_waveform, config.audio_sample_rate, config
            )
        result = super().__call__(
            text_encoding, text_mask, config,
            images=images, callback=callback,
            audio_encoding=audio_encoding, skip_decode=skip_decode,
            freeze_audio=True, initial_audio_latent=initial_audio_latent,
        )

        # Pass the ORIGINAL waveform through as the output audio, WITH its
        # sample rate — reference parity (a2vid_two_stage.py:298,464
        # returns (video, waveform, audio_sr)): the passthrough is at
        # config.audio_sample_rate (16 kHz), not the vocoder's output
        # rate; muxing it at the vocoder rate plays it 1.5-3x too fast.
        # rate=None means "vocoder output rate" (generated-audio branch).
        if config.audio_enabled:
            video, _generated_audio = result
            if source_waveform is not None:
                return (video, jnp.asarray(source_waveform)[None],
                        int(config.audio_sample_rate))
            return video, _generated_audio, None
        return result


def create_a2vid_pipeline(**kwargs) -> A2VidPipelineTwoStage:
    return A2VidPipelineTwoStage(**kwargs)
