"""Waveform -> log-mel analysis for the audio VAE ENCODER (a2vid).

The reference never shipped this direction: its `_encode_audio_to_latent`
prints "Audio VAE encoder not yet ported" and returns None
(reference a2vid_two_stage.py:206-224), so audio-to-video always froze a
NOISE latent. This module closes that TODO: a programmatically built
STFT/mel analysis (the checkpoint stores bases only for the vocoder's
128-mel BWE re-analysis, not the VAE's 64-mel space) feeding the existing
`stft_magnitude_phase` conv1d machinery, then `audio_encoder_apply`.

Basis conventions match the checkpoint's forward_basis (validated by the
torch.stft oracle in tests/test_torch_oracle_audio.py): rows = [real DFT;
imag DFT] x hann window; mel filterbank is the standard HTK-free
(slaney-style) triangle bank used by the LTX audio stack.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.models.audio_vae.vocoder import (
    MelSTFTConfig,
    make_stft_basis,
    mel_spectrogram,
)


@dataclass(frozen=True)
class AudioAnalysisConfig:
    """Analysis parameters for the VAE's 64-mel stereo spectrogram space
    (decoder output is (B, 2, T, 64); this is its inverse direction)."""

    sample_rate: int = 16000
    filter_length: int = 1024
    win_length: int = 1024
    hop_length: int = 160
    n_mels: int = 64

    def mel_cfg(self) -> MelSTFTConfig:
        return MelSTFTConfig(
            filter_length=self.filter_length,
            hop_length=self.hop_length,
            win_length=self.win_length,
            n_mel_channels=self.n_mels,
        )


# One canonical windowed-DFT basis implementation (vocoder.py) serves both
# the vocoder's BWE re-analysis and this VAE-side analysis; re-exported here
# for the existing `analysis.make_stft_basis` callers.


def _hz_to_mel(f):
    """Slaney mel scale (librosa default): linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    hz = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    hz = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
    return hz


def make_mel_basis(
    sample_rate: int, n_fft: int, n_mels: int,
    fmin: float = 0.0, fmax: float | None = None,
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) slaney-normalized triangular filterbank."""
    if fmax is None:
        fmax = sample_rate / 2
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    weights = np.zeros((n_mels, n_freqs), np.float64)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def make_analysis_params(cfg: AudioAnalysisConfig) -> dict:
    """Params tree for `mel_spectrogram` (stft_fn.forward_basis + mel_basis)."""
    return {
        "stft_fn": {
            "forward_basis": jnp.asarray(
                make_stft_basis(cfg.filter_length, cfg.win_length)
            )
        },
        "mel_basis": jnp.asarray(
            make_mel_basis(cfg.sample_rate, cfg.filter_length, cfg.n_mels)
        ),
    }


def waveform_to_latent(
    waveform: np.ndarray,
    encoder_params,
    encoder_cfg,
    analysis_cfg: AudioAnalysisConfig,
    target_latent_frames: int,
) -> jnp.ndarray:
    """(channels, samples) waveform -> normalized audio latent
    (1, z, target_latent_frames, mel_bins).

    Per-channel log-mel analysis -> (1, C, T_mel, n_mels) spectrogram ->
    pad/trim T_mel to the causal decoder's inverse frame count
    (4*L - 3, so the encoder's two stride-2 causal convs give exactly L)
    -> `audio_encoder_apply` (includes per-channel normalization).
    """
    from ltx2_tpu.models.audio_vae.encoder import audio_encoder_apply

    wav = np.asarray(waveform, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    if wav.shape[0] == 1 and encoder_cfg.in_ch == 2:
        wav = np.repeat(wav, 2, axis=0)  # mono -> stereo duplicate
    params = make_analysis_params(analysis_cfg)
    log_mel, _mag, _phase, _energy = mel_spectrogram(
        params, analysis_cfg.mel_cfg(), jnp.asarray(wav)
    )  # (C, n_mels, T_mel)
    spec = jnp.transpose(log_mel, (0, 2, 1))[None]  # (1, C, T_mel, n_mels)

    t_target = 4 * target_latent_frames - 3  # causal inverse of decoder T map
    t_mel = spec.shape[2]
    if t_mel < t_target:
        spec = jnp.pad(
            spec, [(0, 0), (0, 0), (0, t_target - t_mel), (0, 0)], mode="edge"
        )
    elif t_mel > t_target:
        spec = spec[:, :, :t_target]
    return audio_encoder_apply(encoder_params, encoder_cfg, spec)
