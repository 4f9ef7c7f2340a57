"""Torch-oracle parity for the COMPOSED audio chain (the reference's
known-fragile subsystem, AUDIO_ISSUES.md).

The 1D conv/transpose/depthwise/STFT primitives already have oracles
(test_torch_oracle.py); this file asserts the full composed modules —
the AudioDecoder chain (causal-along-frames CausalConv2d, pixel-norm res
blocks with skip projections, nearest-2x upsample with causal row drop,
patchified denormalization, target-frame cropping) and the BigVGAN-v2
vocoder chain (kaiser anti-aliased SnakeBeta activations, AMP blocks,
transposed-conv upsample stages, multi-receptive-field mean fusion) —
against independent torch implementations of the reference semantics
(LTX_2_MLX/model/audio_vae/decoder.py / vocoder.py, cited per function).
"""

import math

import jax
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_torch_oracle import assert_close, t2j
from tests.test_torch_oracle_model import tree_to_torch
from tests.test_torch_oracle_vae import randomize

torch.manual_seed(0)

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# Audio decoder oracle (decoder.py:56-419)
# ---------------------------------------------------------------------------


def causal_conv2d(p, x, k=3, causal=True, axis="frames"):
    """CausalConv2d (decoder.py:84-147): layout (B, C, frames, mel); causal
    pads the FRAME axis front-only, mel axis symmetric."""
    pad = k - 1
    mel_pad = (pad // 2, pad - pad // 2)
    t_pad = (pad, 0) if causal else mel_pad
    if k > 1:
        # F.pad 4D order: (W_l, W_r, H_l, H_r) = (mel, mel, frames, frames)
        x = F.pad(x, (*mel_pad, *t_pad))
    return F.conv2d(x, p["weight"], p["bias"])


def audio_pixel_norm(x, eps=1e-6):
    # PixelNorm over channels (decoder.py:27-53)
    return x * torch.rsqrt((x * x).mean(dim=1, keepdim=True) + eps)


def audio_res_block(p, x, causal):
    """SimpleResBlock2d (decoder.py:150-208)."""
    h = causal_conv2d(p["conv1"], F.silu(audio_pixel_norm(x)), 3, causal)
    h = causal_conv2d(p["conv2"], F.silu(audio_pixel_norm(h)), 3, causal)
    if "skip" in p:
        x = causal_conv2d(p["skip"], x, 1, causal)
    return x + h


def torch_audio_decoder(tp, cfg, sample):
    """AudioDecoder forward (decoder.py:247-419)."""
    sample = sample.float()
    b, c, t, f = sample.shape
    # patchify -> denormalize -> unpatchify (decoder.py:338-362)
    stats = tp["per_channel_statistics"]
    patched = sample.permute(0, 2, 1, 3).reshape(b, t, c * f)
    patched = patched * stats["std_of_means"][None, None] + stats["mean_of_means"][None, None]
    sample = patched.reshape(b, t, c, f).permute(0, 2, 1, 3)

    target_frames = t * 4
    if cfg.is_causal:
        target_frames = max(target_frames - 3, 1)
    target_mel = f * 4

    # The reference's is_causal affects ONLY target_frames: every
    # CausalConv2d keeps the default frame-causal padding and Upsample2d
    # always drops the first row (decoder.py:84-131, 211-242 — is_causal
    # threads only into the patchifier and the output trim).
    h = causal_conv2d(tp["conv_in"], sample, 3, True)
    h = audio_res_block(tp["mid_block_1"], h, True)
    h = audio_res_block(tp["mid_block_2"], h, True)
    for level in tp["up_blocks"]:
        for rb in level["res_blocks"]:
            h = audio_res_block(rb, h, True)
        if "upsample" in level:
            # Upsample2d (decoder.py:211-242): nearest 2x, conv, drop first
            # causal row
            h = h.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
            h = causal_conv2d(level["upsample"]["conv"], h, 3, True)
            h = h[:, :, 1:]
    h = causal_conv2d(tp["conv_out"], F.silu(audio_pixel_norm(h)), 3, True)
    return h[:, : cfg.out_ch, :target_frames, :target_mel]


class TestAudioDecoderOracle:
    def _run(self, is_causal):
        from ltx2_tpu.models.audio_vae.decoder import (
            AudioDecoderConfig,
            audio_decoder_apply,
            init_audio_decoder,
        )

        cfg = AudioDecoderConfig(
            ch=8, ch_mult=(1, 2, 4), num_res_blocks=2, z_channels=4,
            mel_bins=4, is_causal=is_causal,
        )
        params = randomize(init_audio_decoder(jax.random.PRNGKey(0), cfg), seed=30)
        g = torch.Generator().manual_seed(31)
        latent = torch.randn(1, cfg.z_channels, 5, cfg.mel_bins, generator=g)

        got = audio_decoder_apply(params, cfg, t2j(latent))
        want = torch_audio_decoder(tree_to_torch(params), cfg, latent)
        assert_close(got, want, rtol=1e-3, atol=1e-4,
                     msg=f"audio decoder chain causal={is_causal}")
        return np.asarray(got)

    def test_causal_chain(self):
        out = self._run(True)
        # 5 latent frames * 4 - 3 (causal) = 17 frames; mel 4*4 = 16
        assert out.shape == (1, 2, 17, 16)

    def test_noncausal_chain(self):
        out = self._run(False)
        # is_causal=False changes ONLY the target trim (to t*4 = 20), but
        # the always-causal network emits 17 rows — the trim keeps them
        # all (reference semantics; convs never become non-causal).
        assert out.shape == (1, 2, 17, 16)


# ---------------------------------------------------------------------------
# Vocoder oracle (vocoder.py:162-810)
# ---------------------------------------------------------------------------


def oracle_kaiser_filter(cutoff, half_width, kernel_size):
    """Kaiser-windowed sinc filter (reference vocoder.py:180-226 — the
    standard BigVGAN DSP constants), independent numpy implementation."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    amplitude = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if amplitude > 50.0:
        beta = 0.1102 * (amplitude - 8.7)
    elif amplitude >= 21.0:
        beta = 0.5842 * (amplitude - 21) ** 0.4 + 0.07886 * (amplitude - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        filt = np.zeros_like(time)
    else:
        xt = 2 * cutoff * time
        safe = np.where(xt == 0, 1.0, np.pi * xt)
        sinc = np.where(xt == 0, 1.0, np.sin(np.pi * xt) / safe)
        filt = 2 * cutoff * window * sinc
        filt /= filt.sum()
    return torch.from_numpy(filt.reshape(1, 1, -1).astype(np.float32))


def replicate_pad(x, left, right):
    return F.pad(x, (left, right), mode="replicate")


def depthwise(x, filt, stride=1):
    c = x.shape[1]
    return F.conv1d(x, filt.expand(c, 1, filt.shape[-1]), stride=stride, groups=c)


def depthwise_T(x, filt, stride):
    c = x.shape[1]
    return F.conv_transpose1d(
        x, filt.expand(c, 1, filt.shape[-1]), stride=stride, groups=c
    )


def torch_upsample1d(x, ratio=2, kernel_size=12):
    """UpSample1d kaiser path (vocoder.py:304-367)."""
    k = kernel_size
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = oracle_kaiser_filter(0.5 / ratio, 0.6 / ratio, k)
    x = replicate_pad(x, pad, pad)
    x = ratio * depthwise_T(x, filt, stride=ratio)
    return x[:, :, pad_left : x.shape[2] - pad_right]


def torch_downsample1d(x, ratio=2, kernel_size=12):
    """DownSample1d = LowPassFilter1d with stride (vocoder.py:278-301,369-389)."""
    k = kernel_size
    even = k % 2 == 0
    filt = oracle_kaiser_filter(0.5 / ratio, 0.6 / ratio, k)
    x = replicate_pad(x, k // 2 - int(even), k // 2)
    return depthwise(x, filt, stride=ratio)


def torch_snake_beta(p, x, eps=1e-9):
    alpha = torch.exp(p["alpha"])[None, :, None]
    beta = torch.exp(p["beta"])[None, :, None]
    return x + (1.0 / (beta + eps)) * torch.sin(x * alpha) ** 2


def torch_activation1d(p, x):
    """Activation1d: up 2x -> SnakeBeta -> down 2x (vocoder.py:392-411)."""
    x = torch_upsample1d(x)
    x = torch_snake_beta(p["act"], x)
    return torch_downsample1d(x)


def torch_amp_block(p, x, k, dilations):
    """AMPBlock1 (vocoder.py:414-457)."""
    for i, d in enumerate(dilations):
        xt = torch_activation1d(p["acts1"][i], x)
        xt = F.conv1d(xt, p["convs1"][i]["weight"], p["convs1"][i]["bias"],
                      padding=(k - 1) * d // 2, dilation=d)
        xt = torch_activation1d(p["acts2"][i], xt)
        xt = F.conv1d(xt, p["convs2"][i]["weight"], p["convs2"][i]["bias"],
                      padding=(k - 1) // 2)
        x = x + xt
    return x


def torch_res_block1(p, x, k, dilations):
    """HiFi-GAN ResBlock1 (vocoder.py:119-154)."""
    for i, d in enumerate(dilations):
        xt = F.leaky_relu(x, LRELU_SLOPE)
        xt = F.conv1d(xt, p["convs1"][i]["weight"], p["convs1"][i]["bias"],
                      padding=(k - 1) * d // 2, dilation=d)
        xt = F.leaky_relu(xt, LRELU_SLOPE)
        xt = F.conv1d(xt, p["convs2"][i]["weight"], p["convs2"][i]["bias"],
                      padding=(k - 1) // 2)
        x = xt + x
    return x


def torch_vocoder(tp, cfg, mel):
    """Vocoder forward (vocoder.py:748-810)."""
    x = mel.float().permute(0, 1, 3, 2)
    b, s, m, t = x.shape
    x = x.reshape(b, s * m, t)
    x = F.conv1d(x, tp["conv_pre"]["weight"], tp["conv_pre"]["bias"], padding=3)
    nk = cfg.num_kernels
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        if not cfg.is_amp:
            x = F.leaky_relu(x, LRELU_SLOPE)
        up = tp["ups"][i]
        x = F.conv_transpose1d(x, up["weight"], up["bias"], stride=rate,
                               padding=(k - rate) // 2)
        outs = []
        for j, (rk, dil) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = tp["resblocks"][i * nk + j]
            if cfg.is_amp:
                outs.append(torch_amp_block(block, x, rk, dil))
            else:
                outs.append(torch_res_block1(block, x, rk, dil))
        x = torch.stack(outs, dim=0).mean(dim=0)
    if cfg.is_amp and "act_post" in tp:
        x = torch_activation1d(tp["act_post"], x)
    else:
        x = F.leaky_relu(x)  # torch default 0.01 slope (vocoder.py:795-798)
    x = F.conv1d(x, tp["conv_post"]["weight"], tp["conv_post"]["bias"], padding=3)
    if cfg.apply_final_activation:
        x = torch.tanh(x) if cfg.use_tanh_at_final else torch.clamp(x, -1, 1)
    return x


class TestVocoderOracle:
    def _cfg(self, **kw):
        from ltx2_tpu.models.audio_vae.vocoder import VocoderConfig

        defaults = dict(
            resblock_kernel_sizes=(3,),
            upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4),
            resblock_dilation_sizes=((1, 3),),
            upsample_initial_channel=16,
            resblock="AMP1",
            in_channels_override=8,
        )
        defaults.update(kw)
        return VocoderConfig(**defaults)

    def _run(self, cfg):
        from ltx2_tpu.models.audio_vae.vocoder import init_vocoder, vocoder_apply

        params = randomize(init_vocoder(jax.random.PRNGKey(2), cfg), seed=32, scale=0.05)
        g = torch.Generator().manual_seed(33)
        mel = torch.randn(1, 2, 11, 4, generator=g)  # (B, stereo, T, mel)

        got = vocoder_apply(params, cfg, t2j(mel))
        want = torch_vocoder(tree_to_torch(params), cfg, mel)
        assert_close(got, want, rtol=1e-3, atol=1e-4, msg=f"vocoder {cfg.resblock}")
        return np.asarray(got)

    def test_bigvgan_amp_chain(self):
        """Full BigVGAN-v2 AMP chain: kaiser-anti-aliased SnakeBeta
        activations (default filters), AMP residual blocks, mean fusion,
        act_post, tanh — 4x temporal upsample of the 11-frame mel."""
        out = self._run(self._cfg())
        assert out.shape == (1, 2, 44)

    def test_hifigan_resblock1_chain(self):
        """HiFi-GAN variant: leaky-relu blocks, no AMP activations."""
        out = self._run(self._cfg(resblock="1"))
        assert out.shape == (1, 2, 44)

    def test_snake_beta_and_resamplers(self):
        """Anti-aliased activation pipeline in isolation: jax activation1d
        (default kaiser filters) vs the independent torch pipeline."""
        from ltx2_tpu.models.audio_vae.vocoder import activation1d

        g = torch.Generator().manual_seed(34)
        x = torch.randn(2, 4, 37, generator=g)
        alpha = torch.randn(4, generator=g) * 0.2
        beta = torch.randn(4, generator=g) * 0.2
        p = {"act": {"alpha": t2j(alpha), "beta": t2j(beta)}}
        got = activation1d(p, t2j(x))
        want = torch_activation1d(
            {"act": {"alpha": alpha, "beta": beta}}, x
        )
        assert_close(got, want, rtol=1e-4, atol=1e-5, msg="activation1d")


# ---------------------------------------------------------------------------
# BWE chain oracle (vocoder.py:554-652): vocoder -> mel re-analysis -> BWE
# residual + hann-resampled skip -> clip
# ---------------------------------------------------------------------------


def oracle_hann_resample_filter(ratio):
    """torchaudio-style hann-sinc resample filter (reference
    vocoder.py:317-341), independent numpy implementation. Returns
    (filter, pad, pad_left, pad_right)."""
    rolloff, width_taps = 0.99, 6
    width = math.ceil(width_taps / rolloff)
    k = 2 * width * ratio + 1
    t = np.arange(k) / ratio - width
    tr = t * rolloff
    tc = np.clip(tr, -width_taps, width_taps)
    window = np.cos(tc * math.pi / width_taps / 2) ** 2
    safe = np.where(tr == 0, 1.0, np.pi * tr)
    sinc = np.where(tr == 0, 1.0, np.sin(np.pi * tr) / safe)
    filt = (sinc * window * rolloff / ratio).astype(np.float32)
    return (
        torch.from_numpy(filt.reshape(1, 1, -1)),
        width,
        2 * width * ratio,
        k - ratio,
    )


def torch_hann_upsample(x, ratio):
    filt, pad, pad_left, pad_right = oracle_hann_resample_filter(ratio)
    x = replicate_pad(x, pad, pad)
    x = ratio * depthwise_T(x, filt, stride=ratio)
    return x[:, :, pad_left : x.shape[2] - pad_right]


def torch_mel_spectrogram(tp, cfg, y):
    """MelSTFT re-analysis (vocoder.py:460-551): conv1d with the DFT
    forward_basis, causal left pad win-hop, log-mel."""
    if y.ndim == 2:
        y = y[:, None, :]
    left = max(0, cfg.win_length - cfg.hop_length)
    if left:
        y = F.pad(y, (left, 0))
    basis = tp["stft_fn"]["forward_basis"]
    spec = F.conv1d(y, basis, stride=cfg.hop_length)
    n_freqs = spec.shape[1] // 2
    mag = torch.sqrt(spec[:, :n_freqs] ** 2 + spec[:, n_freqs:] ** 2)
    mel = torch.einsum("mf,bft->bmt", tp["mel_basis"], mag)
    return torch.log(torch.clamp(mel, min=1e-5))


class TestBWEChainOracle:
    def test_full_bwe_chain(self):
        """Vocoder @low-rate -> MelSTFT re-analysis -> BWE generator
        residual + hann-sinc upsampled skip -> clip, vs the independent
        torch composition (incl. independently computed hann filter)."""
        from dataclasses import replace

        from ltx2_tpu.models.audio_vae.vocoder import (
            MelSTFTConfig,
            VocoderConfig,
            VocoderWithBWEConfig,
            init_vocoder_with_bwe,
            vocoder_with_bwe_apply,
        )

        voc = VocoderConfig(
            resblock_kernel_sizes=(3,),
            upsample_rates=(2,),
            upsample_kernel_sizes=(4,),
            resblock_dilation_sizes=((1, 3),),
            upsample_initial_channel=8,
            resblock="AMP1",
            in_channels_override=4,
        )
        bwe = replace(
            voc, in_channels_override=None, apply_final_activation=False
        )
        cfg = VocoderWithBWEConfig(
            vocoder=voc, bwe=bwe,
            mel_stft=MelSTFTConfig(
                filter_length=8, hop_length=4, win_length=8, n_mel_channels=6
            ),
            input_sampling_rate=1, output_sampling_rate=2, hop_length=4,
        )
        params = randomize(
            init_vocoder_with_bwe(jax.random.PRNGKey(5), cfg), seed=35, scale=0.05
        )
        g = torch.Generator().manual_seed(36)
        mel = torch.randn(1, 2, 8, 2, generator=g)  # (B, stereo, T, mel=2)

        got = vocoder_with_bwe_apply(params, cfg, t2j(mel))

        tp = tree_to_torch(params)
        x = torch_vocoder(tp["vocoder"], cfg.vocoder, mel)
        length_low = x.shape[2]
        out_len = length_low * 2
        rem = length_low % cfg.hop_length
        if rem:
            x = F.pad(x, (0, cfg.hop_length - rem))
        b, n_ch, t = x.shape
        mel2 = torch_mel_spectrogram(tp["mel_stft"], cfg.mel_stft, x.reshape(b * n_ch, t))
        mel2 = mel2.reshape(b, n_ch, mel2.shape[1], mel2.shape[2])
        bwe_cfg = replace(
            cfg.bwe, in_channels_override=n_ch * cfg.mel_stft.n_mel_channels
        )
        residual = torch_vocoder(tp["bwe_generator"], bwe_cfg, mel2.permute(0, 1, 3, 2))
        skip = torch_hann_upsample(x, 2)
        n = min(residual.shape[2], skip.shape[2])
        want = torch.clamp(residual[:, :, :n] + skip[:, :, :n], -1, 1)[:, :, :out_len]

        assert_close(got, want, rtol=1e-3, atol=1e-4, msg="BWE chain")


class TestAnalysisBasisOracle:
    """Round-3 programmatic STFT/mel analysis (audio_vae/analysis.py — the
    waveform->latent direction the reference never shipped): the built DFT
    basis must reproduce torch.stft magnitudes exactly, and the slaney
    filterbank must satisfy the structural slaney invariants."""

    def test_stft_basis_matches_torch_stft(self):
        from ltx2_tpu.models.audio_vae.analysis import (
            AudioAnalysisConfig,
            make_analysis_params,
        )
        from ltx2_tpu.models.audio_vae.vocoder import stft_magnitude_phase

        cfg = AudioAnalysisConfig(
            sample_rate=16000, filter_length=256, win_length=256, hop_length=64,
            n_mels=16,
        )
        params = make_analysis_params(cfg)
        g = torch.Generator().manual_seed(77)
        y = torch.randn(2, 2048, generator=g)

        mag, _phase = stft_magnitude_phase(
            params["stft_fn"], cfg.mel_cfg(), t2j(y)
        )

        # Independent torch side: same causal left pad, torch.stft.
        left = cfg.win_length - cfg.hop_length
        yp = F.pad(y, (left, 0))
        window = torch.hann_window(cfg.win_length, periodic=True)
        spec = torch.stft(
            yp, n_fft=cfg.filter_length, hop_length=cfg.hop_length,
            win_length=cfg.win_length, window=window, center=False,
            return_complex=True,
        )
        want = spec.abs()
        assert_close(mag, want, rtol=1e-3, atol=1e-3, msg="stft magnitude")

    def test_mel_basis_slaney_invariants(self):
        from ltx2_tpu.models.audio_vae.analysis import make_mel_basis

        sr, n_fft, n_mels = 16000, 512, 64
        basis = make_mel_basis(sr, n_fft, n_mels)
        assert basis.shape == (n_mels, n_fft // 2 + 1)
        assert (basis >= 0).all()
        # Each filter is a single triangle: one peak, increasing center freq.
        peaks = basis.argmax(axis=1)
        assert (np.diff(peaks) > 0).all(), "mel peaks not monotonically increasing"
        # Slaney normalization: filter area (sum * df) ~ 2 / bandwidth =>
        # energy-normalized: sum_i w_i * bandwidth_i / 2 ~ df-spacing const.
        freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
        df = freqs[1] - freqs[0]
        areas = basis.sum(axis=1) * df
        # Interior filters integrate to ~1 under slaney scaling.
        assert np.all(np.abs(areas[2:-2] - 1.0) < 0.2), areas[2:-2]
        # Low band is linear in mel scale: first peaks evenly spaced.
        low_spacing = np.diff(peaks[:8])
        assert low_spacing.max() - low_spacing.min() <= 2

    def test_waveform_to_latent_matches_manual_chain(self):
        """waveform_to_latent == mel analysis -> pad -> encoder, assembled
        independently here."""
        from ltx2_tpu.models.audio_vae.analysis import (
            AudioAnalysisConfig,
            make_analysis_params,
            waveform_to_latent,
        )
        from ltx2_tpu.models.audio_vae.encoder import (
            AudioEncoderConfig,
            audio_encoder_apply,
            init_audio_encoder,
        )
        from ltx2_tpu.models.audio_vae.vocoder import mel_spectrogram

        enc_cfg = AudioEncoderConfig(ch=4, num_res_blocks=1, z_channels=2, mel_bins=4)
        enc_params = jax.jit(lambda k: init_audio_encoder(k, enc_cfg))(
            jax.random.PRNGKey(8)
        )
        cfg = AudioAnalysisConfig(
            sample_rate=16000, filter_length=256, win_length=256, hop_length=64,
            n_mels=16,
        )
        wav = np.random.default_rng(5).normal(size=(2, 4096)).astype(np.float32)
        target_frames = 7
        got = waveform_to_latent(wav, enc_params, enc_cfg, cfg, target_frames)
        assert got.shape == (1, 2, target_frames, 4)

        params = make_analysis_params(cfg)
        log_mel, _m, _p, _e = mel_spectrogram(params, cfg.mel_cfg(), jax.numpy.asarray(wav))
        spec = jax.numpy.transpose(log_mel, (0, 2, 1))[None]
        t_target = 4 * target_frames - 3
        spec = spec[:, :, :t_target] if spec.shape[2] >= t_target else jax.numpy.pad(
            spec, [(0, 0), (0, 0), (0, t_target - spec.shape[2]), (0, 0)], mode="edge"
        )
        want = audio_encoder_apply(enc_params, enc_cfg, spec)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
