"""Audio VAE decoder (functional, TPU-native).

Capability parity with reference LTX_2_MLX/model/audio_vae/decoder.py
(AudioDecoder, decoder.py:247-419): latent (B, 8, T, 16) -> stereo log-mel
(B, 2, T*4 - 3, 64). conv_in 8->512, 2 mid res-blocks, 3 up-levels
(512->512->256->128) each num_res_blocks res blocks + Upsample2d, PixelNorm,
conv_out->2. Denormalization via patchify -> per-channel stats ->
unpatchify (decoder.py:338-362). CausalConv2d is causal along the FRAME
axis (pad front only; decoder.py:84-147); Upsample2d doubles both axes and
drops the first causal row.

Forced fp32 (decoder.py:374-376) — feeds the vocoder's 108 sequential convs.
Channels-last NHWC internally ((B, T, M, C)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.ops import pixel_norm

Params = Dict[str, object]

LATENT_DOWNSAMPLE_FACTOR = 4


@dataclass(frozen=True)
class AudioDecoderConfig:
    ch: int = 128
    out_ch: int = 2
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 3
    z_channels: int = 8
    mel_bins: int = 16
    sample_rate: int = 16000
    mel_hop_length: int = 160
    is_causal: bool = True

    @property
    def base_block_channels(self) -> int:
        return self.ch * self.ch_mult[-1]

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)


def pixel_norm_nhwc(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMS normalization over the channel (last) axis (decoder.py:27-53).

    Same fp32-accumulated norm as the video VAE's — one implementation so
    the audio/video norm semantics can't silently diverge.
    """
    return pixel_norm(x, axis=-1, eps=eps)


def causal_conv2d(
    p: Params,
    x: jnp.ndarray,
    kernel_size: int = 3,
    causal: bool = True,
    stride: int = 1,
) -> jnp.ndarray:
    """Conv over (B, T, M, C): causal (front-pad) along T, symmetric along M
    (decoder.py:84-147). p['weight'] is checkpoint (outC, inC, kH, kW)."""
    k = kernel_size
    if k > 1:
        pad = k - 1
        if causal:
            t_pad = (pad, 0)
        else:
            t_pad = (pad // 2, pad - pad // 2)
        x = jnp.pad(x, [(0, 0), t_pad, (pad // 2, pad - pad // 2), (0, 0)])
    w = p["weight"].transpose(2, 3, 1, 0).astype(x.dtype)  # HWIO
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return out + p["bias"].astype(out.dtype)


def _res_block(p: Params, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """norm -> silu -> conv, x2, + (skip-projected) residual
    (SimpleResBlock2d, decoder.py:150-208)."""
    h = pixel_norm_nhwc(x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv2d(p["conv1"], h, 3, causal)
    h = pixel_norm_nhwc(h)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv2d(p["conv2"], h, 3, causal)
    if "skip" in p:
        x = causal_conv2d(p["skip"], x, 1, causal)
    return x + h


def _upsample(p: Params, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """Nearest 2x on both axes -> conv -> drop first causal row
    (Upsample2d, decoder.py:211-242)."""
    b, t, m, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    x = causal_conv2d(p["conv"], x, 3, causal)
    if causal:
        x = x[:, 1:]
    return x


def denormalize_audio_latent(sample: jnp.ndarray, stats: Params) -> jnp.ndarray:
    """Patchify (B,C,T,F)->(B,T,C*F), x*std+mean, unpatchify
    (decoder.py:338-362)."""
    b, c, t, f = sample.shape
    patched = sample.transpose(0, 2, 1, 3).reshape(b, t, c * f)
    patched = patched * stats["std_of_means"][None, None] + stats["mean_of_means"][None, None]
    return patched.reshape(b, t, c, f).transpose(0, 2, 1, 3)


def normalize_audio_latent(sample: jnp.ndarray, stats: Params) -> jnp.ndarray:
    b, c, t, f = sample.shape
    patched = sample.transpose(0, 2, 1, 3).reshape(b, t, c * f)
    patched = (patched - stats["mean_of_means"][None, None]) / stats["std_of_means"][None, None]
    return patched.reshape(b, t, c, f).transpose(0, 2, 1, 3)


def audio_decoder_apply(
    params: Params, cfg: AudioDecoderConfig, sample: jnp.ndarray
) -> jnp.ndarray:
    """Decode latent (B, z, T, mel) -> log-mel (B, out_ch, T', mel*4), fp32."""
    sample = sample.astype(jnp.float32)
    sample = denormalize_audio_latent(sample, params["per_channel_statistics"])

    _b, _c, t, f = sample.shape
    target_frames = t * LATENT_DOWNSAMPLE_FACTOR
    if cfg.is_causal:
        target_frames = max(target_frames - (LATENT_DOWNSAMPLE_FACTOR - 1), 1)
    target_mel = f * LATENT_DOWNSAMPLE_FACTOR

    h = sample.transpose(0, 2, 3, 1)  # NHWC: (B, T, M, C)
    # The reference's is_causal changes ONLY the output frame trim above:
    # every CausalConv2d is constructed with the default frame-causal
    # padding and Upsample2d always drops the first row regardless
    # (decoder.py:84-131, 211-242, 290-300 — is_causal threads only into
    # the patchifier and target_frames). Threading it into the convs would
    # silently run a different network than the reference's is_causal=False.
    causal = True

    h = causal_conv2d(params["conv_in"], h, 3, causal)
    h = _res_block(params["mid_block_1"], h, causal)
    h = _res_block(params["mid_block_2"], h, causal)

    for level in params["up_blocks"]:
        for rb in level["res_blocks"]:
            h = _res_block(rb, h, causal)
        if "upsample" in level:
            h = _upsample(level["upsample"], h, causal)

    h = pixel_norm_nhwc(h)
    h = jax.nn.silu(h.astype(jnp.float32))
    h = causal_conv2d(params["conv_out"], h, 3, causal)

    h = h.transpose(0, 3, 1, 2)  # back to (B, C, T, M)
    return h[:, : cfg.out_ch, :target_frames, :target_mel]


def init_audio_decoder(key, cfg: AudioDecoderConfig, dtype=jnp.float32) -> Params:
    def conv(k, in_c, out_c, ksize=3):
        bound = 1.0 / (in_c * ksize * ksize) ** 0.5
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(kw, (out_c, in_c, ksize, ksize), dtype, -bound, bound),
            "bias": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
        }

    def res(k, in_c, out_c):
        k1, k2, k3 = jax.random.split(k, 3)
        p = {"conv1": conv(k1, in_c, out_c), "conv2": conv(k2, out_c, out_c)}
        if in_c != out_c:
            p["skip"] = conv(k3, in_c, out_c, 1)
        return p

    ki = iter(jax.random.split(key, 32))
    base = cfg.base_block_channels
    p: Params = {
        "per_channel_statistics": {
            "mean_of_means": jnp.zeros((cfg.z_channels * cfg.mel_bins,), jnp.float32),
            "std_of_means": jnp.ones((cfg.z_channels * cfg.mel_bins,), jnp.float32),
        },
        "conv_in": conv(next(ki), cfg.z_channels, base),
        "mid_block_1": res(next(ki), base, base),
        "mid_block_2": res(next(ki), base, base),
    }
    up_blocks = []
    block_in = base
    for i_level in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        level: Params = {
            "res_blocks": [],
        }
        for _ in range(cfg.num_res_blocks):
            level["res_blocks"].append(res(next(ki), block_in, block_out))
            block_in = block_out
        if i_level != 0:
            level["upsample"] = {"conv": conv(next(ki), block_out, block_out)}
        up_blocks.append(level)
    p["up_blocks"] = up_blocks
    p["conv_out"] = conv(next(ki), cfg.ch, cfg.out_ch)
    return p


def load_audio_decoder_params(path: str, cfg: AudioDecoderConfig) -> Optional[Params]:
    """Load audio_vae.decoder.* keys (decoder.py:422-527); returns None if the
    checkpoint carries no audio VAE."""
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import SafetensorsFile

    f = SafetensorsFile(path)
    if not any(k.startswith("audio_vae.") for k in f.keys()):
        return None

    def get(k):
        return jnp.asarray(np.asarray(f.get(k), np.float32)) if k in f else None

    def conv(prefix):
        return {"weight": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    def res(prefix):
        p = {
            "conv1": conv(f"{prefix}.conv1.conv"),
            "conv2": conv(f"{prefix}.conv2.conv"),
        }
        if f"{prefix}.nin_shortcut.conv.weight" in f:
            p["skip"] = conv(f"{prefix}.nin_shortcut.conv")
        return p

    p: Params = {
        "conv_in": conv("audio_vae.decoder.conv_in.conv"),
        "mid_block_1": res("audio_vae.decoder.mid.block_1"),
        "mid_block_2": res("audio_vae.decoder.mid.block_2"),
        "conv_out": conv("audio_vae.decoder.conv_out.conv"),
        "per_channel_statistics": {
            "mean_of_means": get("audio_vae.per_channel_statistics.mean-of-means")
            if "audio_vae.per_channel_statistics.mean-of-means" in f
            else jnp.zeros((cfg.z_channels * cfg.mel_bins,), jnp.float32),
            "std_of_means": get("audio_vae.per_channel_statistics.std-of-means")
            if "audio_vae.per_channel_statistics.std-of-means" in f
            else jnp.ones((cfg.z_channels * cfg.mel_bins,), jnp.float32),
        },
    }
    up_blocks = []
    for i_level in reversed(range(cfg.num_resolutions)):
        level: Params = {"res_blocks": []}
        for i_block in range(cfg.num_res_blocks):
            level["res_blocks"].append(
                res(f"audio_vae.decoder.up.{i_level}.block.{i_block}")
            )
        if i_level != 0:
            level["upsample"] = {
                "conv": conv(f"audio_vae.decoder.up.{i_level}.upsample.conv.conv")
            }
        up_blocks.append(level)
    p["up_blocks"] = up_blocks
    return p
