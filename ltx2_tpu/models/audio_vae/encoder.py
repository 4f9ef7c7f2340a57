"""Audio VAE encoder (functional, TPU-native).

Capability parity with reference LTX_2_MLX/model/audio_vae/encoder.py
(AudioEncoder, encoder.py:36-305): mirror of the decoder — conv_in 2->128,
3 down-levels (128->256->512) of res blocks + strided-conv Downsample2d,
2 mid res-blocks, SiLU, conv_out -> z*2 (mean/logvar; logvar discarded),
per-channel normalization in patchified space. Used by the a2vid pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.models.audio_vae.decoder import (
    causal_conv2d,
    normalize_audio_latent,
    _res_block,
)

Params = Dict[str, object]


@dataclass(frozen=True)
class AudioEncoderConfig:
    ch: int = 128
    in_ch: int = 2
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 3
    z_channels: int = 8
    mel_bins: int = 16
    double_z: bool = True
    is_causal: bool = True

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)


def audio_encoder_apply(
    params: Params, cfg: AudioEncoderConfig, spectrogram: jnp.ndarray
) -> jnp.ndarray:
    """Encode mel (B, in_ch, T, mel) -> normalized latent (B, z, T/4, mel/4)."""
    h = spectrogram.astype(jnp.float32).transpose(0, 2, 3, 1)  # NHWC
    causal = cfg.is_causal

    h = causal_conv2d(params["conv_in"], h, 3, causal)
    for level in params["down_blocks"]:
        for rb in level["res_blocks"]:
            h = _res_block(rb, h, causal)
        if "downsample" in level:
            h = causal_conv2d(level["downsample"]["conv"], h, 3, causal, stride=2)

    h = _res_block(params["mid_block_1"], h, causal)
    h = _res_block(params["mid_block_2"], h, causal)

    h = jax.nn.silu(h)
    h = causal_conv2d(params["conv_out"], h, 3, causal)
    h = h.transpose(0, 3, 1, 2)  # (B, C, T, M)

    mean_latent = h[:, : cfg.z_channels] if cfg.double_z else h
    return normalize_audio_latent(mean_latent, params["per_channel_statistics"])


def init_audio_encoder(key, cfg: AudioEncoderConfig, dtype=jnp.float32) -> Params:
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
    p: Params = {
        "per_channel_statistics": {
            "mean_of_means": jnp.zeros((cfg.z_channels * cfg.mel_bins,), jnp.float32),
            "std_of_means": jnp.ones((cfg.z_channels * cfg.mel_bins,), jnp.float32),
        },
        "conv_in": conv(next(ki), cfg.in_ch, cfg.ch),
    }
    down_blocks = []
    block_in = cfg.ch
    for i_level in range(cfg.num_resolutions):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        level: Params = {"res_blocks": []}
        for _ in range(cfg.num_res_blocks):
            level["res_blocks"].append(res(next(ki), block_in, block_out))
            block_in = block_out
        if i_level != cfg.num_resolutions - 1:
            level["downsample"] = {"conv": conv(next(ki), block_out, block_out)}
        down_blocks.append(level)
    p["down_blocks"] = down_blocks
    base = cfg.ch * cfg.ch_mult[-1]
    p["mid_block_1"] = res(next(ki), base, base)
    p["mid_block_2"] = res(next(ki), base, base)
    out_c = cfg.z_channels * (2 if cfg.double_z else 1)
    p["conv_out"] = conv(next(ki), base, out_c)
    return p


def load_audio_encoder_params(path: str, cfg: AudioEncoderConfig) -> Optional[Params]:
    """Load audio_vae.encoder.* keys (mirrors decoder loader)."""
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import SafetensorsFile

    f = SafetensorsFile(path)
    if not any(k.startswith("audio_vae.encoder.") for k in f.keys()):
        return None

    def get(k):
        return jnp.asarray(np.asarray(f.get(k), np.float32)) if k in f else None

    def conv(prefix):
        return {"weight": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    def res(prefix):
        p = {"conv1": conv(f"{prefix}.conv1.conv"), "conv2": conv(f"{prefix}.conv2.conv")}
        if f"{prefix}.nin_shortcut.conv.weight" in f:
            p["skip"] = conv(f"{prefix}.nin_shortcut.conv")
        return p

    p: Params = {
        "conv_in": conv("audio_vae.encoder.conv_in.conv"),
        "mid_block_1": res("audio_vae.encoder.mid.block_1"),
        "mid_block_2": res("audio_vae.encoder.mid.block_2"),
        "conv_out": conv("audio_vae.encoder.conv_out.conv"),
        "per_channel_statistics": {
            "mean_of_means": (
                get("audio_vae.per_channel_statistics.mean-of-means")
                if "audio_vae.per_channel_statistics.mean-of-means" in f
                else jnp.zeros((cfg.z_channels * cfg.mel_bins,), jnp.float32)
            ),
            "std_of_means": (
                get("audio_vae.per_channel_statistics.std-of-means")
                if "audio_vae.per_channel_statistics.std-of-means" in f
                else jnp.ones((cfg.z_channels * cfg.mel_bins,), jnp.float32)
            ),
        },
    }
    down_blocks = []
    for i_level in range(cfg.num_resolutions):
        level: Params = {"res_blocks": []}
        for i_block in range(cfg.num_res_blocks):
            level["res_blocks"].append(
                res(f"audio_vae.encoder.down.{i_level}.block.{i_block}")
            )
        if f"audio_vae.encoder.down.{i_level}.downsample.conv.conv.weight" in f:
            level["downsample"] = {
                "conv": conv(f"audio_vae.encoder.down.{i_level}.downsample.conv.conv")
            }
        down_blocks.append(level)
    p["down_blocks"] = down_blocks
    return p
