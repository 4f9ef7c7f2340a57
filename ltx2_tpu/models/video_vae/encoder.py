"""Causal video VAE encoder (functional, TPU-native).

Capability parity with reference
LTX_2_MLX/model/video_vae/simple_encoder.py (SimpleVideoEncoder,
simple_encoder.py:258-404): patchify 4x4 (3->48) -> conv_in 48->128 ->
alternating res-groups and SpaceToDepthDownsample3d stages 128(x4) ->
s2d(1,2,2)->256(x6) -> s2d(2,1,1)->512(x6) -> s2d(2,2,2)->1024(x2) ->
s2d(2,2,2)->1024(x2) -> pixel_norm+SiLU -> conv_out->129 (128 means +
1 logvar, discarded) -> per-channel normalize. Frames must be 8k+1.

Channels-last NDHWC internally; real 3D convs; zero spatial padding
(encoder convention) and causal temporal padding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc
from ltx2_tpu.models.video_vae.ops import normalize_latent, patchify, pixel_norm

Params = Dict[str, object]

# (kind, channels_in, channels_out_or_num_blocks, stride)
ENCODER_PLAN: Tuple = (
    ("res", 128, 4, None),
    ("down", 128, 256, (1, 2, 2)),
    ("res", 256, 6, None),
    ("down", 256, 512, (2, 1, 1)),
    ("res", 512, 6, None),
    ("down", 512, 1024, (2, 2, 2)),
    ("res", 1024, 2, None),
    ("down", 1024, 1024, (2, 2, 2)),
    ("res", 1024, 2, None),
)


@dataclass(frozen=True)
class VideoEncoderConfig:
    patch_size: int = 4
    latent_channels: int = 128
    compute_dtype: str = "float32"
    plan: Tuple = ENCODER_PLAN

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def _enc_res_block(p: Params, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """pixel_norm -> SiLU -> conv, x2, + residual (no conditioning;
    simple_encoder.py:121-157)."""
    residual = x
    h = jax.nn.silu(pixel_norm(x).astype(jnp.float32)).astype(x.dtype)
    h = conv3d_ndhwc(p["conv1"], h, causal=causal, spatial_mode="zeros")
    h = jax.nn.silu(pixel_norm(h).astype(jnp.float32)).astype(x.dtype)
    h = conv3d_ndhwc(p["conv2"], h, causal=causal, spatial_mode="zeros")
    return h + residual


def _space_to_depth(x: jnp.ndarray, stride: Tuple[int, int, int]) -> jnp.ndarray:
    """Channels-last s2d, packing order (c, st, sh, sw)
    (simple_encoder.py:210-226)."""
    b, t, h, w, c = x.shape
    st, sh, sw = stride
    x = x.reshape(b, t // st, st, h // sh, sh, w // sw, sw, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // st, h // sh, w // sw, c * st * sh * sw)


def _down_block(
    p: Params,
    x: jnp.ndarray,
    causal: bool,
    in_channels: int,
    out_channels: int,
    stride: Tuple[int, int, int],
) -> jnp.ndarray:
    """Conv -> space-to-depth, plus group-mean residual path; first frame
    replicated when temporal stride is 2 (simple_encoder.py:175-255)."""
    st = stride[0]
    if st == 2:
        x = jnp.concatenate([x[:, :1], x], axis=1)

    stride_product = math.prod(stride)
    group_size = (in_channels * stride_product) // out_channels

    res = _space_to_depth(x, stride)
    b, t, h, w, _ = res.shape
    res = res.reshape(b, t, h, w, out_channels, group_size).mean(axis=-1)

    x = conv3d_ndhwc(p["conv"], x, causal=causal, spatial_mode="zeros")
    x = _space_to_depth(x, stride)
    return x + res


def video_encoder_apply(
    params: Params,
    cfg: VideoEncoderConfig,
    video: jnp.ndarray,
    causal: bool = True,
) -> jnp.ndarray:
    """Encode (B, 3, F, H, W) video in [-1, 1] -> normalized latent
    (B, 128, (F-1)/8+1, H/32, W/32). Jittable."""
    frames = video.shape[2]
    if (frames - 1) % 8 != 0:
        raise ValueError(
            f"Invalid number of frames: {frames}. "
            "Encoder input must have 1 + 8*k frames (e.g., 1, 9, 17, 25, 33...)."
        )

    x = patchify(video.astype(cfg.dtype), patch_size_hw=cfg.patch_size, patch_size_t=1)
    x = to_ndhwc(x)
    x = conv3d_ndhwc(params["conv_in"], x, causal=causal, spatial_mode="zeros")

    for block_params, (kind, c_in, arg, stride) in zip(params["down_blocks"], cfg.plan):
        if kind == "res":
            for rb in block_params["res_blocks"]:
                x = _enc_res_block(rb, x, causal)
        else:
            x = _down_block(block_params, x, causal, c_in, arg, stride)

    x = jax.nn.silu(pixel_norm(x).astype(jnp.float32)).astype(cfg.dtype)
    x = conv3d_ndhwc(params["conv_out"], x, causal=causal, spatial_mode="zeros")

    x = from_ndhwc(x)
    means = x[:, : cfg.latent_channels]  # discard uniform logvar channel
    means = normalize_latent(
        means.astype(jnp.float32), params["per_channel_statistics"]
    )
    return means.astype(jnp.float32)


def encode_video(video: jnp.ndarray, params: Params, cfg: VideoEncoderConfig) -> jnp.ndarray:
    """Convenience wrapper accepting uint8 (T, H, W, 3) frames
    (simple_encoder.py:535-564)."""
    if video.ndim == 4 and video.shape[-1] == 3:
        video = video.transpose(3, 0, 1, 2)[None]
        if video.dtype == jnp.uint8:
            video = video.astype(jnp.float32) / 127.5 - 1.0
    if video.ndim == 4:
        video = video[None]
    return video_encoder_apply(params, cfg, video)


def init_video_encoder(key: jax.Array, cfg: VideoEncoderConfig, dtype=jnp.float32) -> Params:
    def conv_params(k, in_c, out_c, ksize=3):
        fan_in = in_c * ksize**3
        bound = 1.0 / fan_in**0.5
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(
                kw, (out_c, in_c, ksize, ksize, ksize), dtype, -bound, bound
            ),
            "bias": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
        }

    ki = iter(jax.random.split(key, 64))
    first_channels = cfg.plan[0][1]
    p: Params = {
        "per_channel_statistics": {
            "mean_of_means": jnp.zeros((cfg.latent_channels,), jnp.float32),
            "std_of_means": jnp.ones((cfg.latent_channels,), jnp.float32),
        },
        "conv_in": conv_params(next(ki), 3 * cfg.patch_size**2, first_channels),
    }
    down_blocks: List[Params] = []
    for kind, c_in, arg, stride in cfg.plan:
        if kind == "res":
            down_blocks.append(
                {
                    "res_blocks": [
                        {
                            "conv1": conv_params(next(ki), c_in, c_in),
                            "conv2": conv_params(next(ki), c_in, c_in),
                        }
                        for _ in range(arg)
                    ]
                }
            )
        else:
            conv_out_channels = arg // math.prod(stride)
            down_blocks.append({"conv": conv_params(next(ki), c_in, conv_out_channels)})
    p["down_blocks"] = down_blocks
    last = cfg.plan[-1]
    final_channels = last[1] if last[0] == "res" else last[2]
    p["conv_out"] = conv_params(next(ki), final_channels, cfg.latent_channels + 1)
    return p
