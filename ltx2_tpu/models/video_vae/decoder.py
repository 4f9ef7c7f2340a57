"""Config-driven causal video VAE decoder (functional, TPU-native).

Capability parity with reference
LTX_2_MLX/model/video_vae/simple_decoder.py (SimpleVideoDecoder,
simple_decoder.py:364-563): denormalize by per-channel stats -> 0.025 noise
injection -> conv_in 128->1024 -> up_blocks built from checkpoint-metadata
`decoder_blocks` (reversed) -> pixel_norm + timestep-conditioned last
scale/shift -> SiLU -> conv_out->48 -> unpatchify 4x4 -> RGB in [-1, 1].

Timestep conditioning: the decoder performs a final denoise step at t~0.05;
per-res-group TimestepEmbedders add to the 4-value scale/shift tables
(simple_decoder.py:210-226,480-483).

TPU-first: whole decoder is one jittable function in channels-last NDHWC
with real 3D convs (see conv.py); the reference's temporal chunking
(an MLX conv bug workaround, simple_decoder.py:676-800) is retained as an
OPTIONAL memory-bounding strategy in chunking.py, not a correctness fix.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc
from ltx2_tpu.models.video_vae.ops import pixel_norm, unpatchify
from ltx2_tpu.ops.common import Params, linear

_STRIDE_MAP = {
    "compress_all": (2, 2, 2),
    "compress_time": (2, 1, 1),
    "compress_space": (1, 2, 2),
}

# Default V2.0 decoder blocks (simple_decoder.py:353-361). Stored in build
# order (as in checkpoint config; construction reverses them).
DEFAULT_DECODER_BLOCKS: Tuple = (
    ("res_x", 5),
    ("compress_all", 2, True),
    ("res_x", 5),
    ("compress_all", 2, True),
    ("res_x", 5),
    ("compress_all", 2, True),
    ("res_x", 5),
)


def normalize_decoder_blocks(blocks) -> Tuple:
    """Checkpoint-config JSON blocks -> hashable tuples.

    Accepts ["res_x", {"num_layers": 5}] / ["compress_all", {"multiplier": 2,
    "residual": true}] / ["res_x", 5] forms.
    """
    out = []
    for entry in blocks:
        name, params = entry[0], entry[1]
        if isinstance(params, int):
            params = {"num_layers": params}
        if name == "res_x":
            out.append(("res_x", int(params["num_layers"])))
        elif name in _STRIDE_MAP:
            out.append(
                (name, int(params.get("multiplier", 1)), bool(params.get("residual", False)))
            )
        else:
            raise ValueError(f"Unknown decoder block: {name}")
    return tuple(out)


@dataclass(frozen=True)
class VideoDecoderConfig:
    decoder_blocks: Tuple = DEFAULT_DECODER_BLOCKS
    base_channels: int = 128
    latent_channels: int = 128
    timestep_conditioning: bool = True
    compute_dtype: str = "float32"
    decode_noise_scale: float = 0.025
    patch_size: int = 4

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def plan(self) -> List[Tuple[str, Tuple, int]]:
        """Forward-order block plan: [(kind, spec, in_channels)].

        Blocks execute in REVERSED config order starting from
        base_channels * 8 feature channels (simple_decoder.py:399-427).
        """
        feature_channels = self.base_channels * 8
        plan = []
        for entry in reversed(self.decoder_blocks):
            if entry[0] == "res_x":
                plan.append(("res", (entry[1],), feature_channels))
            else:
                name, multiplier, residual = entry
                plan.append(
                    ("upsample", (_STRIDE_MAP[name], multiplier, residual), feature_channels)
                )
                feature_channels //= multiplier
        return plan

    @property
    def num_temporal_upsamples(self) -> int:
        return sum(
            1
            for entry in self.decoder_blocks
            if entry[0] != "res_x" and _STRIDE_MAP[entry[0]][0] > 1
        )

    @property
    def final_channels(self) -> int:
        c = self.base_channels * 8
        for entry in self.decoder_blocks:
            if entry[0] != "res_x":
                c //= entry[1]
        return c


def decoder_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int = 256) -> jnp.ndarray:
    """VAE-decoder sinusoidal embedding: concat(cos, sin) order
    (simple_decoder.py:12-39) — differs from the DiT's DDPM embedding."""
    if timesteps.ndim == 0:
        timesteps = timesteps.reshape(1)
    half = embedding_dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def timestep_embedder_apply(p: Params, t_emb: jnp.ndarray) -> jnp.ndarray:
    """linear -> SiLU -> linear (simple_decoder.py:42-59)."""
    h = linear(p["linear_1"], t_emb)
    return linear(p["linear_2"], jax.nn.silu(h))


def _res_block(
    p: Params,
    x: jnp.ndarray,
    causal: bool,
    time_emb: Optional[jnp.ndarray],
    channels: int,
    w_halo_axis: Optional[str] = None,
) -> jnp.ndarray:
    """pixel_norm -> scale/shift -> SiLU -> conv, x2, + residual
    (simple_decoder.py:183-240). Channels-last; scale/shift math fp32."""
    residual = x
    table = p["scale_shift_table"].astype(jnp.float32)  # (4, C)
    if time_emb is not None:
        ss = table[None] + time_emb.reshape(-1, 4, channels)  # (B, 4, C)
        vals = [ss[:, i][:, None, None, None, :] for i in range(4)]
    else:
        vals = [table[i][None, None, None, None, :] for i in range(4)]
    shift1, scale1, shift2, scale2 = vals[0], 1 + vals[1], vals[2], 1 + vals[3]

    h = pixel_norm(x).astype(jnp.float32) * scale1 + shift1
    h = jax.nn.silu(h).astype(x.dtype)
    h = conv3d_ndhwc(
        p["conv1"], h, causal=causal, spatial_mode="reflect",
        w_halo_axis=w_halo_axis,
    )

    h = pixel_norm(h).astype(jnp.float32) * scale2 + shift2
    h = jax.nn.silu(h).astype(x.dtype)
    h = conv3d_ndhwc(
        p["conv2"], h, causal=causal, spatial_mode="reflect",
        w_halo_axis=w_halo_axis,
    )
    return h + residual


def _depth_to_space(x: jnp.ndarray, c_out: int, stride: Tuple[int, int, int]) -> jnp.ndarray:
    """Channels-last d2s, packing order (c_out, ft, fh, fw)
    (simple_decoder.py:274-285)."""
    b, t, h, w, _ = x.shape
    ft, fh, fw = stride
    x = x.reshape(b, t, h, w, c_out, ft, fh, fw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * ft, h * fh, w * fw, c_out)


def _upsample_block(
    p: Params,
    x: jnp.ndarray,
    causal: bool,
    stride: Tuple[int, int, int],
    multiplier: int,
    residual: bool,
    in_channels: int,
    w_halo_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Conv -> depth-to-space with residual tiled-d2s path; first frame
    trimmed when temporal stride > 1 (causal fix, simple_decoder.py:287-313)."""
    ft = stride[0]
    stride_product = math.prod(stride)
    final_out = in_channels // multiplier

    if residual:
        c_d2s = in_channels // stride_product
        res = _depth_to_space(x, c_d2s, stride)
        if ft > 1:
            res = res[:, 1:]
        num_repeat = stride_product // multiplier
        res = jnp.tile(res, (1, 1, 1, 1, num_repeat))

    x = conv3d_ndhwc(
        p["conv"], x, causal=causal, spatial_mode="reflect",
        w_halo_axis=w_halo_axis,
    )
    x = _depth_to_space(x, final_out, stride)
    if ft > 1:
        x = x[:, 1:]
    if residual:
        x = x + res
    return x


def video_decoder_apply(
    params: Params,
    cfg: VideoDecoderConfig,
    latent: jnp.ndarray,
    timestep: Optional[float] = 0.05,
    noise_key: Optional[jax.Array] = None,
    causal: bool = False,
    w_halo_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Decode (B, 128, T, H, W) latent -> (B, 3, (T-1)*8+1-ish, H*32, W*32)
    video in [-1, 1]. Jittable end-to-end.

    w_halo_axis: run W-sharded inside shard_map (see tiling.decode_w_sharded)
    — every conv exchanges explicit boundary halos over this mesh axis; all
    other decoder ops are pointwise over W. noise_key must then be None or
    pre-folded per shard (a shared key would generate shard-local noise that
    differs from the unsharded run)."""
    batch = latent.shape[0]
    x = latent.astype(jnp.float32)

    # Denormalize (simple_decoder.py:491-494).
    stats = params["per_channel_statistics"]
    x = x * stats["std_of_means"].reshape(1, -1, 1, 1, 1)
    x = x + stats["mean_of_means"].reshape(1, -1, 1, 1, 1)

    scaled_timestep = None
    if cfg.timestep_conditioning and timestep is not None:
        mult = params.get("timestep_scale_multiplier", jnp.float32(1000.0))
        scaled_timestep = jnp.full((batch,), timestep, jnp.float32) * mult

    # Noise injection (simple_decoder.py:495-498).
    if cfg.timestep_conditioning and timestep is not None and noise_key is not None:
        noise = jax.random.normal(noise_key, x.shape, jnp.float32) * cfg.decode_noise_scale
        x = noise + (1.0 - cfg.decode_noise_scale) * x

    x = to_ndhwc(x.astype(cfg.dtype))
    x = conv3d_ndhwc(
        params["conv_in"], x, causal=causal, spatial_mode="reflect",
        w_halo_axis=w_halo_axis,
    )

    for block_params, (kind, spec, channels) in zip(params["up_blocks"], cfg.plan()):
        if kind == "res":
            time_emb = None
            if scaled_timestep is not None and "time_embedder" in block_params:
                t_emb = decoder_timestep_embedding(scaled_timestep, 256)
                time_emb = timestep_embedder_apply(
                    block_params["time_embedder"], t_emb
                ).astype(jnp.float32)
            for rb in block_params["res_blocks"]:
                x = _res_block(rb, x, causal, time_emb, channels, w_halo_axis)
        else:
            stride, multiplier, residual = spec
            x = _upsample_block(
                block_params, x, causal, stride, multiplier, residual, channels,
                w_halo_axis,
            )

    # Final norm + (timestep-conditioned) scale/shift (simple_decoder.py:527-542).
    x = pixel_norm(x)
    table = params["last_scale_shift_table"].astype(jnp.float32)  # (2, C)
    if scaled_timestep is not None and "last_time_embedder" in params:
        t_emb = decoder_timestep_embedding(scaled_timestep, 256)
        time_emb = timestep_embedder_apply(params["last_time_embedder"], t_emb)
        ss = table[None] + time_emb.reshape(batch, 2, cfg.final_channels).astype(jnp.float32)
        shift = ss[:, 0][:, None, None, None, :]
        scale = 1 + ss[:, 1][:, None, None, None, :]
    else:
        shift = table[0][None, None, None, None, :]
        scale = 1 + table[1][None, None, None, None, :]

    x = x.astype(jnp.float32) * scale + shift
    x = jax.nn.silu(x).astype(cfg.dtype)
    x = conv3d_ndhwc(
        params["conv_out"], x, causal=causal, spatial_mode="reflect",
        w_halo_axis=w_halo_axis,
    )

    x = from_ndhwc(x)
    x = unpatchify(x, patch_size_hw=cfg.patch_size, patch_size_t=1)
    return x.astype(jnp.float32)


def init_video_decoder(key: jax.Array, cfg: VideoDecoderConfig, dtype=jnp.float32) -> Params:
    """Random init with the checkpoint-shaped structure (tests only)."""

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

    def linear_params(k, in_f, out_f):
        from ltx2_tpu.ops.common import init_linear

        return init_linear(k, in_f, out_f, dtype=dtype)

    keys = jax.random.split(key, 64)
    ki = iter(keys)
    feature = cfg.base_channels * 8
    p: Params = {
        "per_channel_statistics": {
            "mean_of_means": jnp.zeros((cfg.latent_channels,), jnp.float32),
            "std_of_means": jnp.ones((cfg.latent_channels,), jnp.float32),
        },
        "conv_in": conv_params(next(ki), cfg.latent_channels, feature),
    }
    up_blocks = []
    for kind, spec, channels in cfg.plan():
        if kind == "res":
            (num_layers,) = spec
            block = {
                "res_blocks": [
                    {
                        "conv1": conv_params(next(ki), channels, channels),
                        "conv2": conv_params(next(ki), channels, channels),
                        "scale_shift_table": jnp.zeros((4, channels), jnp.float32),
                    }
                    for _ in range(num_layers)
                ]
            }
            if cfg.timestep_conditioning:
                block["time_embedder"] = {
                    "linear_1": linear_params(next(ki), 256, 256),
                    "linear_2": linear_params(next(ki), 256, 4 * channels),
                }
            up_blocks.append(block)
        else:
            stride, multiplier, _residual = spec
            conv_out_channels = math.prod(stride) * channels // multiplier
            up_blocks.append({"conv": conv_params(next(ki), channels, conv_out_channels)})
    p["up_blocks"] = up_blocks
    p["conv_out"] = conv_params(next(ki), cfg.final_channels, 3 * cfg.patch_size**2)
    p["last_scale_shift_table"] = jnp.zeros((2, cfg.final_channels), jnp.float32)
    if cfg.timestep_conditioning:
        p["timestep_scale_multiplier"] = jnp.float32(1000.0)
        p["last_time_embedder"] = {
            "linear_1": linear_params(next(ki), 256, 256),
            "linear_2": linear_params(next(ki), 256, 2 * cfg.final_channels),
        }
    return p
