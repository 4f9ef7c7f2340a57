"""2x spatial latent upscaler (functional, TPU-native).

Capability parity with reference LTX_2_MLX/model/upscaler/spatial.py
(SpatialUpscaler, spatial.py:326-411): conv3d 128->1024 -> GroupNorm(32)
over (C/g, T, H, W) -> SiLU -> 4 ResBlock3d -> SpatialRationalResampler
(per-frame 2D conv 1024->4096 -> PixelShuffle2d x2 -> blur-down identity)
-> 4 ResBlock3d -> conv3d->128. Applied to UN-normalized latents
(two_stage.py:664-674). ResBlock: conv->norm->act->conv->norm->
act(x + residual).

Channels-last internally; real 3D convs with zero padding everywhere
(upscaler convention, spatial.py:20-88).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc

Params = Dict[str, object]


@dataclass(frozen=True)
class SpatialUpscalerConfig:
    in_channels: int = 128
    mid_channels: int = 1024
    num_blocks_per_stage: int = 4
    num_groups: int = 32
    scale: int = 2


def _conv(p, x):
    return conv3d_ndhwc(
        p, x, causal=False, spatial_mode="zeros", temporal_mode="zeros"
    )


def group_norm_video(
    x: jnp.ndarray, num_groups: int, weight: jnp.ndarray, bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over (C/g, T, H, W) for channels-last (B, T, H, W, C)
    (group_norm_5d, spatial.py:91-128)."""
    b, t, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, t, h, w, num_groups, cg)
    mean = xf.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = xf.var(axis=(1, 2, 3, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, t, h, w, c)
    xf = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return xf.astype(x.dtype)


def _res_block(p: Params, x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """conv->norm->act->conv->norm->act(x+res) (spatial.py:131-181)."""
    residual = x
    h = _conv(p["conv1"], x)
    h = group_norm_video(h, num_groups, p["norm1"]["weight"], p["norm1"]["bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv(p["conv2"], h)
    h = group_norm_video(h, num_groups, p["norm2"]["weight"], p["norm2"]["bias"])
    return jax.nn.silu((h + residual).astype(jnp.float32)).astype(x.dtype)


def _pixel_shuffle_2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B*, H, W, C*r*r) -> (B*, H*r, W*r, C); channel packing (C, r_h, r_w)
    (spatial.py:184-218)."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c_out)


def _rational_resampler(p: Params, x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Per-frame 2D conv -> pixel shuffle (SpatialRationalResampler,
    spatial.py:267-323). x is channels-last (B, T, H, W, C)."""
    b, t, h, w, c = x.shape
    x2 = x.reshape(b * t, h, w, c)
    # Checkpoint weight (outC, inC, kH, kW) -> HWIO.
    w4 = p["conv"]["weight"].transpose(2, 3, 1, 0).astype(x.dtype)
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    y = jax.lax.conv_general_dilated(
        x2, w4, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y + p["conv"]["bias"].astype(y.dtype)
    y = _pixel_shuffle_2d(y, scale)
    # BlurDownsample with stride 1 is identity (spatial.py:221-264).
    _, h2, w2, c2 = y.shape
    return y.reshape(b, t, h2, w2, c2)


def spatial_upscaler_apply(
    params: Params, cfg: SpatialUpscalerConfig, latent: jnp.ndarray
) -> jnp.ndarray:
    """(B, 128, F, H, W) un-normalized latent -> (B, 128, F, H*2, W*2)."""
    x = to_ndhwc(latent)
    x = _conv(params["initial_conv"], x)
    x = group_norm_video(
        x, cfg.num_groups,
        params["initial_norm"]["weight"], params["initial_norm"]["bias"],
    )
    x = jax.nn.silu(x.astype(jnp.float32)).astype(latent.dtype)

    for block in params["res_blocks"]:
        x = _res_block(block, x, cfg.num_groups)

    x = _rational_resampler(params["upsampler"], x, cfg.scale)

    for block in params["post_upsample_res_blocks"]:
        x = _res_block(block, x, cfg.num_groups)

    x = _conv(params["final_conv"], x)
    return from_ndhwc(x)


def init_spatial_upscaler(key, cfg: SpatialUpscalerConfig, dtype=jnp.float32) -> Params:
    def conv3(k, in_c, out_c):
        bound = 1.0 / (in_c * 27) ** 0.5
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(kw, (out_c, in_c, 3, 3, 3), dtype, -bound, bound),
            "bias": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
        }

    def norm(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def res(k, c):
        k1, k2 = jax.random.split(k)
        return {
            "conv1": conv3(k1, c, c), "norm1": norm(c),
            "conv2": conv3(k2, c, c), "norm2": norm(c),
        }

    ki = iter(jax.random.split(key, 16))
    mid = cfg.mid_channels
    kw, kb = jax.random.split(next(ki))
    bound = 1.0 / (mid * 9) ** 0.5
    return {
        "initial_conv": conv3(next(ki), cfg.in_channels, mid),
        "initial_norm": norm(mid),
        "res_blocks": [res(next(ki), mid) for _ in range(cfg.num_blocks_per_stage)],
        "upsampler": {
            "conv": {
                "weight": jax.random.uniform(
                    kw, (cfg.scale**2 * mid, mid, 3, 3), dtype, -bound, bound
                ),
                "bias": jax.random.uniform(kb, (cfg.scale**2 * mid,), dtype, -bound, bound),
            }
        },
        "post_upsample_res_blocks": [
            res(next(ki), mid) for _ in range(cfg.num_blocks_per_stage)
        ],
        "final_conv": conv3(next(ki), mid, cfg.in_channels),
    }


def load_spatial_upscaler_params(path: str) -> Params:
    """Load from the dedicated upscaler safetensors (key names at
    spatial.py:414-536; v1.0 `upsampler.conv.*` / v1.1 `upsampler.0.*`)."""
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import SafetensorsFile

    f = SafetensorsFile(path)

    def get(k):
        return jnp.asarray(np.asarray(f.get(k), np.float32)) if k in f else None

    def res_blocks(prefix):
        blocks = []
        i = 0
        while f"{prefix}.{i}.conv1.weight" in f:
            blocks.append(
                {
                    "conv1": {"weight": get(f"{prefix}.{i}.conv1.weight"), "bias": get(f"{prefix}.{i}.conv1.bias")},
                    "norm1": {"weight": get(f"{prefix}.{i}.norm1.weight"), "bias": get(f"{prefix}.{i}.norm1.bias")},
                    "conv2": {"weight": get(f"{prefix}.{i}.conv2.weight"), "bias": get(f"{prefix}.{i}.conv2.bias")},
                    "norm2": {"weight": get(f"{prefix}.{i}.norm2.weight"), "bias": get(f"{prefix}.{i}.norm2.bias")},
                }
            )
            i += 1
        return blocks

    up_w = get("upsampler.conv.weight")
    if up_w is None:
        up_w = get("upsampler.0.weight")
        up_b = get("upsampler.0.bias")
    else:
        up_b = get("upsampler.conv.bias")

    return {
        "initial_conv": {"weight": get("initial_conv.weight"), "bias": get("initial_conv.bias")},
        "initial_norm": {"weight": get("initial_norm.weight"), "bias": get("initial_norm.bias")},
        "res_blocks": res_blocks("res_blocks"),
        "upsampler": {"conv": {"weight": up_w, "bias": up_b}},
        "post_upsample_res_blocks": res_blocks("post_upsample_res_blocks"),
        "final_conv": {"weight": get("final_conv.weight"), "bias": get("final_conv.bias")},
    }
