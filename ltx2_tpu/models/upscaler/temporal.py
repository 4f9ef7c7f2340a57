"""2x temporal latent upscaler (functional, TPU-native).

Capability parity with reference LTX_2_MLX/model/upscaler/temporal.py
(TemporalUpscaler, temporal.py:218-307): conv3d 128->512 -> per-frame
GroupNorm(32) -> SiLU -> 4 ResBlocks -> TemporalPixelShuffle (conv->1024,
channel->time shuffle, first frame trimmed) -> 4 ResBlocks -> conv3d->128.

Unlike the spatial upscaler, GroupNorm here is PER-FRAME (over C/g, H, W;
temporal.py:130-135).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc

Params = Dict[str, object]


@dataclass(frozen=True)
class TemporalUpscalerConfig:
    latent_channels: int = 128
    hidden_channels: int = 512
    num_res_blocks: int = 4
    num_groups: int = 32
    scale_factor: int = 2


def _conv(p, x):
    return conv3d_ndhwc(
        p, x, causal=False, spatial_mode="zeros", temporal_mode="zeros"
    )


def group_norm_per_frame(
    x: jnp.ndarray, num_groups: int, weight: jnp.ndarray, bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm per (frame, group) over (H, W, C/g) for channels-last
    (B, T, H, W, C) (temporal.py:130-135).

    Group membership is PyTorch-CONTIGUOUS (channel c -> group c // (C/G)),
    the layout the real checkpoints were trained with. NOTE: the reference
    instantiates MLX nn.GroupNorm WITHOUT pytorch_compatible=True
    (temporal.py:114-115), whose default grouping is interleaved — a
    reference bug against its own torch-trained weights; the sibling
    spatial upscaler hand-rolls the contiguous layout, which we match."""
    b, t, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, t, h, w, num_groups, cg)
    mean = xf.mean(axis=(2, 3, 5), keepdims=True)
    var = xf.var(axis=(2, 3, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, t, h, w, c)
    xf = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return xf.astype(x.dtype)


def _res_block(p: Params, x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    residual = x
    h = _conv(p["conv1"], x)
    h = group_norm_per_frame(h, num_groups, p["norm1"]["weight"], p["norm1"]["bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv(p["conv2"], h)
    h = group_norm_per_frame(h, num_groups, p["norm2"]["weight"], p["norm2"]["bias"])
    return jax.nn.silu((h + residual).astype(jnp.float32)).astype(x.dtype)


def _temporal_pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Channels-last temporal pixel shuffle (temporal.py:192-215).

    x: (B, T, H, W, C*r) with the factor as the SLOWEST packed-channel
    axis — i.e. einops "(p c)". NOTE: the reference's docstring quotes
    "b (c p1) f h w" but its executable reshape is
    `x.reshape(b, r, c_out, t, h, w)` (r slowest) = "(p1 c)"; we match the
    reference's CODE (what real checkpoints decode through), and the torch
    oracle (test_torch_oracle_upscalers.py) pins the same order."""
    b, t, h, w, c = x.shape
    c_out = c // r
    x = x.reshape(b, t, h, w, r, c_out)
    x = x.transpose(0, 1, 4, 2, 3, 5)  # (B, T, r, H, W, C_out)
    return x.reshape(b, t * r, h, w, c_out)


def temporal_upscaler_apply(
    params: Params, cfg: TemporalUpscalerConfig, latent: jnp.ndarray
) -> jnp.ndarray:
    """(B, 128, F, H, W) un-normalized latent -> (B, 128, F*2 - 1, H, W)."""
    x = to_ndhwc(latent)
    x = _conv(params["initial_conv"], x)
    x = group_norm_per_frame(
        x, cfg.num_groups,
        params["initial_norm"]["weight"], params["initial_norm"]["bias"],
    )
    x = jax.nn.silu(x.astype(jnp.float32)).astype(latent.dtype)

    for block in params["res_blocks"]:
        x = _res_block(block, x, cfg.num_groups)

    x = _conv(params["upsampler"]["conv"], x)
    x = _temporal_pixel_shuffle(x, cfg.scale_factor)
    # First latent frame encodes one pixel frame — trim after upsampling
    # (temporal.py:294-296).
    x = x[:, 1:]

    for block in params["post_upsample_res_blocks"]:
        x = _res_block(block, x, cfg.num_groups)

    x = _conv(params["final_conv"], x)
    return from_ndhwc(x)


def init_temporal_upscaler(key, cfg: TemporalUpscalerConfig, dtype=jnp.float32) -> Params:
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
    hid = cfg.hidden_channels
    return {
        "initial_conv": conv3(next(ki), cfg.latent_channels, hid),
        "initial_norm": norm(hid),
        "res_blocks": [res(next(ki), hid) for _ in range(cfg.num_res_blocks)],
        "upsampler": {"conv": conv3(next(ki), hid, hid * cfg.scale_factor)},
        "post_upsample_res_blocks": [res(next(ki), hid) for _ in range(cfg.num_res_blocks)],
        "final_conv": conv3(next(ki), hid, cfg.latent_channels),
    }


def load_temporal_upscaler_params(path: str) -> Params:
    """Load from the dedicated upscaler safetensors (temporal.py:310-380;
    upsampler keys are `upsampler.0.*` from a torch Sequential)."""
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

    # Explicit None checks: `a or b` on a multi-element jnp array raises on
    # truthiness (spatial.py's loader does the same).
    up_w = get("upsampler.0.weight")
    up_b = get("upsampler.0.bias")
    if up_w is None:
        up_w = get("upsampler.conv.weight")
        up_b = get("upsampler.conv.bias")

    return {
        "initial_conv": {"weight": get("initial_conv.weight"), "bias": get("initial_conv.bias")},
        "initial_norm": {"weight": get("initial_norm.weight"), "bias": get("initial_norm.bias")},
        "res_blocks": res_blocks("res_blocks"),
        "upsampler": {"conv": {"weight": up_w, "bias": up_b}},
        "post_upsample_res_blocks": res_blocks("post_upsample_res_blocks"),
        "final_conv": {"weight": get("final_conv.weight"), "bias": get("final_conv.bias")},
    }
