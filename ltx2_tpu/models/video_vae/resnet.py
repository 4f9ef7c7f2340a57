"""Full-VAE building blocks (the non-"simple" path).

Capability parity with reference LTX_2_MLX/model/video_vae/resnet.py
(PixelNorm, ResnetBlock3D, UNetMidBlock3D, resnet.py:11-321) and
convolution.py (DualConv3d separable 2D+1D conv, CausalConv3d,
make_conv_nd, convolution.py:60-610). These serve the non-"simple"
VideoEncoder/VideoDecoder variants; the pipelines use the Simple* path
(encoder.py / decoder.py here).

Channels-last internally, same conventions as conv.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc
from ltx2_tpu.models.video_vae.ops import pixel_norm
from ltx2_tpu.ops.common import group_norm

Params = Dict[str, object]


class PaddingModeType(Enum):
    ZEROS = "zeros"
    REFLECT = "reflect"
    REPLICATE = "replicate"


class NormLayerType(Enum):
    GROUP_NORM = "group_norm"
    PIXEL_NORM = "pixel_norm"


def dual_conv3d(
    p: Params,
    x: jnp.ndarray,
    stride: Tuple[int, int, int] = (1, 1, 1),
    skip_time_conv: bool = False,
) -> jnp.ndarray:
    """Separable 3D conv: 2D spatial then 1D temporal
    (DualConv3d, convolution.py:60-205). x channels-last (B, T, H, W, C).

    p['conv1'] weight (midC, inC, kH, kW); p['conv2'] weight (outC, midC, kT).
    """
    b, t, h, w, c = x.shape
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    # Spatial 2D conv over all frames at once.
    w1 = p["conv1"]["weight"]
    kh, kw = w1.shape[2], w1.shape[3]
    x2 = x.reshape(b * t, h, w, c)
    out = jax.lax.conv_general_dilated(
        x2,
        w1.transpose(2, 3, 1, 0).astype(x.dtype),
        (stride[1], stride[2]),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "bias" in p["conv1"]:
        out = out + p["conv1"]["bias"].astype(out.dtype)
    _, h2, w2, mid = out.shape
    out = out.reshape(b, t, h2, w2, mid)

    if skip_time_conv:
        return out

    # Temporal 1D conv over all spatial locations at once.
    w2_ = p["conv2"]["weight"]  # (outC, midC, kT)
    kt = w2_.shape[2]
    xt = out.transpose(0, 2, 3, 1, 4).reshape(b * h2 * w2, t, mid)
    out_t = jax.lax.conv_general_dilated(
        xt,
        w2_.transpose(2, 1, 0).astype(x.dtype),
        (stride[0],),
        [(kt // 2, kt // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    if "bias" in p["conv2"]:
        out_t = out_t + p["conv2"]["bias"].astype(out_t.dtype)
    t2, outc = out_t.shape[1], out_t.shape[2]
    return out_t.reshape(b, h2, w2, t2, outc).transpose(0, 3, 1, 2, 4)


def causal_conv3d(
    p: Params, x: jnp.ndarray, causal: bool = True,
    spatial_padding_mode: PaddingModeType = PaddingModeType.ZEROS,
) -> jnp.ndarray:
    """CausalConv3d: replicate-first-frame temporal padding
    (convolution.py:206-290). Thin wrapper over conv3d_ndhwc."""
    return conv3d_ndhwc(
        p, x, causal=causal,
        spatial_mode="zeros" if spatial_padding_mode == PaddingModeType.ZEROS
        else spatial_padding_mode.value,
    )


def make_conv_nd_apply(
    p: Params,
    x: jnp.ndarray,
    dims: Union[int, Tuple[int, int]] = 3,
    causal: bool = True,
    spatial_padding_mode: PaddingModeType = PaddingModeType.ZEROS,
) -> jnp.ndarray:
    """Dispatch: dims=3 -> full causal 3D conv; dims=(2, 1) -> DualConv3d
    (make_conv_nd, convolution.py:447-524)."""
    if dims == 3:
        return causal_conv3d(p, x, causal, spatial_padding_mode)
    if dims == (2, 1):
        # dual_conv3d implements the reference DualConv3d's NON-causal
        # zero-padded path (symmetric temporal zeros, spatial zeros). No
        # real config combines (2,1) with causal/reflect padding; refuse
        # rather than silently run different semantics.
        if causal or spatial_padding_mode != PaddingModeType.ZEROS:
            raise NotImplementedError(
                "DualConv3d (dims=(2,1)) supports only non-causal zero "
                f"padding; got causal={causal}, "
                f"spatial_padding_mode={spatial_padding_mode}"
            )
        return dual_conv3d(p, x)
    raise ValueError(f"unsupported dims {dims}")


@dataclass(frozen=True)
class ResnetBlock3DConfig:
    dims: Union[int, Tuple[int, int]] = 3
    in_channels: int = 128
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    norm_layer: NormLayerType = NormLayerType.PIXEL_NORM
    inject_noise: bool = False
    timestep_conditioning: bool = False
    spatial_padding_mode: PaddingModeType = PaddingModeType.ZEROS

    @property
    def out_ch(self) -> int:
        return self.out_channels or self.in_channels


def _norm(cfg: ResnetBlock3DConfig, p: Optional[Params], x: jnp.ndarray) -> jnp.ndarray:
    if cfg.norm_layer == NormLayerType.PIXEL_NORM:
        return pixel_norm(x, axis=-1, eps=1e-8)
    # GroupNorm over channels-last: move C to axis 1 view.
    b, t, h, w, c = x.shape
    xc = x.transpose(0, 4, 1, 2, 3)
    out = group_norm(p, xc, cfg.groups, cfg.eps)
    return out.transpose(0, 2, 3, 4, 1)


def resnet_block_3d_apply(
    p: Params,
    cfg: ResnetBlock3DConfig,
    x: jnp.ndarray,
    causal: bool = True,
    timestep: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """norm -> [AdaLN] -> silu -> conv -> [noise], x2, + (projected) shortcut
    (ResnetBlock3D, resnet.py:38-237). x channels-last (B, T, H, W, C)."""
    h = _norm(cfg, p.get("norm1"), x)

    scale1 = shift1 = scale2 = shift2 = None
    if cfg.timestep_conditioning:
        if timestep is None:
            raise ValueError("timestep must be provided when timestep_conditioning is True")
        table = p["scale_shift_table"].astype(jnp.float32)  # (4, C)
        ada = table[None] + timestep.reshape(timestep.shape[0], 4, -1).astype(jnp.float32)
        shift1 = ada[:, 0][:, None, None, None, :]
        scale1 = ada[:, 1][:, None, None, None, :]
        shift2 = ada[:, 2][:, None, None, None, :]
        scale2 = ada[:, 3][:, None, None, None, :]
        h = (h.astype(jnp.float32) * (1 + scale1) + shift1).astype(x.dtype)

    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = make_conv_nd_apply(p["conv1"], h, cfg.dims, causal, cfg.spatial_padding_mode)

    if cfg.inject_noise and key is not None:
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, h.shape[:4] + (1,), h.dtype)
        h = h + noise * p["per_channel_scale1"].reshape(1, 1, 1, 1, -1).astype(h.dtype)

    h = _norm(cfg, p.get("norm2"), h)
    if cfg.timestep_conditioning:
        h = (h.astype(jnp.float32) * (1 + scale2) + shift2).astype(x.dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = make_conv_nd_apply(p["conv2"], h, cfg.dims, causal, cfg.spatial_padding_mode)

    if cfg.inject_noise and key is not None:
        _, sub = jax.random.split(key)
        noise = jax.random.normal(sub, h.shape[:4] + (1,), h.dtype)
        h = h + noise * p["per_channel_scale2"].reshape(1, 1, 1, 1, -1).astype(h.dtype)

    shortcut = x
    if "norm3" in p:
        # ALWAYS GroupNorm(num_groups=1), not cfg.norm_layer: the reference
        # builds the shortcut norm as a LayerNorm-equivalent GroupNorm with
        # affine params whenever channels change (resnet.py:121-128,
        # 231-235) even in pixel-norm blocks.
        sc = shortcut.transpose(0, 4, 1, 2, 3)
        sc = group_norm(p["norm3"], sc, 1, cfg.eps)
        shortcut = sc.transpose(0, 2, 3, 4, 1)
    if "conv_shortcut" in p:
        from ltx2_tpu.ops.common import linear

        shortcut = linear(p["conv_shortcut"], shortcut)
    return shortcut + h


@dataclass(frozen=True)
class UNetMidBlock3DConfig:
    dims: Union[int, Tuple[int, int]] = 3
    in_channels: int = 128
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    norm_layer: NormLayerType = NormLayerType.GROUP_NORM
    inject_noise: bool = False
    timestep_conditioning: bool = False
    spatial_padding_mode: PaddingModeType = PaddingModeType.ZEROS

    def block_config(self) -> ResnetBlock3DConfig:
        return ResnetBlock3DConfig(
            dims=self.dims,
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            groups=self.resnet_groups,
            eps=self.resnet_eps,
            norm_layer=self.norm_layer,
            inject_noise=self.inject_noise,
            timestep_conditioning=self.timestep_conditioning,
            spatial_padding_mode=self.spatial_padding_mode,
        )


def unet_mid_block_3d_apply(
    p: Params,
    cfg: UNetMidBlock3DConfig,
    x: jnp.ndarray,
    causal: bool = True,
    timestep: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sequential ResnetBlock3Ds (UNetMidBlock3D, resnet.py:240-321)."""
    block_cfg = cfg.block_config()
    for block in p["res_blocks"]:
        # Independent noise per block (the reference draws fresh noise at
        # every injection site) — reusing one key would correlate every
        # block's injected noise bit-for-bit.
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        x = resnet_block_3d_apply(block, block_cfg, x, causal, timestep, sub)
    return x


def init_resnet_block_3d(key, cfg: ResnetBlock3DConfig, dtype=jnp.float32) -> Params:
    def conv(k, in_c, out_c, ksize=3):
        bound = 1.0 / (in_c * ksize**3) ** 0.5
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(kw, (out_c, in_c, ksize, ksize, ksize), dtype, -bound, bound),
            "bias": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
        }

    def dual(k, in_c, out_c):
        mid = max(in_c, out_c)
        k1, k2 = jax.random.split(k)
        b1 = 1.0 / (in_c * 9) ** 0.5
        b2 = 1.0 / (mid * 3) ** 0.5
        return {
            "conv1": {
                "weight": jax.random.uniform(k1, (mid, in_c, 3, 3), dtype, -b1, b1),
                "bias": jnp.zeros((mid,), dtype),
            },
            "conv2": {
                "weight": jax.random.uniform(k2, (out_c, mid, 3), dtype, -b2, b2),
                "bias": jnp.zeros((out_c,), dtype),
            },
        }

    k1, k2, k3 = jax.random.split(key, 3)
    make = conv if cfg.dims == 3 else dual
    p: Params = {
        "conv1": make(k1, cfg.in_channels, cfg.out_ch),
        "conv2": make(k2, cfg.out_ch, cfg.out_ch),
    }
    if cfg.norm_layer == NormLayerType.GROUP_NORM:
        p["norm1"] = {"weight": jnp.ones((cfg.in_channels,), dtype), "bias": jnp.zeros((cfg.in_channels,), dtype)}
        p["norm2"] = {"weight": jnp.ones((cfg.out_ch,), dtype), "bias": jnp.zeros((cfg.out_ch,), dtype)}
    if cfg.timestep_conditioning:
        if cfg.in_channels != cfg.out_ch:
            # One (4, C) table conditions BOTH the pre-conv1 (in_channels)
            # and post-norm2 (out_ch) tensors — undefined when they differ
            # (the reference's (4, in_channels) table breaks its own
            # scale2 the same way). No real decoder block hits this.
            raise ValueError(
                "timestep_conditioning requires in_channels == out_channels "
                f"(got {cfg.in_channels} != {cfg.out_ch})"
            )
        p["scale_shift_table"] = jnp.zeros((4, cfg.in_channels), jnp.float32)
    if cfg.inject_noise:
        # out_ch, the shape the APPLY needs (noise is added post-conv1/2);
        # the reference inits these (in_channels, 1, 1) — broken for its
        # own in != out apply — but only ever uses in == out blocks.
        p["per_channel_scale1"] = jnp.zeros((cfg.out_ch,), jnp.float32)
        p["per_channel_scale2"] = jnp.zeros((cfg.out_ch,), jnp.float32)
    if cfg.in_channels != cfg.out_ch:
        from ltx2_tpu.ops.common import init_linear

        p["conv_shortcut"] = init_linear(k3, cfg.in_channels, cfg.out_ch, dtype=dtype)
        # Shortcut norm: ALWAYS GroupNorm(num_groups=1) — a LayerNorm
        # equivalent with affine params — whenever channels change,
        # regardless of cfg.norm_layer (resnet.py:121-128).
        p["norm3"] = {
            "weight": jnp.ones((cfg.in_channels,), dtype),
            "bias": jnp.zeros((cfg.in_channels,), dtype),
        }
    return p


def init_unet_mid_block_3d(key, cfg: UNetMidBlock3DConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_layers)
    return {
        "res_blocks": [
            init_resnet_block_3d(k, cfg.block_config(), dtype) for k in keys
        ]
    }
