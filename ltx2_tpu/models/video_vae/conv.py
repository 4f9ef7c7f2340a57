"""TPU-native 3D convolution for the causal video VAE.

Channels-last (B, T, H, W, C) with the VAE's exact padding semantics.
Execution strategy: kT separate 2D convolutions over temporal taps with the
(B, T) dims merged — the fastest lowering at every decoder stage in the
round-3 shootout (scripts/bench_conv_lowering.py, v5e, serialized
output-feeds-input chains): e.g. C=128 @121x128x192 104 vs 83 TF/s for
XLA's native 3D lowering, C=256 132 vs 106; tap-wise matmuls and
kT-merged-into-channels 2D convs measured slower still. (The reference
also sums kT 2D convs, but as an MLX missing-op workaround,
simple_decoder.py:62-180 — here it is a measured performance choice; the
math is identical either way.)

Padding semantics preserved exactly (parity hazard #2, SURVEY.md):
- spatial: 'reflect' (decoder, simple_decoder.py:105-117) or zeros (encoder)
- temporal: causal = replicate FIRST frame k-1 times at the front; else
  symmetric replicate padding (simple_decoder.py:119-134)

Weights are stored as checkpoint-shaped (outC, inC, kT, kH, kW) in the param
tree and transposed to DHWIO lazily inside the conv (a no-op copy under XLA
constant folding after the first step).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def _pad_w_halo(
    x: jnp.ndarray, axis_name: str, pad: int, mode: str
) -> jnp.ndarray:
    """Explicit halo exchange for a W-sharded (B, T, H, W_local, C) tensor
    inside shard_map: each device receives `pad` boundary columns from its
    ring neighbors (one ppermute per side, riding ICI), and the devices at
    the GLOBAL domain edges substitute the conv's padding rule (reflect or
    zeros) for the missing neighbor.

    This replaces GSPMD's automatic conv halo exchange, which silently
    miscomputes when a shard is narrower than the halo (the r2 guard). The
    explicit path is correct down to W_local == pad: when the local width
    cannot supply its own reflect column, the value lives on the neighbor
    and is exactly what the opposite-direction ppermute already delivered.
    """
    w_local = x.shape[3]
    if w_local < pad:
        raise ValueError(
            f"W shard ({w_local}) narrower than conv halo ({pad}): use "
            f"fewer devices on the W axis"
        )
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(x[:, :, :, -pad:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :, :, :pad], axis_name, bwd)
    if mode == "reflect":
        # Global reflect of [c0, c1, ...] prepends [c_pad .. c_1] and
        # appends [c_{W-2} .. c_{W-1-pad}] — columns 1..pad (reversed) and
        # -pad-1..-1 (reversed). Local when W_local > pad; at
        # W_local == pad == 1 the single reflect column lives on the
        # neighbor and is exactly the opposite-direction ppermute payload.
        if w_local > pad:
            edge_l = x[:, :, :, 1:pad + 1][:, :, :, ::-1]
            edge_r = x[:, :, :, -pad - 1:-1][:, :, :, ::-1]
        elif pad == 1:
            edge_l, edge_r = from_right, from_left
        else:
            raise ValueError(
                f"reflect halo with W shard ({w_local}) == pad ({pad}) > 1 "
                f"needs columns from two shards; use fewer devices on W"
            )
    else:  # zeros
        edge_l = jnp.zeros_like(from_left)
        edge_r = jnp.zeros_like(from_right)
    is_first = (idx == 0)
    is_last = (idx == n - 1)
    left = jnp.where(is_first, edge_l, from_left)
    right = jnp.where(is_last, edge_r, from_right)
    return jnp.concatenate([left, x, right], axis=3)


def conv3d_ndhwc(
    p: Params,
    x: jnp.ndarray,
    causal: bool = True,
    spatial_mode: str = "reflect",
    temporal_mode: str = "replicate",
    stride: tuple = (1, 1, 1),
    w_halo_axis: str = None,
) -> jnp.ndarray:
    """3D conv over channels-last (B, T, H, W, C) with VAE padding rules.

    p['weight'] is (outC, inC, kT, kH, kW); p['bias'] is (outC,).
    Kernel is assumed cubic with padding k//2 spatially (k=3 everywhere in
    the VAE; k=1 works too).

    temporal_mode: 'replicate' (VAE: causal front-replicate or symmetric
    replicate) or 'zeros' (upscalers: plain symmetric zero padding).
    stride: (sT, sH, sW) — the full-VAE compress_* blocks use strided
    causal convs (reference encoder.py:61-101); default is unstrided.
    w_halo_axis: mesh axis name when running inside shard_map with the W
    dim sharded over it — W padding becomes an explicit neighbor halo
    exchange (_pad_w_halo) instead of local padding; requires sW == 1.
    """
    w = p["weight"]
    k = w.shape[2]
    pad = k // 2
    s_t, s_h, s_w = stride

    if pad > 0:
        if w_halo_axis is not None:
            if s_w != 1:
                raise ValueError("w_halo_axis requires W stride 1")
            x = jnp.pad(
                x,
                [(0, 0), (0, 0), (pad, pad), (0, 0), (0, 0)],
                mode=spatial_mode if spatial_mode != "zeros" else "constant",
            )
            x = _pad_w_halo(x, w_halo_axis, pad, spatial_mode)
        else:
            x = jnp.pad(
                x,
                [(0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)],
                mode=spatial_mode if spatial_mode != "zeros" else "constant",
            )

    t_pad = k - 1
    if t_pad > 0:
        t_mode = "edge" if temporal_mode == "replicate" else "constant"
        if causal:
            x = jnp.pad(x, [(0, 0), (t_pad, 0), (0, 0), (0, 0), (0, 0)], mode=t_mode)
        else:
            before = t_pad // 2
            after = t_pad - before
            x = jnp.pad(x, [(0, 0), (before, after), (0, 0), (0, 0), (0, 0)], mode=t_mode)

    # (outC, inC, kT, kH, kW) -> (kT, kH, kW, inC, outC)
    rhs = w.transpose(2, 3, 4, 1, 0).astype(x.dtype)
    # fp32 inputs use HIGHEST precision: DEFAULT lowers to bf16 multiplies on
    # the MXU (~1% error), which would silently degrade the fp32 VAE path.
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    # Execute as kT 2D convolutions over temporal taps: XLA's TPU 2D-conv
    # tiling beats its 3D lowering ~1.5x at VAE shapes (measured 99 vs 66
    # TFLOP/s on v5e). Numerically identical modulo fp accumulation order.
    b, tp, hp, wp, c = x.shape
    t_out = (tp - (k - 1) - 1) // s_t + 1 if k > 1 else (tp - 1) // s_t + 1
    out = None
    for kt in range(k):
        xs = jax.lax.slice_in_dim(x, kt, kt + (t_out - 1) * s_t + 1, axis=1, stride=s_t)
        xs = xs.reshape(b * t_out, hp, wp, c)
        o = jax.lax.conv_general_dilated(
            xs,
            rhs[kt],
            window_strides=(s_h, s_w),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        out = o if out is None else out + o
    out = out.reshape(b, t_out, out.shape[1], out.shape[2], out.shape[3])
    bias = p.get("bias")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def to_ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return x.transpose(0, 2, 3, 4, 1)


def from_ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, C, T, H, W)."""
    return x.transpose(0, 4, 1, 2, 3)
