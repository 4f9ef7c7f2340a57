"""TPU-native 3D convolution for the causal video VAE.

The reference implements conv3d as a sum of kT separate 2D convolutions —
an MLX missing-op workaround (simple_decoder.py:62-180). On TPU we use one
real `lax.conv_general_dilated` in channels-last NDHWC layout (XLA tiles it
onto the MXU directly).

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


def conv3d_ndhwc(
    p: Params,
    x: jnp.ndarray,
    causal: bool = True,
    spatial_mode: str = "reflect",
    temporal_mode: str = "replicate",
) -> jnp.ndarray:
    """3D conv over channels-last (B, T, H, W, C) with VAE padding rules.

    p['weight'] is (outC, inC, kT, kH, kW); p['bias'] is (outC,).
    Kernel is assumed cubic with padding k//2 spatially (k=3 everywhere in
    the VAE; k=1 works too).

    temporal_mode: 'replicate' (VAE: causal front-replicate or symmetric
    replicate) or 'zeros' (upscalers: plain symmetric zero padding).
    """
    w = p["weight"]
    k = w.shape[2]
    pad = k // 2

    if pad > 0:
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
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )
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
