"""fp8-E4M3 quantization utilities for serving.

Beyond the reference's dequantize-on-load (fp8_loader.py), this module
supports KEEPING weights quantized in HBM with per-tensor scales and
dequantizing at use inside the jitted forward (ops/common.linear). On a
16 GB v5e this is what fits the full 48-block 19B DiT on a single chip,
and it halves weight-read bandwidth in the bandwidth-bound blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ltx2_tpu.ops.common import Params

FP8_MAX = 448.0  # E4M3FN max normal

# Leaves eligible for quantization: large matmul weights. Norm weights,
# AdaLN tables, biases, and embeddings stay in their original dtype.
_QUANT_LEAF = "weight"
_SKIP_MARKERS = ("norm", "scale_shift_table", "adaln", "embed")


def quantize_tensor_fp8(
    w: jnp.ndarray, per_leading_axis: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric fp8-E4M3 quantization -> (w_fp8, scale).

    per_leading_axis: one scale per index of axis 0 (the stacked-block
    layout — matches the reference checkpoints' per-block per-tensor
    scales)."""
    wf = w.astype(jnp.float32)
    if per_leading_axis:
        axes = tuple(range(1, wf.ndim))
        amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(wf))
    scale = jnp.maximum(amax / FP8_MAX, 1e-12)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def quantize_params_fp8(params: Params, path: str = "") -> Params:
    """Walk a param tree quantizing eligible `weight` leaves in place-style
    (returns a new tree). Adds `weight_scale` next to each quantized leaf."""
    # Guards mirroring int8.quantize_params_int8 (review r4: missing here):
    # re-quantizing an already-quantized tree treats raw codes as values.
    if "weight_scale" in params or "weight_cscale" in params:
        raise ValueError(
            "fp8 quantization of an already-quantized tree "
            f"(weight_scale/weight_cscale present) at '{path}': load "
            "dequantized first"
        )
    out: Params = {}
    for key, value in params.items():
        sub_path = f"{path}/{key}" if path else key
        if isinstance(value, dict):
            out[key] = quantize_params_fp8(value, sub_path)
        elif isinstance(value, list):
            out[key] = [
                quantize_params_fp8(v, sub_path) if isinstance(v, dict) else v
                for v in value
            ]
        elif (
            key == _QUANT_LEAF
            and hasattr(value, "ndim")
            and value.ndim >= 2
            and jnp.issubdtype(value.dtype, jnp.floating)
            and not any(m in sub_path for m in _SKIP_MARKERS)
        ):
            # In transformer param trees a >=3-dim `weight` is a LAYER-STACKED
            # linear (DiT transformer_blocks, Gemma layers): one scale per
            # layer, matching the reference's per-block per-tensor scales.
            # (Do not apply this util to conv trees — conv kernels are 5-dim
            # and their consumers don't dequantize.)
            q, scale = quantize_tensor_fp8(value, per_leading_axis=value.ndim >= 3)
            out[key] = q
            out["weight_scale"] = scale
        else:
            out[key] = value
    return out
