"""int8 W8A8 serving quantization (opt-in, beyond the reference).

The reference's only quantized serving mode is fp8-E4M3 weights dequantized
into bf16 matmuls (fp8_loader.py) — the MXU still runs at bf16 throughput.
The v5e's int8 MXU path is 2x bf16 peak, and a measured output-feeds-input
chain at the DiT's matmul shapes shows 246 TF/s int8 vs 151 TF/s bf16
(scripts/bench_int8.py). This module supplies the serving recipe:

- weights: symmetric per-OUT-CHANNEL int8 (one f32 scale per output row;
  per (layer, row) for the stacked transformer_blocks layout), quantized
  once at load;
- activations: symmetric per-TOKEN dynamic int8, quantized inside the
  jitted forward right before each matmul (ops/common.linear) — the
  max/round/cast fuses into the operand load and measures free on-chip.

Scale leaves are named `weight_cscale` (channel scale) — deliberately NOT
`weight_scale`, which is the fp8 per-tensor convention with different
broadcasting and its own training guards.

Accuracy: per-token dynamic quantization is the standard W8A8 serving
recipe; on the 48-block DiT with random weights the quantized forward
correlates >0.999 with bf16 (tests/test_int8.py). Real-weight perceptual
impact is unverifiable in this environment (no checkpoints) — hence opt-in
(`generate.py --int8`), never the default.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ltx2_tpu.ops.common import Params

INT8_MAX = 127.0

# Matmul weights worth quantizing: the projection/FFN linears that carry
# ~95% of DiT weight FLOPs. Norm weights, AdaLN tables, biases, embeddings,
# and the tiny per-head gate projection stay in their original dtype.
_INT8_TARGETS = (
    "to_q",
    "to_k",
    "to_v",
    "to_out",
    "project_in",
    "project_out",
    "w_up",
    "w_gate",
    "w_down",
)
_SKIP_MARKERS = ("norm", "scale_shift_table", "adaln", "embed", "to_gate_logits")


def quantize_tensor_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-out-channel int8 quantization -> (w_q, cscale).

    w is [out, in] (2-dim) or layer-stacked [L, out, in] (3-dim); the scale
    reduces over the LAST (contraction) axis only, giving one scale per
    output channel: cscale shape (out,) or (L, out)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    scale = jnp.maximum(amax / INT8_MAX, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None]), -INT8_MAX, INT8_MAX)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_params_int8(params: Params, path: str = "") -> Params:
    """Walk a param tree quantizing eligible matmul `weight` leaves to int8
    (returns a new tree). Adds `weight_cscale` next to each quantized leaf;
    ops/common.linear dispatches on the int8 dtype at trace time."""
    if "weight_scale" in params:
        raise ValueError(
            "int8 quantization of an fp8-kept tree (weight_scale present) "
            f"at '{path}': load dequantized (keep_fp8=False) before --int8"
        )
    out: Params = {}
    for key, value in params.items():
        sub_path = f"{path}/{key}" if path else key
        if isinstance(value, dict):
            out[key] = quantize_params_int8(value, sub_path)
        elif isinstance(value, list):
            out[key] = [
                quantize_params_int8(v, sub_path) if isinstance(v, dict) else v
                for v in value
            ]
        elif (
            key == "weight"
            and hasattr(value, "ndim")
            and value.ndim in (2, 3)
            and jnp.issubdtype(value.dtype, jnp.floating)
            and any(t in sub_path for t in _INT8_TARGETS)
            and not any(m in sub_path for m in _SKIP_MARKERS)
        ):
            q, cscale = quantize_tensor_int8(value)
            out[key] = q
            out["weight_cscale"] = cscale
        else:
            out[key] = value
    return out
