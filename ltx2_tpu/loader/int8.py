"""int8 W8A8 serving quantization (opt-in, beyond the reference).

The reference's only quantized serving mode is fp8-E4M3 weights dequantized
into bf16 matmuls (fp8_loader.py) — the MXU still runs at bf16 throughput.
The v5e's int8 MXU path is 2x bf16 peak; measured on the chip
(scripts/bench_int8.py), the full 48-block DiT step at 6144 tokens runs
0.954 s int8 vs 1.238 s fp8-serving (184.9 vs 142.6 achieved TF/s — a
1.30x step speedup; the gap to 2x is the non-matmul residue plus the
per-token quantize chain). This module supplies the serving recipe:

- weights: symmetric per-OUT-CHANNEL int8 (one f32 scale per output row;
  per (layer, row) for the stacked transformer_blocks layout), quantized
  once at load;
- activations: symmetric per-TOKEN dynamic int8, quantized inside the
  jitted forward right before each matmul (ops/common.linear).

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
import numpy as np

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


def int8_eligible(tree_key: str) -> bool:
    """Whether a '.'-joined param-tree path names a matmul weight the W8A8
    recipe quantizes (the same predicate quantize_params_int8 applies to an
    in-memory tree, exposed for the streaming loader's at-load path)."""
    return (
        tree_key.endswith(".weight")
        and any(t in tree_key for t in _INT8_TARGETS)
        and not any(m in tree_key for m in _SKIP_MARKERS)
    )


def quantize_array_int8(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) twin of quantize_tensor_int8, used by the
    streaming loader so the 19B checkpoint quantizes one stacked leaf at a
    time — device HBM only ever holds the int8 tree, never the bf16 one.
    Must stay formula-identical to quantize_tensor_int8."""
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=-1)
    scale = np.maximum(amax / INT8_MAX, 1e-12).astype(np.float32)
    # Explicit f32 reciprocal-multiply, NOT division: XLA strength-reduces
    # w/scale to w*(1/scale) inside jit, so the host twin must do the same
    # multiply to stay bit-identical at round-half boundaries.
    q = np.clip(
        np.round(wf * (np.float32(1.0) / scale)[..., None]),
        -INT8_MAX, INT8_MAX,
    )
    return q.astype(np.int8), scale


def quantize_tensor_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-out-channel int8 quantization -> (w_q, cscale).

    w is [out, in] (2-dim) or layer-stacked [L, out, in] (3-dim); the scale
    reduces over the LAST (contraction) axis only, giving one scale per
    output channel: cscale shape (out,) or (L, out)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    scale = jnp.maximum(amax / INT8_MAX, 1e-12).astype(jnp.float32)
    # Reciprocal-multiply to match the host twin (quantize_array_int8)
    # bit-for-bit; see the comment there.
    q = jnp.clip(jnp.round(wf * (1.0 / scale)[..., None]), -INT8_MAX, INT8_MAX)
    return q.astype(jnp.int8), scale


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
