"""Functional NN primitives over param pytrees.

Params are nested dicts of jnp arrays whose leaf names mirror the checkpoint
layout (`weight` stored [out, in] as in safetensors — no transpose needed at
load, reference weight_converter.py:318-446). XLA lays out and fuses these;
we keep the math simple and MXU-friendly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, object]


def _w8a8_matmul(
    x: jnp.ndarray, w_q: jnp.ndarray, cscale: jnp.ndarray
) -> jnp.ndarray:
    """int8 W8A8 matmul: per-token dynamic activation quantization against
    per-out-channel int8 weights (loader/int8.py), accumulating in int32 on
    the v5e's 2x-throughput int8 MXU path.

    x max maps to exactly +/-127 (symmetric amax scaling), so no clip is
    needed. Measured on the v5e (scripts/bench_int8.py): 1.30x over
    fp8-serving on the full 48-block DiT step (184.9 vs 142.6 TF/s) — the
    per-token amax/round/cast chain costs part of the MXU's nominal 2x."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    x_q = jnp.round(xf / xscale).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * xscale * cscale.astype(jnp.float32)).astype(
        x.dtype
    )


def linear(p: Params, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """y = x @ W^T + b with W stored [out_features, in_features].

    fp8 serving: when the param dict carries a per-tensor 'weight_scale'
    (fp8-E4M3 checkpoints kept quantized in HBM), the weight dequantizes at
    use — w_eff = cast(w) * scale. Halves weight HBM and read bandwidth;
    XLA fuses the dequant into the matmul operand load.

    int8 W8A8 serving: a per-out-channel 'weight_cscale' (loader/int8.py,
    generate.py --int8) instead routes the matmul through the int8 MXU
    path with per-token dynamic activation quantization — 2x bf16 matmul
    throughput on the v5e, opt-in.
    """
    w = p["weight"]
    cscale = p.get("weight_cscale")
    if cscale is not None:
        y = _w8a8_matmul(x, w, cscale)
    else:
        scale = p.get("weight_scale")
        if scale is not None or w.dtype != x.dtype and jnp.issubdtype(w.dtype, jnp.floating):
            w = w.astype(x.dtype)
            if scale is not None:
                w = w * scale.astype(x.dtype)
        y = jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=x.dtype,
        )
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    # Runtime LoRA (training-time adapters; see training/lora.py): the
    # low-rank path y += scale * (x A^T) B^T rides alongside the frozen
    # base weight. `in` check is trace-time only — zero cost without LoRA.
    if "lora_A" in p:
        a = p["lora_A"].astype(x.dtype)
        bb = p["lora_B"].astype(x.dtype)
        y = y + jax.lax.dot_general(
            jax.lax.dot_general(
                x, a, (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=x.dtype,
            ),
            bb,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        ) * p["lora_scale"].astype(x.dtype)
    return y


def linear_row_parallel(
    p: Params, x: jnp.ndarray, tp_axis: Optional[str] = None, precision=None
) -> jnp.ndarray:
    """`linear` whose in-features (and x's matching dim) are feature-sharded
    over mesh axis `tp_axis` (Megatron row-parallel, SP x TP composition).

    The contraction over a sharded dim is ambiguous under explicit sharding,
    so the call runs under `auto_axes`: GSPMD partitions the dot, inserts
    the psum over `tp_axis`, and adds the (replicated) bias once after the
    reduction. tp_axis=None is exactly `linear`.
    """
    if tp_axis is None:
        return linear(p, x, precision)
    from jax.sharding import PartitionSpec, auto_axes

    return auto_axes(
        lambda pp, xx: linear(pp, xx, precision),
        axes=(tp_axis,),
        out_sharding=PartitionSpec(),
    )(p, x)


def init_linear(
    key: jax.Array,
    in_features: int,
    out_features: int,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """LeCun-uniform init matching common torch defaults; for tests only
    (real use loads checkpoint weights)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / (in_features**0.5)
    p: Params = {
        "weight": jax.random.uniform(
            wkey, (out_features, in_features), dtype, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(bkey, (out_features,), dtype, -bound, bound)
    return p


def rms_norm_weighted(p: Optional[Params], x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    from ltx2_tpu.core import rms_norm

    weight = p.get("weight") if p else None
    return rms_norm(x, weight, eps)


def layer_norm(p: Optional[Params], x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over last dim, fp32 accumulation; weight/bias optional."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        w = p.get("weight")
        b = p.get("bias")
        if w is not None:
            out = out * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
    return out.astype(dtype)


def group_norm(
    p: Optional[Params], x: jnp.ndarray, num_groups: int, eps: float = 1e-6
) -> jnp.ndarray:
    """GroupNorm over channel axis 1 for (B, C, ...) tensors, fp32 stats."""
    dtype = x.dtype
    b, c = x.shape[:2]
    spatial = x.shape[2:]
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, *spatial)
    axes = tuple(range(2, xf.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, *spatial)
    if p is not None:
        shape = (1, c) + (1,) * len(spatial)
        w = p.get("weight")
        bias = p.get("bias")
        if w is not None:
            out = out * w.astype(jnp.float32).reshape(shape)
        if bias is not None:
            out = out + bias.astype(jnp.float32).reshape(shape)
    return out.astype(dtype)


def pixel_norm(x: jnp.ndarray, axis: int = 1, eps: float = 1e-6) -> jnp.ndarray:
    """RMS normalization across the channel axis (VAE PixelNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=axis, keepdims=True) + eps)
    return (xf * scale).astype(dtype)


def silu_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """silu(a) * b. XLA fuses this elementwise chain into its producer matmul
    on TPU — equivalent of the reference's Metal kernel (fused_ops.py:12-92)."""
    return jax.nn.silu(a) * b


def gelu_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """gelu_tanh(a) * b (fused_ops.py:30-131)."""
    return jax.nn.gelu(a, approximate=True) * b
