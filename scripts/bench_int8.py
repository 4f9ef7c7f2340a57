#!/usr/bin/env python
"""int8 W8A8 vs bf16 vs fp8-dequant DiT serving benchmark (one v5e chip).

Measures, on the real chip:
1. Raw MXU throughput at the DiT's dominant matmul shape (6144x4096 @
   4096x4096) for bf16, fp8-dequant-to-bf16, and int8 W8A8 — an
   output-feeds-input chain so the measurement is compute-bound, not
   HBM-bound. The v5e MXU runs int8 at 2x bf16 peak (394 vs 197 TF/s).
2. A full 48-block DiT forward step at 6144 video tokens: fp8 serving
   (the default headline path) vs int8 W8A8 (`generate.py --int8`).

Prints one JSON line with all measurements. Accuracy story (corr > 0.999
through 48 blocks) is pinned by tests/test_int8.py; this script is the
speed story for loader/int8.py's docstring and docs/SERVING.md.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

TOKENS = 6144
DIM = 4096
CHAIN = 24
STEP_ITERS = 5


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def bench_matmul_chain():
    """Output-feeds-input matmul chains at (6144, 4096) @ (4096, 4096)."""
    from ltx2_tpu.loader.fp8 import quantize_tensor_fp8
    from ltx2_tpu.loader.int8 import quantize_tensor_int8
    from ltx2_tpu.ops.common import linear

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (TOKENS, DIM), jnp.bfloat16)
    w = jax.random.normal(k2, (DIM, DIM), jnp.float32) * 0.02

    w_bf16 = {"weight": w.astype(jnp.bfloat16)}
    w_fp8_q, w_fp8_s = quantize_tensor_fp8(w)
    w_fp8 = {"weight": w_fp8_q, "weight_scale": w_fp8_s}
    w_int8_q, w_int8_s = quantize_tensor_int8(w)
    w_int8 = {"weight": w_int8_q, "weight_cscale": w_int8_s}

    results = {}
    flops = 2.0 * TOKENS * DIM * DIM * CHAIN
    for name, params in (("bf16", w_bf16), ("fp8_dequant", w_fp8),
                         ("int8_w8a8", w_int8)):
        @jax.jit
        def chain(p, x0):
            def body(carry, _):
                y = linear(p, carry)
                # renormalize so the chain neither explodes nor vanishes
                y = y * jax.lax.rsqrt(jnp.mean(
                    y.astype(jnp.float32) ** 2) + 1e-6).astype(y.dtype)
                return y, ()
            out, _ = jax.lax.scan(body, x0, None, length=CHAIN)
            return out

        sync(chain(params, x))  # compile
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(STEP_ITERS):
            acc += sync(chain(params, x))
        assert acc == acc
        sec = (time.perf_counter() - t0) / STEP_ITERS
        results[name] = {
            "seconds": round(sec, 4),
            "tflops_per_s": round(flops / sec / 1e12, 1),
        }
    return results


def make_dit(fp8: bool, int8: bool):
    import dataclasses

    from ltx2_tpu.loader.fp8 import quantize_params_fp8
    from ltx2_tpu.loader.int8 import quantize_params_int8
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32,
        attention_head_dim=128,
        in_channels=128,
        out_channels=128,
        num_layers=48,
        cross_attention_dim=4096,
        caption_channels=None,
        compute_dtype="bfloat16",
        remat=False,
    )
    # One block init + quantize + tile (bench.py's HBM trick).
    small = dataclasses.replace(cfg, num_layers=1)
    one = jax.jit(lambda k: init_ltx_model(k, small))(jax.random.PRNGKey(0))
    quant = quantize_params_fp8 if fp8 else (
        quantize_params_int8 if int8 else (lambda t: t)
    )
    one_q = jax.jit(quant)(one)
    jax.block_until_ready(one_q)
    stacked = jax.jit(
        lambda b: jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, cfg.num_layers, axis=0),
            b,
        )
    )(one_q["transformer_blocks"])
    params = dict(one_q)
    params["transformer_blocks"] = stacked
    jax.block_until_ready(params)
    return cfg, params


def bench_dit_step(fp8: bool, int8: bool):
    import gc

    from ltx2_tpu.models.transformer.model import Modality, x0_model_apply
    from ltx2_tpu.ops.rope import create_position_grid
    from ltx2_tpu.utils.flops import dit_step_flops

    cfg, params = make_dit(fp8=fp8, int8=int8)
    f, h, w = 16, 16, 24
    grid = create_position_grid(1, f, h, w).astype(jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    modality = Modality(
        latent=jax.random.normal(k1, (1, TOKENS, 128), jnp.bfloat16),
        context=jax.random.normal(k2, (1, 1024, 4096), jnp.bfloat16),
        context_mask=None,
        timesteps=jnp.full((1,), 0.7, jnp.float32),
        positions=jnp.stack([grid, grid + 1], axis=-1),
        sigma=jnp.full((1,), 0.7, jnp.float32),
    )
    step = jax.jit(lambda p, m: x0_model_apply(p, cfg, video=m))
    sync(step(params, modality))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(STEP_ITERS):
        acc += sync(step(params, modality))
    assert acc == acc
    sec = (time.perf_counter() - t0) / STEP_ITERS
    flops = dit_step_flops(cfg, TOKENS, 1024)
    del params
    gc.collect()
    return {
        "seconds": round(sec, 4),
        "achieved_tflops_per_s": round(flops / sec / 1e12, 1),
    }


def main():
    out = {"matmul_chain_6144x4096x4096": bench_matmul_chain()}
    out["dit_step_48blk_6144tok_fp8"] = bench_dit_step(fp8=True, int8=False)
    out["dit_step_48blk_6144tok_int8"] = bench_dit_step(fp8=False, int8=True)
    fp8_s = out["dit_step_48blk_6144tok_fp8"]["seconds"]
    int8_s = out["dit_step_48blk_6144tok_int8"]["seconds"]
    out["int8_speedup_vs_fp8"] = round(fp8_s / int8_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
