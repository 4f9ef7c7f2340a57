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


def snr_walk(cfg, block_bf16, block_int8, video_args, blocks: int):
    """Jitted lockstep walk: two hidden-state chains through `blocks`
    applications of the SAME transformer block — one with the bf16 weights,
    one with their int8-quantized twins — emitting the per-block activation
    SNR (dB) of the quantized chain against the reference chain. Measures
    ACCUMULATED quantization error through depth, not per-layer error in
    isolation (the thing that decides whether --int8 damages pixels)."""
    from ltx2_tpu.models.transformer.blocks import av_block_apply

    vcfg = cfg.video_stream_config()

    @jax.jit
    def walk(bp, qp, va):
        def body(carry, _):
            ref, q = carry
            r_out, _ = av_block_apply(
                bp, va.replace(x=ref), None, vcfg, None,
                rope_type=cfg.rope_type, norm_eps=cfg.norm_eps,
            )
            q_out, _ = av_block_apply(
                qp, va.replace(x=q), None, vcfg, None,
                rope_type=cfg.rope_type, norm_eps=cfg.norm_eps,
            )
            num = jnp.sum(r_out.x.astype(jnp.float32) ** 2)
            den = jnp.sum((r_out.x - q_out.x).astype(jnp.float32) ** 2)
            snr_db = 10.0 * jnp.log10(num / jnp.maximum(den, 1e-30))
            return (r_out.x, q_out.x), snr_db

        _, snrs = jax.lax.scan(body, (va.x, va.x), None, length=blocks)
        return snrs

    return walk(block_bf16, block_int8, video_args)


def snr_report(blocks: int = 48, tokens: int = TOKENS, heads: int = 32,
               head_dim: int = 128):
    """int8-vs-bf16 activation-SNR budget through the DiT depth
    (VERDICT r4 #6): the quality gate that real weights will need. With
    the bench's tiled random weights every block IS one block, so a single
    bf16 block + its int8 twin walk the full depth; on a real checkpoint
    the same walk streams per-block weight pairs (weights-gated — see
    STATUS.md). Reference quality bar for comparison: the reference ships
    fp8 (per-stage Pearson 0.954-0.997, its docs/PARITY.md:61-91); int8
    promotion additionally needs this SNR profile to stay high through
    all 48 blocks AND a real-weight visual check."""
    import dataclasses

    from ltx2_tpu.loader.int8 import quantize_params_int8
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        Modality,
        init_ltx_model,
        prepare_stream_args,
    )
    from ltx2_tpu.ops.rope import create_position_grid

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=heads,
        attention_head_dim=head_dim,
        in_channels=128,
        out_channels=128,
        num_layers=blocks,
        cross_attention_dim=heads * head_dim,
        caption_channels=None,
        compute_dtype="bfloat16",
        remat=False,
    )
    one_cfg = dataclasses.replace(cfg, num_layers=1)
    one = jax.jit(lambda k: init_ltx_model(k, one_cfg))(jax.random.PRNGKey(0))
    one_q = jax.jit(quantize_params_int8)(one)
    jax.block_until_ready((one, one_q))
    unstack = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)  # noqa: E731
    block_bf16 = unstack(one["transformer_blocks"])
    block_int8 = unstack(one_q["transformer_blocks"])

    f, h = 2, 2
    w = max(1, tokens // (f * h))
    n = f * h * w
    grid = create_position_grid(1, f, h, w).astype(jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    modality = Modality(
        latent=jax.random.normal(k1, (1, n, 128), jnp.bfloat16),
        context=jax.random.normal(
            k2, (1, 64, cfg.cross_attention_dim), jnp.bfloat16
        ),
        context_mask=None,
        timesteps=jnp.full((1,), 0.7, jnp.float32),
        positions=jnp.stack([grid, grid + 1], axis=-1),
        sigma=jnp.full((1,), 0.7, jnp.float32),
    )
    video_args, _, _, _ = prepare_stream_args(one, one_cfg, video=modality)

    snrs = np.asarray(snr_walk(cfg, block_bf16, block_int8, video_args, blocks))
    return {
        "per_block_activation_snr_db": [round(float(s), 2) for s in snrs],
        "first_block_snr_db": round(float(snrs[0]), 2),
        "final_block_snr_db": round(float(snrs[-1]), 2),
        "min_snr_db": round(float(snrs.min()), 2),
        "blocks": blocks,
        "tokens": n,
        "note": (
            "accumulated int8-vs-bf16 error through depth on random "
            "weights; real-weight SNR + visual check remain the gate for "
            "promoting --int8 past opt-in"
        ),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--snr-report", action="store_true",
                    help="per-block int8-vs-bf16 activation SNR through "
                         "the DiT depth (quality budget artifact)")
    ap.add_argument("--blocks", type=int, default=48)
    ap.add_argument("--tokens", type=int, default=TOKENS)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()

    if args.snr_report:
        print(json.dumps(snr_report(
            blocks=args.blocks, tokens=args.tokens,
            heads=args.heads, head_dim=args.head_dim,
        )))
        return

    out = {"matmul_chain_6144x4096x4096": bench_matmul_chain()}
    out["dit_step_48blk_6144tok_fp8"] = bench_dit_step(fp8=True, int8=False)
    out["dit_step_48blk_6144tok_int8"] = bench_dit_step(fp8=False, int8=True)
    fp8_s = out["dit_step_48blk_6144tok_fp8"]["seconds"]
    int8_s = out["dit_step_48blk_6144tok_int8"]["seconds"]
    out["int8_speedup_vs_fp8"] = round(fp8_s / int8_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
