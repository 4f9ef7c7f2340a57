"""Benchmark: DiT denoise step time on real TPU hardware.

Measures the hot loop (SURVEY.md §3.2: the 48-block DiT forward is ~95% of
generation compute) at full LTX-2 width (32 heads x 128 d = 4096 inner,
FFN 16384, cross-attn 4096) on the 768x512x121-frame flagship config
(BASELINE.json north star, 6144 video tokens + 1024 text tokens).

Primary mode: ALL 48 blocks with fp8-E4M3 weights dequantized at use
(~13 GB weights — the serving configuration that fits a single 16 GB v5e
chip; reference fp8 checkpoints use the same format). Falls back to a
12-block bf16 stack linearly extrapolated to 48 if the fp8 run cannot fit.

Baseline: the reference generates 512x768x65f in ~2 min for 8 distilled
steps on an M3 Max (docs/USAGE.md:310-315) => ~15 s per full 48-block step
at 3072 tokens; our config has 2x the tokens, so the scaled reference
estimate is ~30 s/step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

FULL_BLOCKS = 48
FALLBACK_BLOCKS = 12
TOKENS_F, TOKENS_H, TOKENS_W = 16, 16, 24
TEXT_TOKENS = 1024
REFERENCE_SEC_PER_STEP_6144_TOKENS = 30.0


def make_model(num_layers: int, fp8: bool):
    from ltx2_tpu.loader.fp8 import quantize_params_fp8
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
        num_layers=num_layers,
        cross_attention_dim=4096,
        caption_channels=None,
        compute_dtype="bfloat16",
        remat=False,
    )
    if fp8:
        # Init ONE block, quantize, then tile to num_layers on device — peak
        # HBM stays ~(weights_fp8 + one bf16 block) instead of a full bf16
        # model that would never fit alongside its own fp8 copy.
        import dataclasses

        small_cfg = dataclasses.replace(cfg, num_layers=1)
        one = jax.jit(lambda k: init_ltx_model(k, small_cfg))(jax.random.PRNGKey(0))
        one_q = jax.jit(quantize_params_fp8)(one)
        jax.block_until_ready(one_q)

        blocks = one_q["transformer_blocks"]
        stacked = jax.jit(
            lambda b: jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, num_layers, axis=0), b
            )
        )(blocks)
        params = dict(one_q)
        params["transformer_blocks"] = stacked
        jax.block_until_ready(params)
        return cfg, params
    params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return cfg, params


def make_modality(cfg):
    from ltx2_tpu.models.transformer.model import Modality
    from ltx2_tpu.ops.rope import create_position_grid

    n = TOKENS_F * TOKENS_H * TOKENS_W
    grid = create_position_grid(1, TOKENS_F, TOKENS_H, TOKENS_W).astype(jnp.float32)
    positions = jnp.stack([grid, grid + 1], axis=-1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return Modality(
        latent=jax.random.normal(k1, (1, n, 128), jnp.bfloat16),
        context=jax.random.normal(k2, (1, TEXT_TOKENS, 4096), jnp.bfloat16),
        context_mask=None,
        timesteps=jnp.full((1,), 0.7, jnp.float32),
        positions=positions,
        sigma=jnp.full((1,), 0.7, jnp.float32),
    )


def timed_step(cfg, params, modality, iters=5):
    from ltx2_tpu.models.transformer.model import x0_model_apply

    step = jax.jit(lambda p, m: x0_model_apply(p, cfg, video=m))

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    sync(step(params, modality))  # warmup/compile; forces queue drain
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += sync(step(params, modality))
    assert acc == acc, "non-finite benchmark output"
    return (time.perf_counter() - t0) / iters


def main():
    try:
        cfg, params = make_model(FULL_BLOCKS, fp8=True)
        modality = make_modality(cfg)
        step_time = timed_step(cfg, params, modality)
        metric = "dit_sec_per_step_768x512x121f_fp8_48blocks_measured"
    except Exception:
        cfg, params = make_model(FALLBACK_BLOCKS, fp8=False)
        modality = make_modality(cfg)
        measured = timed_step(cfg, params, modality)
        step_time = measured * (FULL_BLOCKS / FALLBACK_BLOCKS)
        metric = "dit_sec_per_step_768x512x121f_bf16_48blocks_extrapolated"

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(step_time, 4),
                "unit": "s",
                "vs_baseline": round(REFERENCE_SEC_PER_STEP_6144_TOKENS / step_time, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
