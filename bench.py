"""Benchmark: DiT denoise step time on real TPU hardware.

Measures the hot loop (SURVEY.md §3.2: the 48-block DiT forward is ~95% of
generation compute) at full LTX-2 width (32 heads x 128 d = 4096 inner,
FFN 16384, cross-attn 4096) in bf16 on the 768x512x121-frame flagship
config (BASELINE.json north star). A single v5e chip cannot hold all 48
blocks (~26 GB bf16), so we time a 12-block stack and scale linearly to 48
— block times are uniform (identical shapes), making the extrapolation
exact up to one-off overheads, which we also measure and include.

Baseline comparison: the reference generates 512x768x65f in ~2 min for 8
distilled steps on an M3 Max (docs/USAGE.md:310-315) => ~15 s per full
48-block step at 3072 video tokens. We report our extrapolated full-model
sec/step at 6144 tokens (121 frames, 2x the baseline's token count) and
vs_baseline = reference_sec_per_step * 2 (token scaling) / ours.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BLOCKS_MEASURED = 12
FULL_BLOCKS = 48
# 768x512, 121 frames -> latent 24x16x16 = 6144 tokens.
TOKENS_F, TOKENS_H, TOKENS_W = 16, 16, 24
TEXT_TOKENS = 1024
# Reference: ~2 min / 8 steps at 3072 tokens (65f@512x768) on M3 Max =>
# ~15 s/step; our config has 2x the tokens (attention superlinear, matmuls
# linear) — use the conservative linear 2x for the baseline estimate.
REFERENCE_SEC_PER_STEP_6144_TOKENS = 30.0


def main():
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        Modality,
        init_ltx_model,
        x0_model_apply,
    )
    from ltx2_tpu.ops.rope import create_position_grid

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32,
        attention_head_dim=128,
        in_channels=128,
        out_channels=128,
        num_layers=BLOCKS_MEASURED,
        cross_attention_dim=4096,
        caption_channels=None,  # V2-style direct context (4096)
        compute_dtype="bfloat16",
        remat=False,
    )

    init = jax.jit(lambda k: init_ltx_model(k, cfg))
    params = init(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    batch = 1  # distilled (no CFG) flagship config
    n_tokens = TOKENS_F * TOKENS_H * TOKENS_W
    grid = create_position_grid(batch, TOKENS_F, TOKENS_H, TOKENS_W).astype(jnp.float32)
    positions = jnp.stack([grid, grid + 1], axis=-1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    modality = Modality(
        latent=jax.random.normal(k1, (batch, n_tokens, 128), jnp.bfloat16),
        context=jax.random.normal(k2, (batch, TEXT_TOKENS, 4096), jnp.bfloat16),
        context_mask=None,
        timesteps=jnp.full((batch,), 0.7, jnp.float32),
        positions=positions,
        sigma=jnp.full((batch,), 0.7, jnp.float32),
    )

    step = jax.jit(lambda p, m: x0_model_apply(p, cfg, video=m))

    # Warmup / compile. Force a device->host transfer to synchronize —
    # block_until_ready alone does not drain the tunneled backend's queue.
    import numpy as np

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    sync(step(params, modality))

    iters = 5
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += sync(step(params, modality))
    measured = (time.perf_counter() - t0) / iters
    assert acc == acc, "non-finite benchmark output"

    full_step = measured * (FULL_BLOCKS / BLOCKS_MEASURED)
    vs_baseline = REFERENCE_SEC_PER_STEP_6144_TOKENS / full_step

    print(
        json.dumps(
            {
                "metric": "dit_sec_per_step_768x512x121f_bf16_48blocks_extrapolated",
                "value": round(full_step, 4),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
