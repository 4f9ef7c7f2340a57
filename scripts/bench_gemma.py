#!/usr/bin/env python
"""On-chip Gemma-3 12B text-encoding benchmark (fp8 serving).

Validates SURVEY hard-part #3 at real scale: the full 48-layer Gemma-3 12B
forward (40 sliding + 8 full attention, GQA 16/8, all-49-hidden-states
output) in fp8 serving mode on ONE v5e chip — impossible at the reference's
fp32 (48 GB). Weights are random (one layer initialized, fp8-quantized,
tiled 48x on device: compute cost identical to real weights).

Prints a JSON line with wall-clock, analytic FLOPs, and achieved TFLOP/s.
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SEQ_LEN = 1024


def main():
    from ltx2_tpu.loader.fp8 import quantize_params_fp8
    from ltx2_tpu.models.text_encoder.gemma3 import (
        Gemma3Config,
        gemma3_apply,
        init_gemma3,
    )
    from ltx2_tpu.utils.flops import gemma_encode_flops, mfu_report

    # vocab shrunk for the benchmark: the 262k-row embedding table is 2 GB
    # of HBM but zero matmul FLOPs (a gather); layer compute is identical.
    # Real serving uses fp8 layers + bf16 embeddings = ~12.8 GB, which fits
    # the 16 GB chip only without benchmark-harness duplicates.
    cfg = Gemma3Config(compute_dtype="bfloat16", vocab_size=32768)

    # Init ONE layer + quantize + tile to 48 on device (peak HBM ~ fp8
    # weights + one bf16 layer, same trick as bench.py's DiT).
    one_cfg = dataclasses.replace(cfg, num_hidden_layers=1, layer_types=("sliding_attention",))
    one = jax.jit(lambda k: init_gemma3(k, one_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    one_q = jax.jit(quantize_params_fp8)(one)
    jax.block_until_ready(one_q)
    layers = jax.jit(
        lambda t: jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, cfg.num_hidden_layers, axis=0), t
        )
    )(one_q["layers"])
    params = {
        "embed_tokens": one_q["embed_tokens"],  # bf16 (skip-marker: embed)
        "layers": layers,
        "norm": one_q["norm"],
    }
    jax.block_until_ready(params)
    import gc

    del one, one_q, layers
    gc.collect()

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, SEQ_LEN)), jnp.int32)
    mask = jnp.ones((1, SEQ_LEN), jnp.int32)

    fwd = jax.jit(lambda p, i, m: gemma3_apply(p, cfg, i, attention_mask=m)[1])

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    sync(fwd(params, ids, mask))  # compile
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        sync(fwd(params, ids, mask))
    sec = (time.perf_counter() - t0) / n

    flops = gemma_encode_flops(cfg, SEQ_LEN)
    hbm = jax.devices()[0].memory_stats() or {}
    print(json.dumps({
        "metric": "gemma3_12b_encode_sec_1024_tokens_fp8",
        "seconds": round(sec, 4),
        **mfu_report(flops, sec),
        "hbm_gb": round(hbm.get("bytes_in_use", 0) / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
