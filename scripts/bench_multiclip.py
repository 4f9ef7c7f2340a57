"""Multi-clip serving throughput on the real TPU.

Measures the distilled denoise loop (fp8-serving full-width 48-block DiT,
rows=1 per clip) at batch sizes 1/2/4 for two clip shapes:

- flagship 768x512x121f (6,144 tokens/clip): compute-bound — batching is
  expected to be roughly throughput-neutral (STATUS.md).
- short-clip 512x320x57f (1,280 tokens/clip): per-step weight reads
  (13 GB fp8) dominate at small token counts, so batching amortizes HBM
  traffic and should raise clips/sec.

Timing discipline (tunneled TPU): each measurement jits the WHOLE loop,
runs it once to compile, then times a fresh run synced by a scalar
reduction — never a full-frame host transfer (docs/SERVING.md).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8],
                    help="batch sizes to measure (capped per shape by HBM)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ltx2_tpu.components import (
        CFGGuider,
        DISTILLED_SIGMA_VALUES,
        GaussianNoiser,
        VideoLatentPatchifier,
    )
    from ltx2_tpu.conditioning.tools import VideoLatentTools
    from ltx2_tpu.loader.fp8 import quantize_params_fp8
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )
    from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
    from ltx2_tpu.types import VideoLatentShape, VideoPixelShape

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32, attention_head_dim=128,
        in_channels=128, out_channels=128, num_layers=48,
        cross_attention_dim=4096, caption_channels=None,
        compute_dtype="bfloat16", remat=False,
    )
    one = jax.jit(
        lambda k: init_ltx_model(k, dataclasses.replace(cfg, num_layers=1))
    )(jax.random.PRNGKey(0))
    one_q = jax.jit(quantize_params_fp8)(one)
    jax.block_until_ready(one_q)
    stacked = jax.jit(
        lambda b: jax.tree_util.tree_map(lambda x: jnp.repeat(x, 48, axis=0), b)
    )(one_q["transformer_blocks"])
    dit_params = dict(one_q)
    dit_params["transformer_blocks"] = stacked
    jax.block_until_ready(dit_params)

    loop = make_video_denoise_loop(
        cfg, DenoiseLoopConfig(guider=CFGGuider(1.0), uniform_timesteps=True)
    )
    sigmas = jnp.asarray(DISTILLED_SIGMA_VALUES[: args.steps + 1], jnp.float32)

    # Flagship B=4 does not fit: 13 GB fp8 weights + 4x activations > 16 GB.
    shapes = {
        "768x512x121f (6144 tok)": ((121, 512, 768), 2),
        "512x320x57f (1280 tok)": ((57, 320, 512), 8),
    }
    results = {}
    for label, ((frames, height, width), max_b) in shapes.items():
        for b in [x for x in args.batches if x <= max_b]:
            pixel = VideoPixelShape(
                batch=b, frames=frames, height=height, width=width, fps=24.0
            )
            latent_shape = VideoLatentShape.from_pixel_shape(
                pixel, latent_channels=128
            )
            tools = VideoLatentTools(
                patchifier=VideoLatentPatchifier(1),
                target_shape=latent_shape, fps=24.0,
            )
            state = GaussianNoiser()(
                jax.random.PRNGKey(2),
                tools.create_initial_state(dtype=jnp.bfloat16), 1.0,
            )
            ctx = jax.random.normal(
                jax.random.PRNGKey(3), (b, 1024, 4096), jnp.bfloat16
            )
            out = loop(dit_params, state, sigmas, ctx, ctx)  # compile
            sync(out.latent)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = loop(dit_params, state, sigmas, ctx, ctx)
                sync(out.latent)
                best = min(best, time.perf_counter() - t0)
            per_clip = best / b
            clips_per_s = b / best
            results[(label, b)] = (best, per_clip, clips_per_s)
            print(
                f"{label}  B={b}: {best:.3f} s/loop, {per_clip:.3f} s/clip, "
                f"{clips_per_s:.3f} clips/s", flush=True,
            )

    print("\nsummary:")
    bases = {}
    for (label, b), (_, _, cps) in results.items():
        bases.setdefault(label, (b, cps))
    for (label, b), (total, per_clip, cps) in results.items():
        b0, base = bases[label]
        print(f"  {label} B={b}: {cps:.3f} clips/s ({cps / base:.2f}x vs B={b0})")


if __name__ == "__main__":
    main()
