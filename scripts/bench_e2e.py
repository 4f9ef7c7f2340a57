"""End-to-end generation benchmark on real TPU (BASELINE north star:
p50 seconds per 768x512x121f clip).

Runs the REAL production configuration with random weights: full-width
48-block DiT in fp8 serving mode driving the jitted 8-step distilled
denoise loop (no CFG, rows=1), then the full VAE decode — the same code
path `scripts/generate.py --pipeline distilled` uses for its second stage.
Weights are random (no checkpoints in this environment); compute cost is
identical to real weights.

Reference baseline: ~2 min for a 512x768x65f 8-step distilled clip on an
M3 Max (reference docs/USAGE.md:310-315) — fewer frames than this config.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=121)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import dataclasses

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
    from ltx2_tpu.models.video_vae.chunking import decode_latent
    from ltx2_tpu.models.video_vae.decoder import (
        VideoDecoderConfig,
        init_video_decoder,
    )
    from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
    from ltx2_tpu.types import VideoLatentShape, VideoPixelShape

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    # ---- Full-width DiT, fp8 serving (one block init -> quantize -> tile).
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

    # ---- State + schedule (distilled: no CFG, rows=1).
    pixel = VideoPixelShape(batch=1, frames=args.frames,
                            height=args.height, width=args.width, fps=24.0)
    latent_shape = VideoLatentShape.from_pixel_shape(pixel, latent_channels=128)
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(1), target_shape=latent_shape, fps=24.0
    )
    state = GaussianNoiser()(
        jax.random.PRNGKey(2), tools.create_initial_state(dtype=jnp.bfloat16), 1.0
    )
    sigmas = jnp.asarray(DISTILLED_SIGMA_VALUES[: args.steps + 1], jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 1024, 4096), jnp.bfloat16)

    loop = make_video_denoise_loop(
        cfg,
        DenoiseLoopConfig(guider=CFGGuider(1.0), uniform_timesteps=True),
    )

    # Phase 1: denoise loop (13 GB fp8 DiT resident).
    out = loop(dit_params, state, sigmas, ctx, ctx)  # compile
    sync(out.latent)
    t0 = time.perf_counter()
    out = loop(dit_params, state, sigmas, ctx, ctx)
    sync(out.latent)
    loop_s = time.perf_counter() - t0
    latent_5d = tools.unpatchify(out).latent

    # Release the DiT before decode — 13 GB weights + decoder workspace
    # don't fit 16 GB together; sequential residency is the reference's own
    # single-accelerator strategy (SURVEY.md §2.12 "sequential load/unload").
    del dit_params, stacked, one_q, one, out
    import gc

    gc.collect()

    # ---- Decoder initialized only now (sequential residency: the 13 GB
    # DiT and the decoder never coexist on the 16 GB chip).
    dec_cfg = VideoDecoderConfig(compute_dtype="bfloat16")
    dec_params = jax.jit(
        lambda k: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), init_video_decoder(k, dec_cfg)
        )
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(dec_params)

    def decode():
        return decode_latent(
            latent_5d, dec_params, dec_cfg, key=jax.random.PRNGKey(4),
            temporal_chunk_size=7, to_host=False,
        )

    sync(decode())  # compile
    t0 = time.perf_counter()
    video = decode()
    sync(video)
    dec_s = time.perf_counter() - t0

    n_steps = sigmas.shape[0] - 1
    print(
        f"e2e {args.width}x{args.height}x{args.frames}f on one v5e: "
        f"{n_steps}-step denoise {loop_s:.2f}s + VAE decode {dec_s:.2f}s "
        f"= {loop_s + dec_s:.2f}s on-device"
    )
    print(f"output: {video.shape} {video.dtype}")


if __name__ == "__main__":
    main()
