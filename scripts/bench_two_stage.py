"""Two-stage recipe benchmark at the reference's headline config.

The reference's "~3 min on M3 Max" number (docs/USAGE.md:310-317) is the
TWO-STAGE recipe at 512x768x97f: a CFG stage at HALF resolution, a 2x
spatial latent upscale, then a short distilled tail at full resolution.
bench.py deliberately measures a harder workload (all 8 distilled steps at
FULL resolution); this script runs the reference's actual recipe, like for
like, with the full-width 48-block fp8-serving DiT and the full-width
spatial upscaler on random weights (compute cost identical to real
weights).

Latents only (skip_decode): the 13 GB resident DiT plus the 97-frame
decoder workspace exceed 16 GB together, and decode is measured separately
(scripts/bench_vae.py: 0.55 s for 121f — sequential residency is the
single-chip serving recipe, docs/SERVING.md).
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
    ap.add_argument("--frames", type=int, default=97)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--cfg-steps", type=int, default=30)
    ap.add_argument("--cfg-interval", type=int, default=1,
                    help="guidance reuse: uncond forward every k-th step")
    args = ap.parse_args()

    import jax.numpy as jnp

    from ltx2_tpu.loader.fp8 import quantize_params_fp8
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )
    from ltx2_tpu.models.upscaler import SpatialUpscalerConfig, init_spatial_upscaler
    from ltx2_tpu.models.video_vae.decoder import (
        VideoDecoderConfig,
        init_video_decoder,
    )
    from ltx2_tpu.pipelines.two_stage import TwoStageCFGConfig, TwoStagePipeline

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

    # Decoder params are needed only for the per-channel statistics the
    # upscale un/normalize uses; a small decoder keeps HBM for the DiT.
    dec_cfg = VideoDecoderConfig(base_channels=4)
    dec_params = jax.jit(lambda k: init_video_decoder(k, dec_cfg))(
        jax.random.PRNGKey(1)
    )
    up_cfg = SpatialUpscalerConfig()  # production width (mid 1024, 4 blocks)
    up_params = jax.jit(
        lambda k: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), init_spatial_upscaler(k, up_cfg)
        )
    )(jax.random.PRNGKey(2))
    jax.block_until_ready(up_params)

    pipeline = TwoStagePipeline(
        transformer_params=dit_params, transformer_cfg=cfg,
        video_decoder_params=dec_params, video_decoder_cfg=dec_cfg,
        spatial_upscaler_params=up_params, spatial_upscaler_cfg=up_cfg,
    )
    ts_cfg = TwoStageCFGConfig(
        height=args.height, width=args.width, num_frames=args.frames,
        num_inference_steps=args.cfg_steps,
        cfg_interval=args.cfg_interval,
        dtype="bfloat16",
    )
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 1024, 4096), jnp.bfloat16)
    neg = jax.random.normal(jax.random.PRNGKey(4), (1, 1024, 4096), jnp.bfloat16)

    # Compile pass, then timed pass (pipeline returns (video, audio)).
    video, _ = pipeline(ctx, neg, ts_cfg, skip_decode=True)
    _ = float(np.asarray(video, np.float32).sum())
    t0 = time.perf_counter()
    video, _ = pipeline(ctx, neg, ts_cfg, skip_decode=True)
    _ = float(np.asarray(video, np.float32).sum())
    total = time.perf_counter() - t0

    stage1_tokens = ((args.frames - 1) // 8 + 1) * (args.height // 64) * (args.width // 64)
    stage2_tokens = stage1_tokens * 4
    interval = f", cfg-interval {args.cfg_interval}" if args.cfg_interval > 1 else ""
    print(
        f"two-stage {args.width}x{args.height}x{args.frames}f "
        f"({args.cfg_steps} CFG steps @ {stage1_tokens} tok + upscale + "
        f"3 distilled steps @ {stage2_tokens} tok{interval}): {total:.2f} s latents "
        f"(reference recipe ~180 s on M3 Max incl. ~10-15 s decode)"
    )


if __name__ == "__main__":
    main()
