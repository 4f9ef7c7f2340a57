"""VAE decode benchmark on real TPU (BASELINE north star: decode fps).

Decodes the flagship 768x512x121f latent (128ch, 16x16x24) through the
default V2.0 decoder with temporal chunking (the production path) and
reports pixel-frames-per-second.
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
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ltx2_tpu.models.video_vae import (
        VideoDecoderConfig,
        decode_latent,
        init_video_decoder,
    )

    lf = (args.frames - 1) // 8 + 1
    lh, lw = args.height // 32, args.width // 32
    cfg = VideoDecoderConfig(compute_dtype=args.dtype)
    params = jax.jit(lambda k: init_video_decoder(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 128, lf, lh, lw), jnp.float32)

    def run():
        t0 = time.perf_counter()
        video = decode_latent(latent, params, cfg, key=jax.random.PRNGKey(2))
        _ = np.asarray(video).sum()  # force full host sync
        return time.perf_counter() - t0, video

    warm, video = run()
    times = [run()[0] for _ in range(args.iters)]
    sec = min(times)
    print(f"decode output: {video.shape} {video.dtype}")
    print(f"warm(compile): {warm:.2f}s  best: {sec:.3f}s  "
          f"fps: {args.frames / sec:.2f} pixel-frames/s")


if __name__ == "__main__":
    main()
