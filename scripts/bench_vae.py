"""VAE decode benchmark on real TPU (BASELINE north star: decode fps).

Decodes the flagship 768x512x121f latent (128ch, 16x16x24) through the
default V2.0 decoder and reports BOTH:
- device-side decode time (jitted forward, scalar sync) — the hardware
  number that matters for production serving, where frames move over PCIe;
- end-to-end time including the device->host frame transfer — which in
  THIS development environment is dominated by a ~3 MB/s network tunnel to
  the TPU, not by the chip.
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
    args = ap.parse_args()

    import jax.numpy as jnp

    from ltx2_tpu.models.video_vae import (
        VideoDecoderConfig,
        decode_latent,
        init_video_decoder,
    )
    from ltx2_tpu.models.video_vae.decoder import video_decoder_apply

    lf = (args.frames - 1) // 8 + 1
    lh, lw = args.height // 32, args.width // 32
    cfg = VideoDecoderConfig(compute_dtype=args.dtype)
    params = jax.jit(lambda k: init_video_decoder(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 128, lf, lh, lw), jnp.float32)

    fn = jax.jit(
        lambda p, z: video_decoder_apply(
            p, cfg, z, timestep=0.05, noise_key=jax.random.PRNGKey(2)
        )
    )

    def dev_sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    dev_sync(fn(params, latent))  # compile
    t0 = time.perf_counter()
    dev_sync(fn(params, latent))
    dev = time.perf_counter() - t0
    print(f"device decode: {dev:.3f}s  -> {args.frames / dev:.1f} pixel-frames/s")

    t0 = time.perf_counter()
    video = decode_latent(latent, params, cfg, key=jax.random.PRNGKey(2))
    e2e = time.perf_counter() - t0
    mb = video.nbytes / 1e6
    print(f"e2e with host transfer: {e2e:.2f}s ({mb:.0f} MB uint8; "
          f"transfer-dominated over the dev tunnel)")
    print(f"output: {video.shape} {video.dtype}")


if __name__ == "__main__":
    main()
