"""Audio chain benchmark on real TPU: audio VAE decode + BigVGAN vocoder.

The audio path is the reference's known-fragile subsystem (fp32-forced
BigVGAN, 108 sequential convs). Measures the device-side latency of
decoding ~5 s of audio (matching a 121-frame 24 fps clip).
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
    ap.add_argument("--latent-frames", type=int, default=126)  # ~5s at 24fps video
    args = ap.parse_args()

    import jax.numpy as jnp

    from ltx2_tpu.models.audio_vae import (
        AudioDecoderConfig,
        VocoderConfig,
        audio_decoder_apply,
        init_audio_decoder,
        init_vocoder,
        vocoder_apply,
    )

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    dec_cfg = AudioDecoderConfig()
    dec_params = jax.jit(lambda k: init_audio_decoder(k, dec_cfg))(jax.random.PRNGKey(0))
    voc_cfg = VocoderConfig()
    voc_params = jax.jit(lambda k: init_vocoder(k, voc_cfg))(jax.random.PRNGKey(1))
    jax.block_until_ready((dec_params, voc_params))

    latent = jax.random.normal(
        jax.random.PRNGKey(2), (1, dec_cfg.z_channels, args.latent_frames, dec_cfg.mel_bins),
        jnp.float32,
    )

    @jax.jit
    def chain(dp, vp, z):
        mel = audio_decoder_apply(dp, dec_cfg, z)
        return vocoder_apply(vp, voc_cfg, mel)

    wav = chain(dec_params, voc_params, latent)
    sync(wav)  # compile
    t0 = time.perf_counter()
    sync(chain(dec_params, voc_params, latent))
    sec = time.perf_counter() - t0
    n_samples = int(wav.shape[-1])
    print(f"audio decode+vocode: {sec:.3f}s for {wav.shape} "
          f"(~{n_samples / voc_cfg.output_sample_rate:.1f}s of audio)")


if __name__ == "__main__":
    main()
