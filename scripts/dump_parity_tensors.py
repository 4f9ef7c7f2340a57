#!/usr/bin/env python
"""Stage-by-stage parity tensor dumper.

TPU-side half of the reference's two-phase golden-tensor parity harness
(docs/PARITY.md:15-38; scripts/generate_pytorch_checkpoints.py): runs this
framework with a fixed config (128x128, 17 frames, 8 steps, seed 42) and
dumps per-stage .npy tensors with the same stage names the PyTorch dumper
uses, so `tests/test_parity.py` can correlate either direction:

  text_encoder_video_encoding.npy        initial_latent.npy   positions.npy
  transformer_step_XXX.npy               vae_decoder_input_latent.npy
  vae_decoder_output_pixels.npy          manifest.json

Cross-framework RNG: torch.randn(seed) and jax PRNG produce DIFFERENT
noise, so absolute stage comparison requires INJECTING the reference dump's
initial latent (and text encoding, if Gemma isn't loaded here) via
--reference-dir — every downstream stage then measures real model parity,
not RNG parity. Without --reference-dir the dump is self-contained (useful
for candidate-vs-candidate regression baselines).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from ltx2_tpu.utils.platform import apply_env_platform_overrides

apply_env_platform_overrides()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--gemma-dir", default=None)
    parser.add_argument("--out-dir", default="parity_dumps")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--num-frames", type=int, default=17)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--prompt", default="A cat walking through grass")
    parser.add_argument(
        "--reference-dir", default=None,
        help="torch dump dir: inject its initial_latent.npy (and "
        "text_encoder_video_encoding.npy when --gemma-dir is unset) so "
        "downstream stages compare model math, not RNG",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ltx2_tpu.components import (
        DISTILLED_SIGMA_VALUES,
        GaussianNoiser,
        VideoLatentPatchifier,
    )
    from ltx2_tpu.conditioning.tools import VideoLatentTools
    from ltx2_tpu.models.transformer.model import x0_model_apply
    from ltx2_tpu.models.video_vae import video_decoder_apply
    from ltx2_tpu.pipelines.common import modality_from_state, post_process_latent
    from ltx2_tpu.types import VideoLatentShape, VideoPixelShape
    from ltx2_tpu.utils.model_ledger import ModelLedger

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    ledger = ModelLedger(
        checkpoint_path=args.checkpoint,
        gemma_path=args.gemma_dir,
        target_dtype="float32",  # parity runs in fp32
    )
    dit_params, dit_cfg = ledger.transformer()
    dec_params, dec_cfg = ledger.video_decoder()

    # --- text encoding ---
    if args.gemma_dir:
        from transformers import AutoTokenizer

        from ltx2_tpu.models.text_encoder import gemma3_apply, video_text_encoder_apply

        tokenizer = AutoTokenizer.from_pretrained(args.gemma_dir, padding_side="left")
        enc = tokenizer(
            [args.prompt], return_tensors="np", padding="max_length",
            truncation=True, max_length=1024,
        )
        gemma_params, gemma_cfg = ledger.gemma()
        _, hidden = jax.jit(
            lambda p, i, m: gemma3_apply(p, gemma_cfg, i, attention_mask=m)
        )(gemma_params, jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]))
        te_params, te_cfg = ledger.text_encoder()
        te_out = jax.jit(
            lambda p, h, m: video_text_encoder_apply(p, te_cfg, h, m)
        )(te_params, hidden, jnp.asarray(enc["attention_mask"]))
        context = te_out.video_encoding
        np.save(out / "text_encoder_video_encoding.npy", np.asarray(context))
    elif args.reference_dir and (
        Path(args.reference_dir) / "text_encoder_video_encoding.npy"
    ).exists():
        context = jnp.asarray(
            np.load(Path(args.reference_dir) / "text_encoder_video_encoding.npy"),
            jnp.float32,
        )
    else:
        context = jax.random.normal(
            jax.random.PRNGKey(0),
            (1, 1024, dit_cfg.caption_channels or dit_cfg.cross_attention_dim),
        ) * 0.02

    # --- initial latent + positions ---
    pixel_shape = VideoPixelShape(
        batch=1, frames=args.num_frames, height=args.height, width=args.width
    )
    latent_shape = VideoLatentShape.from_pixel_shape(pixel_shape)
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(1), target_shape=latent_shape, fps=24.0
    )
    state = tools.create_initial_state()
    ref_init = (
        Path(args.reference_dir) / "initial_latent.npy" if args.reference_dir else None
    )
    if ref_init is not None and ref_init.exists():
        # inject the torch dump's noise: (B, C, T, H, W) * sigma_max,
        # patchified into the state (the torch dumper scales by sigmas[0]=1)
        init_5d = jnp.asarray(np.load(ref_init), jnp.float32)
        state = state.replace(latent=tools.patchifier.patchify(init_5d))
    else:
        state = GaussianNoiser()(jax.random.PRNGKey(args.seed), state, 1.0)
    # dump in the torch dumper's 5D (B, C, T, H, W) layout
    np.save(
        out / "initial_latent.npy",
        np.asarray(tools.unpatchify(state).latent),
    )
    # torch dumps PIXEL coords (get_pixel_coords, causal_fix=True); our state
    # carries seconds on the temporal axis — multiply fps back out.
    pos_pixels = np.asarray(state.positions).copy()
    pos_pixels[:, 0] *= tools.fps
    np.save(out / "positions.npy", pos_pixels)

    # --- per-step transformer dumps ---
    sigmas = np.asarray(DISTILLED_SIGMA_VALUES[: args.steps + 1], np.float32)
    forward = jax.jit(
        lambda p, m: x0_model_apply(p, dit_cfg, video=m)
    )
    latent = state.latent
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        modality = modality_from_state(state.replace(latent=latent), context, sigma)
        denoised = forward(dit_params, modality)
        denoised = post_process_latent(denoised, state.denoise_mask, state.clean_latent)
        np.save(out / f"transformer_step_{i:03d}.npy", np.asarray(denoised))
        v = (latent.astype(jnp.float32) - denoised.astype(jnp.float32)) / sigma
        latent = (latent.astype(jnp.float32) + v * (sigma_next - sigma)).astype(latent.dtype)

    final = tools.unpatchify(state.replace(latent=latent)).latent
    np.save(out / "vae_decoder_input_latent.npy", np.asarray(final))

    decode = jax.jit(
        lambda p, z: video_decoder_apply(p, dec_cfg, z, timestep=0.05, noise_key=None)
    )
    video = decode(dec_params, final)
    np.save(out / "vae_decoder_output_pixels.npy", np.asarray(video))

    import json

    manifest = {
        "config": vars(args),
        "sigmas": [float(s) for s in sigmas],
        "stages": sorted(p.name for p in out.glob("*.npy")),
    }
    with open(out / "manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=2)
    print(f"dumped parity tensors to {out}")


if __name__ == "__main__":
    main()
