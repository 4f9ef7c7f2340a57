#!/usr/bin/env python
"""PyTorch-side golden-tensor dumper for the two-phase parity harness.

Runs the ORIGINAL PyTorch LTX-2 (Lightricks packages: ltx-core /
ltx-pipelines / ltx-trainer) and saves the per-stage .npy tensors that
`tests/test_parity.py` correlates against this framework's
`scripts/dump_parity_tensors.py` output. Capability parity with the
reference's scripts/generate_pytorch_checkpoints.py (426 LoC, same stage
names), written standalone: the PyTorch checkout location is a flag, not a
hard-coded path, and triton is stubbed automatically when absent.

Stages written (the cross-framework contract):
  text_encoder_video_encoding.npy        initial_latent.npy   positions.npy
  transformer_step_XXX.npy               vae_decoder_input_latent.npy
  vae_decoder_output_pixels.npy          manifest.json

Typical flow on a machine with weights + the PyTorch repo:
  python scripts/generate_torch_checkpoints.py \
      --pytorch-dir ~/LTX-2-Pytorch --model-path .../ltx-2-19b-distilled.safetensors \
      --gemma-path .../gemma-3-12b --output-dir /tmp/torch_parity
  python scripts/dump_parity_tensors.py --checkpoint ... \
      --reference-dir /tmp/torch_parity --out-dir /tmp/tpu_parity
  LTX2_PARITY_REFERENCE_DIR=/tmp/torch_parity \
  LTX2_PARITY_CANDIDATE_DIR=/tmp/tpu_parity pytest tests/test_parity.py
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

import numpy as np

DISTILLED_SIGMAS = [1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375, 0.725, 0.421875, 0.0]


def _stub_triton() -> None:
    """The PyTorch LTX-2 imports triton unconditionally; CPU/MPS boxes lack
    it. Install a minimal no-op module tree before any ltx import."""
    try:
        import triton  # noqa: F401

        return
    except ImportError:
        pass
    triton = types.ModuleType("triton")
    triton.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    triton.autotune = lambda *a, **k: (lambda f: f)
    triton.Config = lambda *a, **k: None
    triton.cdiv = lambda a, b: (a + b - 1) // b
    lang = types.ModuleType("triton.language")
    lang.constexpr = int
    triton.language = lang
    sys.modules["triton"] = triton
    sys.modules["triton.language"] = lang


def _setup_paths(pytorch_dir: str) -> None:
    root = Path(pytorch_dir).expanduser()
    if not root.exists():
        raise FileNotFoundError(f"--pytorch-dir {root} does not exist")
    sys.path.insert(0, str(root))
    for pkg in ("ltx-core", "ltx-pipelines", "ltx-trainer"):
        src = root / "packages" / pkg / "src"
        if src.exists():
            sys.path.insert(0, str(src))


def _save(out_dir: Path, name: str, tensor, manifest: list) -> None:
    arr = tensor.detach().cpu().float().numpy()
    path = out_dir / f"{name}.npy"
    np.save(path, arr)
    manifest.append(
        {
            "name": name,
            "shape": list(arr.shape),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "mean": float(arr.mean()),
            "std": float(arr.std()),
        }
    )
    print(f"  saved {path}  shape={list(arr.shape)}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    parser.add_argument("--pytorch-dir", required=True,
                        help="checkout of the PyTorch LTX-2 monorepo")
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--gemma-path", required=True)
    parser.add_argument("--prompt", default="A cat walking through grass")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--num-frames", type=int, default=17)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--device", default=None,
                        help="cpu | cuda | mps (default: best available)")
    parser.add_argument("--output-dir", default="/tmp/torch_parity_checkpoints")
    args = parser.parse_args()

    _stub_triton()
    _setup_paths(args.pytorch_dir)

    import torch

    device = args.device or (
        "cuda" if torch.cuda.is_available()
        else "mps" if getattr(torch.backends, "mps", None) and torch.backends.mps.is_available()
        else "cpu"
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest: list = []

    # ---- models ------------------------------------------------------------
    from ltx_trainer.model_loader import load_model

    components = load_model(
        checkpoint_path=args.model_path,
        device=device,
        dtype=torch.bfloat16,
        with_video_vae_encoder=False,
        with_video_vae_decoder=True,
        with_audio_vae_decoder=False,
        with_vocoder=False,
        with_text_encoder=True,
        text_encoder_path=args.gemma_path,
    )
    transformer = components.transformer.eval()
    text_encoder = components.text_encoder.eval()
    vae_decoder = components.video_vae_decoder.eval()
    vae_decoder.decode_noise_scale = 0.0  # deterministic decode for parity

    # ---- text encoding -------------------------------------------------------
    with torch.no_grad():
        text_out = text_encoder(text=args.prompt, padding_side="left")
    video_encoding = text_out.video_encoding
    _save(out_dir, "text_encoder_video_encoding", video_encoding, manifest)
    del text_encoder
    if device == "cuda":
        torch.cuda.empty_cache()

    # ---- initial latent + positions -----------------------------------------
    from ltx_core.components.patchifiers import VideoLatentPatchifier, get_pixel_coords
    from ltx_core.guidance.perturbations import (
        BatchedPerturbationConfig,
        PerturbationConfig,
    )
    from ltx_core.model.transformer.modality import Modality
    from ltx_core.model.transformer.model import X0Model
    from ltx_core.types import SpatioTemporalScaleFactors, VideoLatentShape

    lat_f = (args.num_frames - 1) // 8 + 1
    lat_h, lat_w, lat_c = args.height // 32, args.width // 32, 128

    torch.manual_seed(args.seed)
    initial = torch.randn(1, lat_c, lat_f, lat_h, lat_w, dtype=torch.bfloat16, device=device)
    _save(out_dir, "initial_latent", initial, manifest)

    patchifier = VideoLatentPatchifier(patch_size=1)
    shape = VideoLatentShape(batch=1, channels=lat_c, frames=lat_f, height=lat_h, width=lat_w)
    coords = patchifier.get_patch_grid_bounds(output_shape=shape, device=torch.device(device))
    positions = get_pixel_coords(
        latent_coords=coords,
        scale_factors=SpatioTemporalScaleFactors(time=8, height=32, width=32),
        causal_fix=True,
    )
    _save(out_dir, "positions", positions, manifest)

    # ---- distilled denoise loop ----------------------------------------------
    sigmas = DISTILLED_SIGMAS[: args.steps + 1]
    x0_model = X0Model(transformer)
    perturbations = BatchedPerturbationConfig(perturbations=[PerturbationConfig.empty()])
    latent = initial.clone() * sigmas[0]

    for i in range(len(sigmas) - 1):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        patchified = patchifier.patchify(latent)
        modality = Modality(
            latent=patchified.to(torch.bfloat16),
            context=video_encoding,
            context_mask=None,  # the PyTorch reference passes None
            timesteps=torch.tensor([sigma], dtype=torch.bfloat16, device=device),
            positions=positions.to(torch.bfloat16),
            enabled=True,
        )
        with torch.no_grad():
            x0, _ = x0_model(video=modality, audio=None, perturbations=perturbations)
        _save(out_dir, f"transformer_step_{i:03d}", x0, manifest)

        denoised = patchifier.unpatchify(x0, output_shape=shape)
        if sigma_next == 0:
            latent = denoised
        else:
            latent = latent + (latent - denoised) / sigma * (sigma_next - sigma)
        print(f"  step {i}: sigma {sigma:.4f} -> {sigma_next:.4f}")

    # ---- VAE decode ----------------------------------------------------------
    _save(out_dir, "vae_decoder_input_latent", latent, manifest)
    with torch.no_grad():
        pixels = vae_decoder(latent)
    _save(out_dir, "vae_decoder_output_pixels", pixels, manifest)

    with open(out_dir / "manifest.json", "w") as fh:
        json.dump({"config": vars(args), "sigmas": sigmas, "checkpoints": manifest}, fh, indent=2)
    print(f"\nwrote {len(manifest)} stages + manifest to {out_dir}")


if __name__ == "__main__":
    main()
