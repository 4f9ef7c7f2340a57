#!/usr/bin/env python
"""Interactive HuggingFace weight downloader.

Capability parity with reference scripts/download_weights.py (390 LoC):
per-file table with sizes (distilled 43GB, fp8 27GB, dev 43GB, spatial
upscaler 995MB, temporal upscaler 262MB, distilled LoRA 1.5GB, Gemma ~25GB)
and selective download via huggingface_hub.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# (key, repo_id, filename_or_dir, approx size, description)
WEIGHT_TABLE = [
    ("distilled", "Lightricks/LTX-2", "ltx-2-19b-distilled.safetensors", "43 GB",
     "LTX-2.0 19B distilled (fast, 8-step)"),
    ("distilled-fp8", "Lightricks/LTX-2", "ltx-2-19b-distilled-fp8.safetensors", "27 GB",
     "LTX-2.0 19B distilled, fp8 quantized"),
    ("dev", "Lightricks/LTX-2", "ltx-2-19b-dev.safetensors", "43 GB",
     "LTX-2.0 19B dev (CFG, 25-30 steps)"),
    ("v23-distilled", "Lightricks/LTX-2", "ltx-2.3-22b-distilled.safetensors", "48 GB",
     "LTX-2.3 22B distilled"),
    ("spatial-upscaler", "Lightricks/LTX-2", "ltx-2-spatial-upscaler-x2-1.0.safetensors",
     "995 MB", "2x spatial latent upscaler"),
    ("temporal-upscaler", "Lightricks/LTX-2", "ltx-2-temporal-upscaler-x2-1.0.safetensors",
     "262 MB", "2x temporal latent upscaler"),
    ("distilled-lora", "Lightricks/LTX-2", "ltx-2-19b-distilled-lora-384.safetensors",
     "1.5 GB", "Distilled LoRA for two-stage refinement"),
    ("gemma", "google/gemma-3-12b-it", None, "~25 GB",
     "Gemma-3-12B text encoder (full repo)"),
]


def print_table():
    print(f"{'key':<20} {'size':>8}  description")
    print("-" * 70)
    for key, _repo, _fn, size, desc in WEIGHT_TABLE:
        print(f"{key:<20} {size:>8}  {desc}")


def download(key: str, out_dir: str):
    try:
        from huggingface_hub import hf_hub_download, snapshot_download
    except ImportError:
        print("huggingface_hub is required: pip install huggingface_hub")
        sys.exit(1)

    entry = next((e for e in WEIGHT_TABLE if e[0] == key), None)
    if entry is None:
        print(f"Unknown key: {key}")
        print_table()
        sys.exit(1)
    _key, repo, filename, size, desc = entry
    print(f"Downloading {desc} ({size}) from {repo}...")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    if filename is None:
        path = snapshot_download(repo_id=repo, local_dir=out_dir)
    else:
        path = hf_hub_download(repo_id=repo, filename=filename, local_dir=out_dir)
    print(f"Saved to {path}")


def main():
    parser = argparse.ArgumentParser(description="Download LTX-2 weights")
    parser.add_argument("keys", nargs="*", help="weight keys to download")
    parser.add_argument("--out-dir", default="weights/ltx-2")
    parser.add_argument("--list", action="store_true")
    args = parser.parse_args()

    if args.list or not args.keys:
        print_table()
        return
    for key in args.keys:
        download(key, args.out_dir)


if __name__ == "__main__":
    main()
