#!/usr/bin/env python
"""Interactive HuggingFace weight downloader.

Capability parity with reference scripts/download_weights.py (390 LoC):
status-annotated per-file table, interactive selection with quick options
(recommended / all / custom), already-downloaded detection, free-disk
check, HF token pass-through, and selective non-interactive download via
keys or --all/--recommended. Plain stdlib output (no rich dependency).
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

# (key, repo_id, filename_or_dir(None=snapshot), bytes approx, description)
WEIGHT_TABLE = [
    ("distilled", "Lightricks/LTX-2", "ltx-2-19b-distilled.safetensors",
     43e9, "LTX-2.0 19B distilled (fast, 8-step)"),
    ("distilled-fp8", "Lightricks/LTX-2", "ltx-2-19b-distilled-fp8.safetensors",
     27e9, "LTX-2.0 19B distilled, fp8 quantized"),
    ("dev", "Lightricks/LTX-2", "ltx-2-19b-dev.safetensors",
     43e9, "LTX-2.0 19B dev (CFG, 25-30 steps)"),
    ("v23-distilled", "Lightricks/LTX-2", "ltx-2.3-22b-distilled.safetensors",
     48e9, "LTX-2.3 22B distilled"),
    ("spatial-upscaler", "Lightricks/LTX-2",
     "ltx-2-spatial-upscaler-x2-1.0.safetensors",
     995e6, "2x spatial latent upscaler"),
    ("temporal-upscaler", "Lightricks/LTX-2",
     "ltx-2-temporal-upscaler-x2-1.0.safetensors",
     262e6, "2x temporal latent upscaler"),
    ("distilled-lora", "Lightricks/LTX-2",
     "ltx-2-19b-distilled-lora-384.safetensors",
     1.5e9, "Distilled LoRA for two-stage refinement"),
    ("gemma", "google/gemma-3-12b-it", None,
     25e9, "Gemma-3-12B text encoder (full repo)"),
]
RECOMMENDED = {"distilled", "gemma"}


def _fmt_size(nbytes: float) -> str:
    return f"{nbytes / 1e9:.1f} GB" if nbytes >= 1e9 else f"{nbytes / 1e6:.0f} MB"


def _local_path(out_dir: str, key: str, filename) -> Path:
    base = Path(out_dir)
    return base / (filename if filename is not None else key)


def _is_downloaded(out_dir: str, key: str, filename) -> bool:
    p = _local_path(out_dir, key, filename)
    if filename is None:
        # A snapshot dir is only "downloaded" once the marker written after
        # a successful snapshot_download exists — an interrupted 25 GB
        # gemma download leaves files behind, and treating that as complete
        # would skip the (resumable) re-download forever.
        return (p / ".download_complete").exists()
    return p.exists()


def print_table(out_dir: str, selected=None):
    selected = selected or set()
    print(f"{'key':<20} {'size':>8} {'status':>12}  description")
    print("-" * 78)
    for key, _repo, fn, size, desc in WEIGHT_TABLE:
        if _is_downloaded(out_dir, key, fn):
            status = "downloaded"
        elif key in selected:
            status = "selected"
        else:
            status = "-"
        print(f"{key:<20} {_fmt_size(size):>8} {status:>12}  {desc}")


def interactive_selection(out_dir: str):
    """Reference-style interactive picker: [r]ecommended / [a]ll / custom
    comma-separated keys; already-downloaded entries are skipped."""
    print_table(out_dir)
    print()
    print("Quick selection:")
    print("  r  recommended (distilled + gemma)")
    print("  a  everything")
    print("  or a comma-separated list of keys (e.g. distilled-fp8,gemma)")
    choice = input("selection> ").strip().lower()
    if choice == "r":
        selected = set(RECOMMENDED)
    elif choice == "a":
        selected = {e[0] for e in WEIGHT_TABLE}
    else:
        keys = {k.strip() for k in choice.split(",") if k.strip()}
        known = {e[0] for e in WEIGHT_TABLE}
        unknown = keys - known
        if unknown:
            print(f"Unknown keys ignored: {sorted(unknown)}")
        selected = keys & known
    already = {
        e[0] for e in WEIGHT_TABLE if _is_downloaded(out_dir, e[0], e[2])
    }
    skipped = selected & already
    if skipped:
        print(f"Already downloaded (skipping): {sorted(skipped)}")
    return selected - already


def check_disk_space(selected, out_dir: str) -> bool:
    """Refuse when the selection clearly exceeds free space (+10% slack)."""
    need = sum(e[3] for e in WEIGHT_TABLE if e[0] in selected) * 1.1
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    free = shutil.disk_usage(out_dir).free
    if need > free:
        print(
            f"Not enough disk space: need ~{_fmt_size(need)}, "
            f"{_fmt_size(free)} free at {out_dir}"
        )
        return False
    return True


def download(key: str, out_dir: str, token=None) -> bool:
    try:
        from huggingface_hub import hf_hub_download, snapshot_download
    except ImportError:
        print("huggingface_hub is required: pip install huggingface_hub")
        sys.exit(1)

    entry = next((e for e in WEIGHT_TABLE if e[0] == key), None)
    if entry is None:
        print(f"Unknown key: {key}")
        print_table(out_dir)
        return False
    _key, repo, filename, size, desc = entry
    if _is_downloaded(out_dir, key, filename):
        print(f"{key}: already downloaded, skipping")
        return True
    print(f"Downloading {desc} ({_fmt_size(size)}) from {repo}...")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    try:
        if filename is None:
            path = snapshot_download(
                repo_id=repo, local_dir=str(Path(out_dir) / key), token=token
            )
            # Completion marker: snapshot_download returned, so every file
            # verified; partial dirs (killed mid-download) lack it and get
            # resumed on the next run.
            (Path(out_dir) / key / ".download_complete").touch()
        else:
            path = hf_hub_download(
                repo_id=repo, filename=filename, local_dir=out_dir, token=token
            )
    except Exception as exc:  # noqa: BLE001 — keep going with other files
        print(f"{key}: download failed: {exc}")
        return False
    print(f"Saved to {path}")
    return True


def main():
    parser = argparse.ArgumentParser(description="Download LTX-2 weights")
    parser.add_argument("keys", nargs="*", help="weight keys to download "
                        "(omit for interactive selection)")
    parser.add_argument("--out-dir", default="weights/ltx-2")
    parser.add_argument("--list", action="store_true", help="print the table")
    parser.add_argument("--all", action="store_true", help="download everything")
    parser.add_argument("--recommended", action="store_true",
                        help="download the recommended set (distilled + gemma)")
    parser.add_argument("--token", default=None, help="HF access token "
                        "(gated repos, e.g. gemma)")
    parser.add_argument("--skip-disk-check", action="store_true")
    args = parser.parse_args()

    if args.list:
        print_table(args.out_dir)
        return

    if args.all:
        selected = {e[0] for e in WEIGHT_TABLE}
    elif args.recommended:
        selected = set(RECOMMENDED)
    elif args.keys:
        selected = set(args.keys)
        known = {e[0] for e in WEIGHT_TABLE}
        unknown = sorted(selected - known)
        if unknown:
            print(f"Unknown weight key(s): {', '.join(unknown)}")
            print(f"Available: {', '.join(sorted(known))}")
            sys.exit(1)
    elif sys.stdin.isatty():
        selected = interactive_selection(args.out_dir)
    else:
        print_table(args.out_dir)
        return

    # Already-downloaded files are skipped by download() — exclude them
    # from the disk estimate too, or a completed --all re-run refuses.
    pending = {
        e[0] for e in WEIGHT_TABLE
        if e[0] in selected and not _is_downloaded(args.out_dir, e[0], e[2])
    }
    if not pending:
        print("Nothing to download.")
        print_table(args.out_dir)
        return
    if not args.skip_disk_check and not check_disk_space(pending, args.out_dir):
        sys.exit(1)
    failed = [k for k in sorted(selected) if not download(k, args.out_dir, args.token)]
    if failed:
        print(f"Failed: {failed}")
        sys.exit(1)
    print_table(args.out_dir)


if __name__ == "__main__":
    main()
