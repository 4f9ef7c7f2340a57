"""Mid-run training checkpoint / exact resume.

The reference is inference-only; its only "resume" notion is re-loading
final weights (SURVEY §5: no mid-run resume anywhere). For production
fine-tuning this module adds the missing piece: periodically persist
(step, optimizer target, optimizer state) and restore them EXACTLY — the
resumed run's losses and final weights are bit-identical to the
uninterrupted run, because everything else in `scripts/train.py` is
deterministically derived (batch indices from a sequential RandomState
that the CLI fast-forwards, per-step PRNGKeys from `seed + 2 + i`, frozen
params from the source checkpoint).

Format: one safetensors file (the repo's native streaming writer —
handles bf16/fp8 and keeps peak host memory at one tensor even for
multi-GB states). Leaves of the pytree `(opt_target, opt_state)` are
stored under positional keys `leaf.{i:06d}`; the tree STRUCTURE is never
serialized — `load_train_state` rebuilds it from freshly-initialized
templates and cross-checks a treedef fingerprint plus per-leaf
shape/dtype, so a config mismatch (different --trainable regex, LoRA
rank, optimizer chain) fails loudly instead of scrambling leaves.

Sharded states are supported on both sides: saving gathers one leaf at a
time (np.asarray on a sharded jax.Array), and loading `device_put`s each
leaf back onto the template leaf's sharding — a ZeRO-1/2 run resumes with
its 1/D layouts intact.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ltx2_tpu.loader.safetensors_io import (
    SafetensorsFile,
    write_safetensors_streaming,
)

_KEY = "leaf.{:06d}"


def _treedef_fingerprint(treedef) -> str:
    return hashlib.sha256(str(treedef).encode()).hexdigest()[:16]


def save_train_state(
    path: str,
    step: int,
    opt_target,
    opt_state,
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Atomically persist (step, opt_target, opt_state) to `path`.

    `opt_target` is whatever tree the optimizer updates — the full param
    tree, or the trainable half of a `partition_params` split (frozen
    leaves are re-derivable from the source checkpoint and are NOT saved).
    Writes to `path + ".tmp"` then renames, so a crash mid-save never
    corrupts the previous state.
    """
    leaves, treedef = jax.tree_util.tree_flatten((opt_target, opt_state))
    meta = dict(metadata or {})
    meta["train_state_step"] = str(int(step))
    meta["train_state_treedef"] = _treedef_fingerprint(treedef)

    def fetch(leaf):
        # One-leaf-at-a-time device->host gather (sharded arrays included).
        return np.asarray(leaf)

    specs = [
        (
            _KEY.format(i),
            np.dtype(leaf.dtype),
            tuple(int(s) for s in np.shape(leaf)),
            (lambda leaf=leaf: fetch(leaf)),
        )
        for i, leaf in enumerate(leaves)
    ]
    tmp = path + ".tmp"
    write_safetensors_streaming(tmp, specs, metadata=meta)
    os.replace(tmp, path)


def load_train_state(
    path: str, opt_target_template, opt_state_template
) -> Tuple[int, object, object]:
    """Restore (step, opt_target, opt_state) saved by `save_train_state`.

    The templates are a freshly-built optimizer target and `opt.init`
    state under the CURRENT config (and, if sharded, already carrying
    their intended shardings): their tree structure indexes the stored
    leaves, and each loaded leaf is `device_put` onto the corresponding
    template leaf's sharding. Raises ValueError on any structure, shape,
    or dtype mismatch.
    """
    f = SafetensorsFile(path)
    templates, treedef = jax.tree_util.tree_flatten(
        (opt_target_template, opt_state_template)
    )
    want = _treedef_fingerprint(treedef)
    got = f.metadata.get("train_state_treedef")
    if got != want:
        raise ValueError(
            f"train state {path} was saved under a different configuration "
            f"(treedef fingerprint {got} != {want}): check --trainable, "
            "--lora-rank, and optimizer settings match the original run"
        )
    step = int(f.metadata["train_state_step"])

    loaded = []
    for i, tmpl in enumerate(templates):
        key = _KEY.format(i)
        if key not in f:
            raise ValueError(f"train state {path} is missing {key}")
        arr = f.get(key)
        if tuple(arr.shape) != tuple(np.shape(tmpl)) or np.dtype(
            arr.dtype
        ) != np.dtype(tmpl.dtype):
            raise ValueError(
                f"train state leaf {i}: stored {arr.dtype}{arr.shape} vs "
                f"current config {tmpl.dtype}{np.shape(tmpl)}"
            )
        sharding = getattr(tmpl, "sharding", None)
        loaded.append(
            jax.device_put(arr, sharding) if sharding is not None
            else jax.numpy.asarray(arr)
        )
    f.close()
    opt_target, opt_state = jax.tree_util.tree_unflatten(treedef, loaded)
    return step, opt_target, opt_state
