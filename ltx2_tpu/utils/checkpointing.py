"""Generation checkpoint/resume.

The reference has no mid-run resume (SURVEY.md §5 — inference state lives
only in Python locals). Here a generation's full denoising state is an
explicit `LatentState` pytree + the sigma schedule position, so pausing and
resuming is just serialization: save after any stage (or any step boundary
when driving the loop in segments), reload, and continue with
`sigmas[k:]` — the scanned Euler loop is Markovian in (latent, sigma).

Use cases: preemptible TPU serving (checkpoint between the two stages of
distilled/two-stage), long HQ runs, and debugging a single stage in
isolation.

Caveat: the GE velocity-momentum correction (ge_gamma > 0) carries a
velocity EMA across steps that is NOT serialized — it resets at a resume
boundary (one step of plain Euler before momentum re-engages). Plain
Euler/Heun/CFG/STG runs resume bit-exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.types import LatentState

_FIELDS = ("latent", "denoise_mask", "positions", "clean_latent")


def save_generation_state(
    path: str,
    state: LatentState,
    sigmas: jnp.ndarray,
    step: int,
    audio_state: Optional[LatentState] = None,
) -> None:
    """Write a resumable snapshot: the LatentState(s), the FULL sigma
    schedule, and how many steps have been consumed."""
    payload = {f"video_{k}": np.asarray(getattr(state, k)) for k in _FIELDS}
    if audio_state is not None:
        payload.update(
            {f"audio_{k}": np.asarray(getattr(audio_state, k)) for k in _FIELDS}
        )
    payload["sigmas"] = np.asarray(sigmas, np.float32)
    payload["step"] = np.int32(step)
    # np.savez(path_string) appends '.npz' to extension-less paths while
    # load opens the literal path — write through a file handle so save
    # and load always agree on the exact path (review r4: a resume with
    # the same path string otherwise died with FileNotFoundError).
    with open(path, "wb") as fh:
        np.savez(fh, **payload)


def load_generation_state(
    path: str,
) -> Tuple[LatentState, Optional[LatentState], jnp.ndarray, int]:
    """Read a snapshot -> (video_state, audio_state | None, remaining_sigmas,
    step). `remaining_sigmas` starts at the saved position, so
    `loop(params, state, remaining_sigmas, ...)` continues the run."""
    data = np.load(path)

    def build(prefix: str) -> Optional[LatentState]:
        if f"{prefix}_latent" not in data:
            return None
        return LatentState(
            **{k: jnp.asarray(data[f"{prefix}_{k}"]) for k in _FIELDS}
        )

    step = int(data["step"])
    sigmas = jnp.asarray(data["sigmas"])
    return build("video"), build("audio"), sigmas[step:], step
