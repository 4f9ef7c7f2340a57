"""Attention perturbations for STG guidance.

Capability parity with reference LTX_2_MLX/components/perturbations.py.
Perturbation configs are *static* (hashable, frozen) so they can be closed
over by jit — block-level skipping compiles to a different XLA program per
perturbation set, which is the TPU-correct way to "skip" attention (no
runtime branches in the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional, Tuple

import jax.numpy as jnp


class PerturbationType(Enum):
    SKIP_A2V_CROSS_ATTN = "skip_a2v_cross_attn"
    SKIP_V2A_CROSS_ATTN = "skip_v2a_cross_attn"
    SKIP_VIDEO_SELF_ATTN = "skip_video_self_attn"
    SKIP_AUDIO_SELF_ATTN = "skip_audio_self_attn"


@dataclass(frozen=True)
class Perturbation:
    """One attention-skip rule: which type, in which blocks (None = all)."""

    type: PerturbationType
    blocks: Optional[Tuple[int, ...]] = None

    def is_perturbed(self, perturbation_type: PerturbationType, block: int) -> bool:
        if self.type != perturbation_type:
            return False
        return self.blocks is None or block in self.blocks


@dataclass(frozen=True)
class PerturbationConfig:
    """Perturbation rules for a single sample."""

    perturbations: Optional[Tuple[Perturbation, ...]] = None

    def is_perturbed(self, perturbation_type: PerturbationType, block: int) -> bool:
        if self.perturbations is None:
            return False
        return any(p.is_perturbed(perturbation_type, block) for p in self.perturbations)

    @staticmethod
    def empty() -> "PerturbationConfig":
        return PerturbationConfig(perturbations=())


@dataclass(frozen=True)
class BatchedPerturbationConfig:
    """Per-sample perturbation configs for a batch (perturbations.py:94-201)."""

    perturbations: Tuple[PerturbationConfig, ...]

    def mask(
        self, perturbation_type: PerturbationType, block: int, dtype=jnp.float32
    ) -> jnp.ndarray:
        """(batch,) mask: 1 = keep attention, 0 = skip."""
        values = [
            0.0 if cfg.is_perturbed(perturbation_type, block) else 1.0
            for cfg in self.perturbations
        ]
        return jnp.asarray(values, dtype=dtype)

    def mask_like(
        self, perturbation_type: PerturbationType, block: int, values: jnp.ndarray
    ) -> jnp.ndarray:
        mask = self.mask(perturbation_type, block, values.dtype)
        return mask.reshape(mask.shape[0], *([1] * (values.ndim - 1)))

    def any_in_batch(self, perturbation_type: PerturbationType, block: int) -> bool:
        return any(cfg.is_perturbed(perturbation_type, block) for cfg in self.perturbations)

    def all_in_batch(self, perturbation_type: PerturbationType, block: int) -> bool:
        return all(cfg.is_perturbed(perturbation_type, block) for cfg in self.perturbations)

    @staticmethod
    def empty(batch_size: int) -> "BatchedPerturbationConfig":
        return BatchedPerturbationConfig(
            perturbations=tuple(PerturbationConfig.empty() for _ in range(batch_size))
        )


def create_stg_perturbation(
    skip_video_self_attn: bool = True,
    blocks: Optional[List[int]] = None,
    skip_audio_self_attn: bool = False,
) -> PerturbationConfig:
    perturbations = []
    if skip_video_self_attn:
        perturbations.append(
            Perturbation(
                type=PerturbationType.SKIP_VIDEO_SELF_ATTN,
                blocks=tuple(blocks) if blocks is not None else None,
            )
        )
    if skip_audio_self_attn:
        perturbations.append(
            Perturbation(
                type=PerturbationType.SKIP_AUDIO_SELF_ATTN,
                blocks=tuple(blocks) if blocks is not None else None,
            )
        )
    return PerturbationConfig(perturbations=tuple(perturbations))


def create_batched_stg_config(
    batch_size: int,
    skip_video_self_attn: bool = True,
    blocks: Optional[List[int]] = None,
) -> BatchedPerturbationConfig:
    config = create_stg_perturbation(skip_video_self_attn, blocks)
    return BatchedPerturbationConfig(perturbations=(config,) * batch_size)
