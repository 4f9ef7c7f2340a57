"""Conditioning item protocol (reference LTX_2_MLX/conditioning/item.py:10)."""

from __future__ import annotations

from typing import Protocol

from ltx2_tpu.types import LatentState


class ConditioningError(Exception):
    """Raised when conditioning cannot be applied (latent.py:9)."""


class ConditioningItem(Protocol):
    def apply_to(self, latent_state: LatentState, latent_tools) -> LatentState: ...
