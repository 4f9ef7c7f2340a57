"""Guidance strategies (CFG / CFG* / STG / APG / multi-modal).

Capability parity with reference LTX_2_MLX/components/guiders.py. Pure
functions of traced arrays; stateful APG momentum is threaded explicitly
(carry in/out) so it survives lax.scan instead of mutating a field.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Protocol, Tuple

import jax.numpy as jnp


def projection_coef(to_project: jnp.ndarray, project_onto: jnp.ndarray) -> jnp.ndarray:
    """Per-batch coefficient of projecting `to_project` onto `project_onto`
    (guiders.py:290-306)."""
    batch = to_project.shape[0]
    a = to_project.reshape(batch, -1)
    b = project_onto.reshape(batch, -1)
    dot = jnp.sum(a * b, axis=1, keepdims=True)
    sq = jnp.sum(b * b, axis=1, keepdims=True) + 1e-8
    coef = dot / sq
    return coef.reshape(batch, *([1] * (to_project.ndim - 1)))


class GuiderProtocol(Protocol):
    def delta(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray: ...
    def guide(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray: ...
    def enabled(self) -> bool: ...


@dataclass(frozen=True)
class CFGGuider:
    """Classic classifier-free guidance (guiders.py:25-47)."""

    scale: float

    def delta(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        return (self.scale - 1) * (cond - uncond)

    def guide(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        return cond + self.delta(cond, uncond)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass(frozen=True)
class CFGStarRescalingGuider:
    """CFG* — uncond rescaled by its projection onto cond (guiders.py:50-76)."""

    scale: float

    def delta(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        rescaled_neg = projection_coef(cond, uncond) * uncond
        return (self.scale - 1) * (cond - rescaled_neg)

    def guide(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        return cond + self.delta(cond, uncond)

    def enabled(self) -> bool:
        return self.scale != 1.0


def rescale_noise_cfg(
    noise_cfg: jnp.ndarray,
    noise_cond: jnp.ndarray,
    guidance_rescale: float = 0.7,
) -> jnp.ndarray:
    """Rescale a CFG-guided prediction to the conditioned prediction's
    statistics (arXiv 2305.08891; reference two_stage.py:55-85): prevents
    CFG variance explosion / oversaturation. Per-sample mean/std — the
    reference's global .mean()/.std() on its always-batch-1 latents is
    identical at B=1."""
    axes = tuple(range(1, noise_cfg.ndim))
    cfg32 = noise_cfg.astype(jnp.float32)
    cond32 = noise_cond.astype(jnp.float32)
    cfg_mean = jnp.mean(cfg32, axis=axes, keepdims=True)
    cfg_std = jnp.std(cfg32, axis=axes, keepdims=True)
    cond_mean = jnp.mean(cond32, axis=axes, keepdims=True)
    cond_std = jnp.std(cond32, axis=axes, keepdims=True)
    rescaled = (cfg32 - cfg_mean) / (cfg_std + 1e-8) * cond_std + cond_mean
    out = guidance_rescale * rescaled + (1.0 - guidance_rescale) * cfg32
    return out.astype(noise_cfg.dtype)


@dataclass(frozen=True)
class RescaledCFGGuider:
    """CFG followed by the arXiv-2305.08891 variance rescale
    (reference two_stage.py:288-290 applies it in the video-only stage-1
    CFG loop when guidance_rescale > 0)."""

    scale: float
    rescale: float = 0.7

    def delta(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        return self.guide(cond, uncond) - cond

    def guide(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        guided = cond + (self.scale - 1) * (cond - uncond)
        return rescale_noise_cfg(guided, cond, self.rescale)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass(frozen=True)
class STGGuider:
    """Spatio-temporal guidance vs a perturbed forward pass (guiders.py:79-102)."""

    scale: float

    def delta(self, pos_denoised: jnp.ndarray, perturbed_denoised: jnp.ndarray) -> jnp.ndarray:
        return self.scale * (pos_denoised - perturbed_denoised)

    def guide(self, pos_denoised: jnp.ndarray, perturbed_denoised: jnp.ndarray) -> jnp.ndarray:
        return pos_denoised + self.delta(pos_denoised, perturbed_denoised)

    def enabled(self) -> bool:
        return self.scale != 0.0


def _clamp_norm(guidance: jnp.ndarray, norm_threshold: float) -> jnp.ndarray:
    """Clamp the PER-SAMPLE L2 norm of the guidance delta.

    The reference reduces over axes (-1,-2,-3) of its always-(1, N, C)
    latents (guiders.py:135-139) — bit-identical to this at B=1. Reducing
    per sample (all axes but batch) keeps that parity while not coupling
    independent clips under multi-clip batched serving (one clip's guidance
    magnitude must not change another's clamp factor)."""
    axes = tuple(range(1, guidance.ndim))
    norm = jnp.sqrt(jnp.sum(guidance * guidance, axis=axes, keepdims=True))
    scale_factor = jnp.minimum(jnp.ones_like(guidance), norm_threshold / norm)
    return guidance * scale_factor


def _apg_project(guidance: jnp.ndarray, cond: jnp.ndarray, eta: float) -> jnp.ndarray:
    proj = projection_coef(guidance, cond)
    g_parallel = proj * cond
    g_orth = guidance - g_parallel
    return g_parallel * eta + g_orth


@dataclass(frozen=True)
class LtxAPGGuider:
    """Adaptive projected guidance (guiders.py:105-152)."""

    scale: float
    eta: float = 1.0
    norm_threshold: float = 0.0

    def delta(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        guidance = cond - uncond
        if self.norm_threshold > 0:
            guidance = _clamp_norm(guidance, self.norm_threshold)
        return _apg_project(guidance, cond, self.eta) * (self.scale - 1)

    def guide(self, cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
        return cond + self.delta(cond, uncond)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass(frozen=True)
class StatefulAPGGuider:
    """APG with momentum EMA (guiders.py:155-205), functional form.

    `delta`/`guide` take and return the EMA carry so the guider can live
    inside lax.scan. Pass carry=None (or zeros) at step 0.
    """

    scale: float
    eta: float
    norm_threshold: float = 5.0
    momentum: float = 0.0

    def delta(
        self,
        cond: jnp.ndarray,
        uncond: jnp.ndarray,
        carry: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        guidance = cond - uncond
        if self.momentum != 0:
            carry = guidance if carry is None else self.momentum * carry + guidance
            guidance = carry
        else:
            carry = guidance if carry is None else carry
        if self.norm_threshold > 0:
            guidance = _clamp_norm(guidance, self.norm_threshold)
        return _apg_project(guidance, cond, self.eta) * self.scale, carry

    def guide(
        self,
        cond: jnp.ndarray,
        uncond: jnp.ndarray,
        carry: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d, carry = self.delta(cond, uncond, carry)
        return cond + d, carry

    def enabled(self) -> bool:
        return self.scale != 0.0


# Back-compat alias matching the reference class name.
LegacyStatefulAPGGuider = StatefulAPGGuider


@dataclass(frozen=True)
class MultiModalGuiderParams:
    """Parameters for the multi-modal guider (guiders.py:211-225)."""

    cfg_scale: float = 1.0
    stg_scale: float = 0.0
    stg_blocks: Optional[List[int]] = field(default_factory=list)
    rescale_scale: float = 0.0
    modality_scale: float = 1.0
    skip_step: int = 0


@dataclass(frozen=True)
class MultiModalGuider:
    """CFG + STG + modality-isolation guidance, up to 4 passes/step
    (guiders.py:227-287)."""

    params: MultiModalGuiderParams
    negative_context: Optional[jnp.ndarray] = None

    def calculate(
        self,
        cond: jnp.ndarray,
        uncond_text,
        uncond_perturbed,
        uncond_modality,
    ) -> jnp.ndarray:
        pred = cond
        if isinstance(uncond_text, jnp.ndarray):
            pred = pred + (self.params.cfg_scale - 1) * (cond - uncond_text)
        if isinstance(uncond_perturbed, jnp.ndarray):
            pred = pred + self.params.stg_scale * (cond - uncond_perturbed)
        if isinstance(uncond_modality, jnp.ndarray):
            pred = pred + (self.params.modality_scale - 1) * (cond - uncond_modality)

        if self.params.rescale_scale != 0:
            # Per-sample statistics (all axes but batch): batched serving
            # must not couple independent clips through a shared variance
            # (identical to the reference for its B=1 case).
            axes = tuple(range(1, pred.ndim))
            cond_std = jnp.sqrt(jnp.var(cond, axis=axes, keepdims=True) + 1e-8)
            pred_std = jnp.sqrt(jnp.var(pred, axis=axes, keepdims=True) + 1e-8)
            factor = cond_std / pred_std
            factor = self.params.rescale_scale * factor + (1 - self.params.rescale_scale)
            pred = pred * factor
        return pred

    def do_unconditional_generation(self) -> bool:
        return not math.isclose(self.params.cfg_scale, 1.0)

    def do_perturbed_generation(self) -> bool:
        return not math.isclose(self.params.stg_scale, 0.0)

    def do_isolated_modality_generation(self) -> bool:
        return not math.isclose(self.params.modality_scale, 1.0)

    def should_skip_step(self, step: int) -> bool:
        if self.params.skip_step == 0:
            return False
        return step % (self.params.skip_step + 1) != 0
