"""Sigma schedule generators for LTX-2 rectified-flow sampling.

Capability parity with reference LTX_2_MLX/components/schedulers.py.

Schedules are tiny (steps+1 values), computed once per generation, and are
*static* w.r.t. XLA compilation — so they are generated host-side in float64
numpy and handed to the jitted denoise loop as a constant array. This is the
TPU-idiomatic split: no device round-trips, no dynamic shapes inside jit.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Protocol, Sequence

import numpy as np

BASE_SHIFT_ANCHOR = 1024
MAX_SHIFT_ANCHOR = 4096


class SchedulerProtocol(Protocol):
    def execute(self, steps: int, **kwargs) -> np.ndarray: ...


class LTX2Scheduler:
    """Default LTX-2 scheduler: token-count-dependent sigmoid shift + stretch.

    Reference semantics (schedulers.py:22-102): linspace(1->0, steps+1), shift
    s interpolated linearly in token count between base_shift@1024 and
    max_shift@4096, sigma' = e^s / (e^s + (1/sigma - 1)), then stretch so the
    last nonzero sigma maps onto `terminal`.
    """

    def execute(
        self,
        steps: int,
        tokens: Optional[int] = None,
        latent_shape: Optional[Sequence[int]] = None,
        max_shift: float = 2.05,
        base_shift: float = 0.95,
        stretch: bool = True,
        terminal: float = 0.1,
        **_kwargs,
    ) -> np.ndarray:
        if tokens is None:
            if latent_shape is not None:
                tokens = int(np.prod(latent_shape[2:]))
            else:
                tokens = MAX_SHIFT_ANCHOR

        sigmas = np.linspace(1.0, 0.0, steps + 1)

        mm = (max_shift - base_shift) / (MAX_SHIFT_ANCHOR - BASE_SHIFT_ANCHOR)
        b = base_shift - mm * BASE_SHIFT_ANCHOR
        sigma_shift = tokens * mm + b
        exp_shift = math.exp(sigma_shift)

        with np.errstate(divide="ignore"):
            shifted = np.where(
                sigmas != 0,
                exp_shift / (exp_shift + (1.0 / np.where(sigmas != 0, sigmas, 1.0) - 1.0)),
                0.0,
            )
        sigmas = shifted

        if stretch and steps > 0:
            one_minus = 1.0 - sigmas
            scale_factor = one_minus[steps - 1] / (1.0 - terminal)
            # steps=1 leaves sigmas=[1, 0]: the last nonzero sigma is
            # already 1.0, so scale_factor is 0 and the stretch is
            # undefined (the reference's own division silently NaNs the
            # whole schedule here) — skip it, [1, 0] is the right answer.
            if scale_factor != 0.0:
                stretched = 1.0 - one_minus / scale_factor
                sigmas = np.where(sigmas != 0, stretched, sigmas)

        return sigmas.astype(np.float32)


class LinearQuadraticScheduler:
    """Linear ramp up to threshold_noise, then quadratic (schedulers.py:105-165)."""

    def execute(
        self,
        steps: int,
        threshold_noise: float = 0.025,
        linear_steps: Optional[int] = None,
        **_kwargs,
    ) -> np.ndarray:
        if steps == 1:
            return np.array([1.0, 0.0], dtype=np.float32)

        if linear_steps is None:
            linear_steps = steps // 2

        linear = [i * threshold_noise / linear_steps for i in range(linear_steps)]

        diff = linear_steps - threshold_noise * steps
        quadratic_steps = steps - linear_steps
        quadratic = []
        if quadratic_steps > 0:
            qc = diff / (linear_steps * quadratic_steps**2)
            lc = threshold_noise / linear_steps - 2 * diff / (quadratic_steps**2)
            const = qc * linear_steps**2
            quadratic = [qc * i**2 + lc * i + const for i in range(linear_steps, steps)]

        schedule = [1.0 - x for x in (linear + quadratic + [1.0])]
        return np.array(schedule, dtype=np.float32)


class BetaScheduler:
    """Beta-distribution timestep sampling over flux-shifted sigmas
    (schedulers.py:168-217; https://arxiv.org/abs/2407.12173)."""

    shift = 2.37
    timesteps_length = 10000

    def execute(
        self, steps: int, alpha: float = 0.6, beta: float = 0.6, **_kwargs
    ) -> np.ndarray:
        try:
            import scipy.stats
        except ImportError as e:  # pragma: no cover
            raise ImportError("BetaScheduler requires scipy") from e

        model_sigmas = _precalculate_model_sampling_sigmas(self.shift, self.timesteps_length)
        total_timesteps = len(model_sigmas) - 1

        ts = 1 - np.linspace(0, 1, steps, endpoint=False)
        ts = np.rint(scipy.stats.beta.ppf(ts, alpha, beta) * total_timesteps).tolist()
        ts = list(dict.fromkeys(ts))  # dedup, order-preserving

        sigmas = [float(model_sigmas[int(t)]) for t in ts] + [0.0]
        return np.array(sigmas, dtype=np.float32)


@lru_cache(maxsize=5)
def _precalculate_model_sampling_sigmas(shift: float, timesteps_length: int) -> np.ndarray:
    timesteps = np.arange(1, timesteps_length + 1) / timesteps_length
    return np.array([flux_time_shift(shift, 1.0, t) for t in timesteps])


def flux_time_shift(mu: float, sigma: float, t: float) -> float:
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


# Official 8-step distilled schedule + stage-2 tail (schedulers.py:236-253).
DISTILLED_SIGMA_VALUES = [
    1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375, 0.725, 0.421875, 0.0,
]

STAGE_2_DISTILLED_SIGMA_VALUES = [0.909375, 0.725, 0.421875, 0.0]


def get_sigma_schedule(
    num_steps: int,
    distilled: bool = False,
    tokens: Optional[int] = None,
    latent_shape: Optional[Sequence[int]] = None,
) -> np.ndarray:
    if distilled:
        return np.array(DISTILLED_SIGMA_VALUES, dtype=np.float32)
    return LTX2Scheduler().execute(steps=num_steps, tokens=tokens, latent_shape=latent_shape)
