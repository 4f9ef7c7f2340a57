"""Diffusion stepping strategies.

Capability parity with reference LTX_2_MLX/components/diffusion_steps.py
(Euler / EulerAncestral / Heun / Res2s), re-expressed as pure jit-safe
functions: sigmas may be traced arrays (the step math runs inside the scanned
denoise loop), and stochastic steps take an explicit PRNG key. The one
exception is Res2s, whose SDE/RK coefficients are host float math over the
static sigma schedule — it requires CONCRETE sigmas (the ti2vid_hq pipeline
drives it from a host loop).

All step math runs in fp32 regardless of the sample dtype (fp32 island,
reference diffusion_steps.py:61-65): the velocity is formed in fp32 directly
(not round-tripped through the public core.to_velocity, which casts back to
the sample dtype for API parity and would quantize bf16 samples to 8
mantissa bits before the integration).
"""

from __future__ import annotations

from typing import Optional, Protocol, Tuple, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


def _velocity_f32(
    sample: jnp.ndarray, sigma: Scalar, denoised_sample: jnp.ndarray
) -> jnp.ndarray:
    """(x - x0) / sigma fully in fp32 — the steppers' internal fp32 island."""
    return (
        sample.astype(jnp.float32) - denoised_sample.astype(jnp.float32)
    ) / jnp.asarray(sigma, jnp.float32)


class DiffusionStepProtocol(Protocol):
    def step(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: Scalar,
        sigma_next: Scalar,
        **kwargs,
    ) -> jnp.ndarray: ...


class EulerDiffusionStep:
    """x <- x + v * (sigma_next - sigma) (diffusion_steps.py:25-67)."""

    def step(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: Scalar,
        sigma_next: Scalar,
        **_kwargs,
    ) -> jnp.ndarray:
        velocity = _velocity_f32(sample, sigma, denoised_sample)
        dt = jnp.asarray(sigma_next, jnp.float32) - jnp.asarray(sigma, jnp.float32)
        result = sample.astype(jnp.float32) + velocity * dt
        return result.astype(sample.dtype)


def get_ancestral_step(
    sigma_from: Scalar, sigma_to: Scalar, eta: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sigma_up / sigma_down split for ancestral sampling; jit-safe
    (diffusion_steps.py:83-90)."""
    sigma_from = jnp.asarray(sigma_from, jnp.float32)
    sigma_to = jnp.asarray(sigma_to, jnp.float32)
    safe_from = jnp.where(sigma_from == 0.0, 1.0, sigma_from)
    up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(
            jnp.maximum(sigma_to**2 * (sigma_from**2 - sigma_to**2) / safe_from**2, 0.0)
        ),
    )
    sigma_up = jnp.where(sigma_to == 0.0, 0.0, up)
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_up, sigma_down


class EulerAncestralDiffusionStep:
    """Euler-ancestral: deterministic step to sigma_down + noise*sigma_up
    (diffusion_steps.py:70-129; improves audio diversity).

    `key` is REQUIRED for correct ancestral sampling: without the
    noise*sigma_up injection the sample lands at sigma_down < sigma_next
    and the trajectory is systematically under-noised. key=None runs only
    the deterministic sub-step — a testing affordance (oracle comparison
    of the deterministic component), never a sampler configuration.
    """

    def step(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: Scalar,
        sigma_next: Scalar,
        key: Optional[jax.Array] = None,
        **_kwargs,
    ) -> jnp.ndarray:
        sigma = jnp.asarray(sigma, jnp.float32)
        sigma_next = jnp.asarray(sigma_next, jnp.float32)
        sigma_up, sigma_down = get_ancestral_step(sigma, sigma_next)

        velocity = _velocity_f32(sample, sigma, denoised_sample)
        result = sample.astype(jnp.float32) + velocity * (sigma_down - sigma)

        if key is not None:
            noise = jax.random.normal(key, result.shape, jnp.float32)
            result = result + noise * sigma_up
        return result.astype(sample.dtype)


class HeunDiffusionStep:
    """Predictor-corrector Heun; caller supplies the second model eval
    (diffusion_steps.py:132-190). Falls back to Euler without it."""

    def step(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: Scalar,
        sigma_next: Scalar,
        denoised_at_predicted: Optional[jnp.ndarray] = None,
        **_kwargs,
    ) -> jnp.ndarray:
        sigma = jnp.asarray(sigma, jnp.float32)
        sigma_next = jnp.asarray(sigma_next, jnp.float32)
        dt = sigma_next - sigma

        velocity = _velocity_f32(sample, sigma, denoised_sample)
        sample_f32 = sample.astype(jnp.float32)
        predicted = sample_f32 + velocity * dt

        if denoised_at_predicted is None:
            return predicted.astype(sample.dtype)

        # Final step (sigma_next == 0): the corrector velocity
        # (predicted - x0)/0 is undefined — the reference raises there; in
        # jit we take the scanned loop's policy (denoise.py) and return the
        # Euler predictor, which at sigma_next=0 IS the denoised sample.
        sn_safe = jnp.where(sigma_next == 0.0, 1.0, sigma_next)
        velocity_at_predicted = _velocity_f32(
            predicted, sn_safe, denoised_at_predicted
        )
        heun = sample_f32 + 0.5 * (velocity + velocity_at_predicted) * dt
        result = jnp.where(sigma_next == 0.0, predicted, heun)
        return result.astype(sample.dtype)

    def predict(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: Scalar,
        sigma_next: Scalar,
    ) -> jnp.ndarray:
        """Euler predictor point, for the caller to run the second eval at."""
        return EulerDiffusionStep().step(sample, denoised_sample, sigma, sigma_next)


class Res2sDiffusionStep:
    """2nd-order exponential-integrator step with SDE noise mixing
    (diffusion_steps.py:193-296). Used by the ti2vid_hq pipeline.

    HOST-DRIVEN: sigma/sigma_next must be concrete Python floats (the SDE
    coefficients are host float math over the static schedule) — calling
    this inside jit/scan with traced sigmas raises ConcretizationTypeError
    by design; ti2vid_hq drives it from a host loop around jitted evals.
    """

    @staticmethod
    def get_sde_coeff(
        sigma_next: float,
        sigma_up: Optional[float] = None,
        sigma_down: Optional[float] = None,
        sigma_max: Optional[float] = None,
    ) -> Tuple[float, float, float]:
        """Host-side float math: (alpha_ratio, sigma_down, sigma_up).

        Sigma schedules are static, so these coefficients are computed with
        Python floats at trace time (diffusion_steps.py:202-249).
        """
        import math

        if sigma_down is not None:
            alpha_ratio = (1 - sigma_next) / (1 - sigma_down)
            val = sigma_next**2 - sigma_down**2 * alpha_ratio**2
            sigma_up = max(val, 0.0) ** 0.5
        elif sigma_up is not None:
            sigma_up = min(sigma_up, sigma_next * 0.9999)
            sigmax = sigma_max if sigma_max is not None else 1.0
            sigma_signal = sigmax - sigma_next
            sigma_residual = max(sigma_next**2 - sigma_up**2, 0.0) ** 0.5
            alpha_ratio = sigma_signal + sigma_residual
            sigma_down = sigma_residual / alpha_ratio if alpha_ratio != 0 else sigma_next
        else:
            alpha_ratio, sigma_down, sigma_up = 1.0, sigma_next, 0.0

        if math.isnan(sigma_up):
            sigma_up = 0.0
        if math.isnan(sigma_down):
            sigma_down = sigma_next
        if math.isnan(alpha_ratio):
            alpha_ratio = 1.0
        return alpha_ratio, sigma_down, sigma_up

    def step(
        self,
        sample: jnp.ndarray,
        denoised_sample: jnp.ndarray,
        sigma: float,
        sigma_next: float,
        noise: Optional[jnp.ndarray] = None,
        **_kwargs,
    ) -> jnp.ndarray:
        alpha_ratio, sigma_down, sigma_up = self.get_sde_coeff(
            float(sigma_next), sigma_up=float(sigma_next) * 0.5
        )
        output_dtype = denoised_sample.dtype

        if sigma_up == 0.0 or float(sigma_next) == 0.0:
            return denoised_sample

        sample_f32 = sample.astype(jnp.float32)
        denoised_f32 = denoised_sample.astype(jnp.float32)

        eps_next = (sample_f32 - denoised_f32) / (float(sigma) - float(sigma_next))
        denoised_next = sample_f32 - float(sigma) * eps_next

        x_noised = alpha_ratio * (denoised_next + sigma_down * eps_next)
        if noise is not None:
            x_noised = x_noised + sigma_up * noise.astype(jnp.float32)
        return x_noised.astype(output_dtype)
