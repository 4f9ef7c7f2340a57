"""Diffusion stepping strategies.

Capability parity with reference LTX_2_MLX/components/diffusion_steps.py
(Euler / EulerAncestral / Heun / Res2s), re-expressed as pure jit-safe
functions: sigmas may be traced arrays (the step math runs inside the scanned
denoise loop), and stochastic steps take an explicit PRNG key.

All step math runs in fp32 regardless of the sample dtype (fp32 island,
reference diffusion_steps.py:61-65).
"""

from __future__ import annotations

from typing import Optional, Protocol, Tuple, Union

import jax
import jax.numpy as jnp

from ltx2_tpu.core import to_velocity

Scalar = Union[float, jnp.ndarray]


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
        velocity = to_velocity(sample, sigma, denoised_sample).astype(jnp.float32)
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
    (diffusion_steps.py:70-129; improves audio diversity)."""

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

        velocity = to_velocity(sample, sigma, denoised_sample).astype(jnp.float32)
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

        velocity = to_velocity(sample, sigma, denoised_sample).astype(jnp.float32)
        sample_f32 = sample.astype(jnp.float32)
        predicted = sample_f32 + velocity * dt

        if denoised_at_predicted is None:
            return predicted.astype(sample.dtype)

        velocity_at_predicted = to_velocity(
            predicted.astype(sample.dtype), sigma_next, denoised_at_predicted
        ).astype(jnp.float32)
        result = sample_f32 + 0.5 * (velocity + velocity_at_predicted) * dt
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
    (diffusion_steps.py:193-296). Used by the ti2vid_hq pipeline."""

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
