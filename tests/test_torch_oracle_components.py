"""Torch/numpy-oracle parity for the diffusion machinery: schedulers and
guiders.

Sigma schedules shape every generated frame and guidance algebra decides
what the model's predictions become — divergence here is invisible to
shape tests. Each component is asserted against an independent
torch/numpy implementation of the reference formulas
(LTX_2_MLX/components/schedulers.py / guiders.py, cited per function).
"""

import math

import jax.numpy as jnp
import numpy as np
import torch

from tests.test_torch_oracle import assert_close, t2j

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# Schedulers (schedulers.py:22-253)
# ---------------------------------------------------------------------------


def oracle_ltx2_sigmas(steps, tokens, max_shift=2.05, base_shift=0.95,
                       stretch=True, terminal=0.1):
    """LTX2Scheduler.execute (schedulers.py:22-102), torch implementation."""
    sigmas = torch.linspace(1.0, 0.0, steps + 1, dtype=torch.float64)
    mm = (max_shift - base_shift) / (4096 - 1024)
    b = base_shift - mm * 1024
    exp_shift = math.exp(tokens * mm + b)
    safe = torch.where(sigmas != 0, sigmas, torch.ones_like(sigmas))
    shifted = torch.where(
        sigmas != 0, exp_shift / (exp_shift + (1.0 / safe - 1.0)),
        torch.zeros_like(sigmas),
    )
    sigmas = shifted
    if stretch and steps > 0:
        one_minus = 1.0 - sigmas
        scale_factor = float(one_minus[steps - 1]) / (1.0 - terminal)
        stretched = 1.0 - one_minus / scale_factor
        sigmas = torch.where(sigmas != 0, stretched, sigmas)
    return sigmas.float()


def oracle_linquad_sigmas(steps, threshold_noise=0.025, linear_steps=None):
    """LinearQuadraticScheduler.execute (schedulers.py:105-165)."""
    if steps == 1:
        return torch.tensor([1.0, 0.0])
    if linear_steps is None:
        linear_steps = steps // 2
    linear = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    diff = linear_steps - threshold_noise * steps
    qsteps = steps - linear_steps
    quad = []
    if qsteps > 0:
        qc = diff / (linear_steps * qsteps**2)
        lc = threshold_noise / linear_steps - 2 * diff / (qsteps**2)
        const = qc * (linear_steps**2)
        quad = [qc * i**2 + lc * i + const for i in range(linear_steps, steps)]
    sched = linear + quad + [1.0]
    return torch.tensor([1.0 - x for x in sched], dtype=torch.float32)


def oracle_beta_sigmas(steps, alpha=0.6, beta=0.6, shift=2.37, n=10000):
    """BetaScheduler.execute (schedulers.py:168-231,236-253)."""
    import scipy.stats

    timesteps = np.arange(1, n + 1) / n
    model_sigmas = np.array(
        [math.exp(shift) / (math.exp(shift) + (1 / t - 1) ** 1.0) for t in timesteps]
    )
    total = len(model_sigmas) - 1
    ts = 1 - np.linspace(0, 1, steps, endpoint=False)
    ts = np.rint(scipy.stats.beta.ppf(ts, alpha, beta) * total).tolist()
    ts = list(dict.fromkeys(ts))
    return torch.tensor(
        [float(model_sigmas[int(t)]) for t in ts] + [0.0], dtype=torch.float32
    )


class TestSchedulerOracle:
    def test_ltx2_token_dependent_shift(self):
        from ltx2_tpu.components.schedulers import LTX2Scheduler

        for steps, tokens in [(8, 1024), (30, 4096), (20, 6144), (8, 2345)]:
            got = LTX2Scheduler().execute(steps, tokens=tokens)
            want = oracle_ltx2_sigmas(steps, tokens)
            assert_close(jnp.asarray(got), want, rtol=1e-5, atol=1e-6,
                         msg=f"LTX2 sigmas steps={steps} tokens={tokens}")

    def test_ltx2_no_stretch(self):
        from ltx2_tpu.components.schedulers import LTX2Scheduler

        got = LTX2Scheduler().execute(10, tokens=4096, stretch=False)
        want = oracle_ltx2_sigmas(10, 4096, stretch=False)
        assert_close(jnp.asarray(got), want, rtol=1e-5, atol=1e-6, msg="no stretch")

    def test_linear_quadratic(self):
        from ltx2_tpu.components.schedulers import LinearQuadraticScheduler

        for steps, ln in [(30, None), (8, 3), (1, None), (12, 6)]:
            got = LinearQuadraticScheduler().execute(steps, linear_steps=ln)
            want = oracle_linquad_sigmas(steps, linear_steps=ln)
            assert_close(jnp.asarray(got), want, rtol=1e-5, atol=1e-6,
                         msg=f"linquad steps={steps}")

    def test_beta(self):
        from ltx2_tpu.components.schedulers import BetaScheduler

        for steps in (8, 30):
            got = BetaScheduler().execute(steps)
            want = oracle_beta_sigmas(steps)
            assert got.shape == tuple(want.shape)
            assert_close(jnp.asarray(got), want, rtol=1e-5, atol=1e-6,
                         msg=f"beta steps={steps}")

    def test_distilled_table(self):
        """The hard-coded 8-step distilled schedule + stage-2 tail
        (schedulers.py:236-253)."""
        from ltx2_tpu.components.schedulers import (
            DISTILLED_SIGMA_VALUES,
            STAGE_2_DISTILLED_SIGMA_VALUES,
        )

        np.testing.assert_allclose(
            DISTILLED_SIGMA_VALUES,
            [1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375, 0.725, 0.421875, 0.0],
        )
        np.testing.assert_allclose(
            STAGE_2_DISTILLED_SIGMA_VALUES, [0.909375, 0.725, 0.421875, 0.0]
        )


# ---------------------------------------------------------------------------
# Guiders (guiders.py:25-306)
# ---------------------------------------------------------------------------


def torch_projection_coef(a, b):
    """projection_coef (guiders.py:290-306)."""
    bsz = a.shape[0]
    af, bf = a.reshape(bsz, -1), b.reshape(bsz, -1)
    dot = (af * bf).sum(dim=1, keepdim=True)
    sq = (bf * bf).sum(dim=1, keepdim=True) + 1e-8
    return (dot / sq).reshape(bsz, *([1] * (a.ndim - 1)))


def torch_apg_delta(cond, uncond, scale, eta, norm_threshold,
                    momentum=None, running_avg=None, legacy=False):
    """LtxAPGGuider.delta (guiders.py:105-152) / LegacyStatefulAPGGuider
    (guiders.py:157-205)."""
    guidance = cond - uncond
    if legacy and momentum:
        running_avg = (
            guidance if running_avg is None else momentum * running_avg + guidance
        )
        guidance = running_avg
    if norm_threshold > 0:
        gnorm = torch.sqrt(
            (guidance * guidance).sum(dim=(-1, -2, -3), keepdim=True)
        )
        guidance = guidance * torch.minimum(
            torch.ones_like(guidance), norm_threshold / gnorm
        )
    coeff = torch_projection_coef(guidance, cond)
    g_par = coeff * cond
    g_apg = g_par * eta + (guidance - g_par)
    mult = scale if legacy else (scale - 1)
    return g_apg * mult, running_avg


class TestGuiderOracle:
    def _pair(self, seed=50, shape=(2, 3, 4, 5)):
        g = torch.Generator().manual_seed(seed)
        return torch.randn(*shape, generator=g), torch.randn(*shape, generator=g)

    def test_cfg_star_rescaling(self):
        """CFG*: uncond rescaled by projection onto cond (guiders.py:50-76)."""
        from ltx2_tpu.components.guiders import CFGStarRescalingGuider

        cond, uncond = self._pair()
        got = CFGStarRescalingGuider(scale=3.0).guide(t2j(cond), t2j(uncond))
        rescaled = torch_projection_coef(cond, uncond) * uncond
        want = cond + (3.0 - 1) * (cond - rescaled)
        assert_close(got, want, rtol=1e-5, atol=1e-6, msg="CFG*")

    def test_apg(self):
        """APG: parallel/orthogonal decomposition with norm clamp
        (guiders.py:105-152)."""
        from ltx2_tpu.components.guiders import LtxAPGGuider

        cond, uncond = self._pair(51)
        for eta, thr in [(1.0, 0.0), (0.5, 2.0), (0.0, 0.5)]:
            guider = LtxAPGGuider(scale=4.0, eta=eta, norm_threshold=thr)
            got = guider.guide(t2j(cond), t2j(uncond))
            delta, _ = torch_apg_delta(cond, uncond, 4.0, eta, thr)
            assert_close(got, cond + delta, rtol=1e-4, atol=1e-5,
                         msg=f"APG eta={eta} thr={thr}")

    def test_stateful_apg_momentum(self):
        """Legacy stateful APG: the momentum EMA carries across calls and
        the delta multiplier is `scale` (not scale-1) (guiders.py:157-205)."""
        from ltx2_tpu.components.guiders import LegacyStatefulAPGGuider

        guider = LegacyStatefulAPGGuider(
            scale=2.0, eta=0.5, norm_threshold=5.0, momentum=-0.75
        )
        running = None
        carry = None  # our guider threads the EMA explicitly (scan-friendly)
        for seed in (52, 53, 54):
            cond, uncond = self._pair(seed)
            got, carry = guider.guide(t2j(cond), t2j(uncond), carry)
            delta, running = torch_apg_delta(
                cond, uncond, 2.0, 0.5, 5.0,
                momentum=-0.75, running_avg=running, legacy=True,
            )
            assert_close(got, cond + delta, rtol=1e-4, atol=1e-5,
                         msg=f"stateful APG step seed={seed}")


class TestTopPSamplingOracle:
    """Nucleus sampling (reference prompt_enhancement.py:292-338): the
    deterministic part — nucleus support + renormalized distribution — is
    asserted exactly; the stochastic part by Monte-Carlo frequency match."""

    def _oracle_nucleus(self, logits, p, temperature):
        probs = torch.softmax(logits.float() / temperature, dim=-1)
        sorted_probs, sorted_idx = torch.sort(probs, descending=True, dim=-1)
        cum = torch.cumsum(sorted_probs, dim=-1)
        keep = (cum - sorted_probs) <= p  # crossing token included
        kept = torch.where(keep, sorted_probs, torch.zeros_like(sorted_probs))
        kept = kept / kept.sum(dim=-1, keepdim=True)
        dist = torch.zeros_like(probs)
        dist.scatter_(1, sorted_idx, kept)
        return dist  # (B, V) renormalized nucleus distribution

    def test_empirical_distribution_matches(self):
        import jax
        from ltx2_tpu.models.text_encoder.generation import sample_top_p

        g = torch.Generator().manual_seed(70)
        logits = torch.randn(1, 16, generator=g) * 2.0
        p, temp = 0.8, 0.7
        want = self._oracle_nucleus(logits, p, temp)[0].numpy()

        n = 4096
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        batched = jax.vmap(lambda k: sample_top_p(k, t2j(logits), p, temp)[0])
        samples = np.asarray(batched(keys))

        counts = np.bincount(samples, minlength=16) / n
        # Tokens outside the nucleus must NEVER be sampled.
        outside = want == 0
        assert counts[outside].sum() == 0, "sampled outside the nucleus"
        # Inside: empirical frequency within 4 sigma of the oracle prob.
        for tok in np.nonzero(~outside)[0]:
            sigma = math.sqrt(want[tok] * (1 - want[tok]) / n)
            assert abs(counts[tok] - want[tok]) < 4 * sigma + 1e-3, (
                f"token {tok}: {counts[tok]:.4f} vs {want[tok]:.4f}"
            )

    def test_greedy_is_argmax(self):
        """temperature/top_p = 0 selects argmax (greedy decode)."""
        import jax
        from ltx2_tpu.models.text_encoder.generation import sample_top_p

        g = torch.Generator().manual_seed(71)
        logits = torch.randn(3, 32, generator=g)
        # top_p ~ 0: nucleus = the single highest-probability token.
        got = sample_top_p(jax.random.PRNGKey(1), t2j(logits), 1e-6, 1.0)
        np.testing.assert_array_equal(
            np.asarray(got), logits.argmax(-1).numpy()
        )


# ---------------------------------------------------------------------------
# Positions (patchifiers.py:147-240, 287-347; tools.py:39-87) — these feed
# RoPE, so any off-by-one poisons every attention layer.
# ---------------------------------------------------------------------------


def oracle_video_positions(batch, frames, height, width, patch=1,
                           scale=(8, 32, 32), causal_fix=True, fps=None):
    """get_patch_grid_bounds + get_pixel_coords (+ /fps temporal), torch."""
    fc = torch.arange(0, frames, patch)
    hc = torch.arange(0, height, patch)
    wc = torch.arange(0, width, patch)
    gf, gh, gw = torch.meshgrid(fc, hc, wc, indexing="ij")
    starts = torch.stack([gf, gh, gw], dim=0)
    ends = starts + torch.tensor([patch] * 3).reshape(3, 1, 1, 1)
    coords = torch.stack([starts, ends], dim=-1).reshape(3, -1, 2)
    coords = coords[None].expand(batch, 3, coords.shape[1], 2).float()
    st = torch.tensor(scale, dtype=torch.float32).reshape(1, 3, 1, 1)
    px = coords * st
    if causal_fix:
        t = torch.clamp(px[:, 0:1] + 1 - scale[0], min=0)
        px = torch.cat([t, px[:, 1:]], dim=1)
    if fps is not None:
        px = torch.cat([px[:, 0:1] / fps, px[:, 1:]], dim=1)
    return px


def oracle_audio_positions(batch, frames, hop, sr, down=4, causal=True, shift=0):
    """AudioPatchifier seconds timestamps (patchifiers.py:287-347), torch."""

    def sec(a, b):
        fr = torch.arange(a, b, dtype=torch.float32)
        mel = fr * down
        if causal:
            mel = torch.clamp(mel + 1 - down, min=0)
        return mel * hop / sr

    start = sec(shift, frames + shift)
    end = sec(shift + 1, frames + shift + 1)
    return torch.stack([start, end], dim=-1)[None, None].expand(batch, 1, frames, 2)


class TestPositionsOracle:
    def test_video_pixel_coords_causal_fix(self):
        from ltx2_tpu.components.patchifiers import (
            SpatioTemporalScaleFactors,
            VideoLatentPatchifier,
            get_pixel_coords,
        )
        from ltx2_tpu.types import VideoLatentShape

        shape = VideoLatentShape(batch=2, channels=4, frames=3, height=2, width=5)
        pat = VideoLatentPatchifier(1)
        for causal in (True, False):
            bounds = pat.get_patch_grid_bounds(shape)
            got = get_pixel_coords(
                bounds, SpatioTemporalScaleFactors(8, 32, 32), causal_fix=causal
            )
            want = oracle_video_positions(2, 3, 2, 5, causal_fix=causal)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), want.numpy(),
                err_msg=f"pixel coords causal={causal}",
            )

    def test_video_tools_full_position_chain(self):
        """VideoLatentTools: bounds -> pixel coords (causal fix) -> temporal
        axis in SECONDS (/fps) (tools.py:39-87)."""
        from ltx2_tpu.components.patchifiers import VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.types import VideoLatentShape

        shape = VideoLatentShape(batch=1, channels=4, frames=3, height=2, width=4)
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=25.0
        )
        state = tools.create_initial_state()
        want = oracle_video_positions(1, 3, 2, 4, causal_fix=True, fps=25.0)
        np.testing.assert_allclose(
            np.asarray(state.positions), want.numpy(), rtol=1e-6,
            err_msg="tools position chain",
        )

    def test_audio_seconds_positions(self):
        """Audio timestamps: mel-frame causal offset, hop/sample-rate scaling,
        the stage-2 shift parameter (patchifiers.py:287-347)."""
        from ltx2_tpu.components.patchifiers import AudioPatchifier
        from ltx2_tpu.types import AudioLatentShape

        for causal, shift in [(True, 0), (False, 0), (True, 3)]:
            pat = AudioPatchifier(
                1, sample_rate=16000, hop_length=160,
                audio_latent_downsample_factor=4, is_causal=causal, shift=shift,
            )
            shape = AudioLatentShape(batch=2, channels=8, frames=6, mel_bins=4)
            got = pat.get_patch_grid_bounds(shape)
            want = oracle_audio_positions(2, 6, 160, 16000, causal=causal, shift=shift)
            np.testing.assert_allclose(
                np.asarray(got), want.numpy(), rtol=1e-6,
                err_msg=f"audio positions causal={causal} shift={shift}",
            )


# ---------------------------------------------------------------------------
# Steppers (diffusion_steps.py:70-296, res2s.py:10-79)
# ---------------------------------------------------------------------------


def oracle_ancestral_sigmas(s_from, s_to, eta=1.0):
    if s_to == 0.0:
        return 0.0, 0.0
    s_up = min(s_to, eta * (s_to**2 * (s_from**2 - s_to**2) / s_from**2) ** 0.5)
    return s_up, (s_to**2 - s_up**2) ** 0.5


def oracle_sde_coeff(sigma_next, sigma_up=None, sigma_down=None, sigma_max=None):
    """Res2s get_sde_coeff (diffusion_steps.py:202-249)."""
    if sigma_down is not None:
        alpha = (1 - sigma_next) / (1 - sigma_down)
        s_up = max(sigma_next**2 - sigma_down**2 * alpha**2, 0.0) ** 0.5
        return alpha, sigma_down, s_up
    if sigma_up is not None:
        s_up = min(sigma_up, sigma_next * 0.9999)
        sigmax = sigma_max if sigma_max is not None else 1.0
        resid = max(sigma_next**2 - s_up**2, 0.0) ** 0.5
        alpha = (sigmax - sigma_next) + resid
        s_down = resid / alpha if alpha != 0 else sigma_next
        return alpha, s_down, s_up
    return 1.0, sigma_next, 0.0


def oracle_phi(j, neg_h):
    """phi_j(z) (res2s.py:10-35)."""
    if abs(neg_h) < 1e-10:
        return 1.0 / math.factorial(j)
    remainder = sum(neg_h**k / math.factorial(k) for k in range(j))
    return (math.exp(neg_h) - remainder) / (neg_h**j)


class TestStepperOracle:
    def test_euler_ancestral(self):
        """Deterministic part to sigma_down + explicit-noise injection
        (diffusion_steps.py:70-129)."""
        import jax
        from ltx2_tpu.components.diffusion_steps import EulerAncestralDiffusionStep

        g = torch.Generator().manual_seed(80)
        sample = torch.randn(1, 6, 4, generator=g)
        denoised = torch.randn(1, 6, 4, generator=g)
        s, sn = 0.8, 0.5

        # Deterministic component (no key):
        got = EulerAncestralDiffusionStep().step(t2j(sample), t2j(denoised), s, sn)
        s_up, s_down = oracle_ancestral_sigmas(s, sn)
        velocity = (sample - denoised) / s
        want = sample + velocity * (s_down - s)
        assert_close(got, want, rtol=1e-5, atol=1e-6, msg="ancestral deterministic")

        # With a key, the result differs from deterministic by noise*sigma_up
        # with unit-normal statistics.
        noisy = EulerAncestralDiffusionStep().step(
            t2j(sample.expand(64, 6, 4)), t2j(denoised.expand(64, 6, 4)), s, sn,
            key=jax.random.PRNGKey(0),
        )
        resid = (np.asarray(noisy) - want.numpy()) / s_up
        assert abs(resid.mean()) < 0.1 and abs(resid.std() - 1.0) < 0.1

        # Final step: sigma_up = sigma_down = 0 -> pure Euler to 0.
        got0 = EulerAncestralDiffusionStep().step(t2j(sample), t2j(denoised), s, 0.0)
        want0 = sample + velocity * (0.0 - s)
        assert_close(got0, want0, rtol=1e-5, atol=1e-6, msg="ancestral final")

    def test_res2s_sde_coeff(self):
        from ltx2_tpu.components.diffusion_steps import Res2sDiffusionStep

        for kwargs in [
            dict(sigma_next=0.5, sigma_up=0.25),
            dict(sigma_next=0.5, sigma_down=0.3),
            dict(sigma_next=0.7, sigma_up=0.9),  # clamped to 0.9999*sigma_next
            dict(sigma_next=0.4),
            dict(sigma_next=0.4, sigma_up=0.2, sigma_max=2.0),
        ]:
            got = Res2sDiffusionStep.get_sde_coeff(**kwargs)
            want = oracle_sde_coeff(**kwargs)
            np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(kwargs))

    def test_res2s_step(self):
        """SDE mixing with explicit noise (diffusion_steps.py:252-296)."""
        from ltx2_tpu.components.diffusion_steps import Res2sDiffusionStep

        g = torch.Generator().manual_seed(81)
        sample = torch.randn(2, 5, 3, generator=g)
        denoised = torch.randn(2, 5, 3, generator=g)
        noise = torch.randn(2, 5, 3, generator=g)
        s, sn = 0.9, 0.6

        got = Res2sDiffusionStep().step(
            t2j(sample), t2j(denoised), s, sn, noise=t2j(noise)
        )
        alpha, s_down, s_up = oracle_sde_coeff(sn, sigma_up=sn * 0.5)
        eps = (sample - denoised) / (s - sn)
        den_next = sample - s * eps
        want = alpha * (den_next + s_down * eps) + s_up * noise
        assert_close(got, want, rtol=1e-4, atol=1e-5, msg="res2s step")

        # sigma_next = 0 -> returns denoised directly.
        got0 = Res2sDiffusionStep().step(t2j(sample), t2j(denoised), s, 0.0)
        assert_close(got0, denoised, msg="res2s final step")

    def test_phi_and_res2s_coefficients(self):
        """Exponential-integrator phi functions + RK coefficients
        (res2s.py:10-79)."""
        from ltx2_tpu.components.res2s import get_res2s_coefficients, phi

        for j in (1, 2, 3):
            for h in (-0.5, -1e-12, 0.3, 2.0):
                np.testing.assert_allclose(
                    phi(j, h), oracle_phi(j, h), rtol=1e-12,
                    err_msg=f"phi_{j}({h})",
                )
        for h in (0.2, 1.0, 2.5):
            a21, b1, b2 = get_res2s_coefficients(h, {})
            c2 = 0.5
            want_a21 = c2 * oracle_phi(1, -h * c2)
            want_b2 = oracle_phi(2, -h) / c2
            want_b1 = oracle_phi(1, -h) - want_b2
            np.testing.assert_allclose(
                (a21, b1, b2), (want_a21, want_b1, want_b2), rtol=1e-12,
                err_msg=f"res2s coeffs h={h}",
            )


# ---------------------------------------------------------------------------
# Loader math: fp8-E4M3 conversion + LoRA fuse (fp8_loader.py, lora_loader.py)
# ---------------------------------------------------------------------------


class TestFp8Oracle:
    def test_cast_matches_torch_float8(self):
        """JAX's float8_e4m3fn cast must agree with torch's — the checkpoint
        dequant path (w_fp8 * scale) depends on identical rounding."""
        g = torch.Generator().manual_seed(90)
        w = torch.randn(64, 48, generator=g) * 3.0
        jt = jnp.asarray(w.numpy()).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        tt = w.to(torch.float8_e4m3fn).to(torch.float32)
        np.testing.assert_array_equal(np.asarray(jt), tt.numpy())

    def test_quantize_dequant_roundtrip(self):
        """Symmetric per-tensor quantization: scale = amax/FP8_MAX and the
        dequantized weight within one fp8 ulp (~2^-2 relative at E4M3)."""
        from ltx2_tpu.loader.fp8 import quantize_tensor_fp8

        g = torch.Generator().manual_seed(91)
        w = torch.randn(32, 24, generator=g)
        q, scale = quantize_tensor_fp8(jnp.asarray(w.numpy()))
        # Oracle scale
        want_scale = w.abs().max().item() / 448.0  # E4M3 max normal
        np.testing.assert_allclose(float(scale), want_scale, rtol=1e-6)
        # Torch-side round trip with the same scale
        tq = (w / want_scale).to(torch.float8_e4m3fn)
        np.testing.assert_array_equal(
            np.asarray(q.astype(jnp.float32)), tq.to(torch.float32).numpy()
        )
        deq = np.asarray(q.astype(jnp.float32)) * float(scale)
        np.testing.assert_allclose(deq, w.numpy(), rtol=0.07, atol=1e-3)

    def test_per_leading_axis_scales(self):
        """Stacked-block layout: one scale per layer index (axis 0)."""
        from ltx2_tpu.loader.fp8 import quantize_tensor_fp8

        g = torch.Generator().manual_seed(92)
        w = torch.randn(4, 8, 8, generator=g) * torch.tensor([1.0, 10.0, 0.1, 3.0]).reshape(4, 1, 1)
        q, scale = quantize_tensor_fp8(jnp.asarray(w.numpy()), per_leading_axis=True)
        want = w.reshape(4, -1).abs().amax(dim=1).numpy() / 448.0
        np.testing.assert_allclose(np.asarray(scale).reshape(-1), want, rtol=1e-6)


class TestLoRAOracle:
    def test_delta_math(self):
        """delta = strength * (B @ A) (lora_loader.py:129-180)."""
        from ltx2_tpu.loader.lora import compute_lora_delta

        g = torch.Generator().manual_seed(93)
        A = torch.randn(8, 32, generator=g)   # (rank, in)
        B = torch.randn(24, 8, generator=g)   # (out, rank)
        got = compute_lora_delta(
            {"a": A.numpy(), "b": B.numpy()}, "a", "b", strength=-1.5
        )
        want = (B @ A).numpy() * -1.5
        np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# Conditioning (latent.py:15-117, keyframe.py:10-87, tools.py:139-164)
# ---------------------------------------------------------------------------


class TestConditioningOracle:
    def _tools_state(self, frames=3, height=2, width=2, channels=4, fps=25.0):
        import jax
        from ltx2_tpu.components import GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.types import VideoLatentShape

        shape = VideoLatentShape(
            batch=1, channels=channels, frames=frames, height=height, width=width
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=fps
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(5), tools.create_initial_state(), 1.0
        )
        return tools, state

    def test_latent_index_replacement(self):
        """i2v token replacement: tokens/clean replaced in [start, stop),
        mask set to 1-strength there, positions untouched (latent.py:39-117)."""
        from ltx2_tpu.conditioning.latent import VideoConditionByLatentIndex

        tools, state = self._tools_state()
        g = torch.Generator().manual_seed(100)
        cond = torch.randn(1, 4, 1, 2, 2, generator=g)  # one latent frame

        out = VideoConditionByLatentIndex(
            latent=t2j(cond), strength=0.3, latent_idx=1
        ).apply_to(state, tools)

        lat = np.asarray(state.latent).copy()
        mask = np.asarray(state.denoise_mask).copy()
        tokens = cond.permute(0, 2, 3, 4, 1).reshape(1, 4, 4).numpy()  # patchify p=1
        start, stop = 4, 8  # frame 1 of a 2x2 grid
        lat[:, start:stop] = tokens
        mask[:, start:stop] = 1.0 - 0.3
        np.testing.assert_allclose(np.asarray(out.latent), lat, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.clean_latent)[:, start:stop], tokens, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.denoise_mask), mask, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.positions), np.asarray(state.positions)
        )

    def test_keyframe_append_positions(self):
        """Keyframe tokens APPEND with temporally-offset seconds positions;
        causal fix only at frame_idx 0 (keyframe.py:10-87)."""
        from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
        from tests.test_torch_oracle_components import oracle_video_positions

        tools, state = self._tools_state(fps=25.0)
        n0 = np.asarray(state.latent).shape[1]
        g = torch.Generator().manual_seed(101)
        kf = torch.randn(1, 4, 1, 2, 2, generator=g)
        frame_idx = 16

        out = VideoConditionByKeyframeIndex(
            keyframes=t2j(kf), frame_idx=frame_idx, strength=0.8
        ).apply_to(state, tools)

        assert np.asarray(out.latent).shape[1] == n0 + 4
        tokens = kf.permute(0, 2, 3, 4, 1).reshape(1, 4, 4).numpy()
        np.testing.assert_allclose(np.asarray(out.latent)[:, n0:], tokens, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.denoise_mask)[:, n0:], np.full((1, 4, 1), 0.2), rtol=1e-6
        )
        # Oracle positions: keyframe grid (1 frame), NO causal fix (idx != 0),
        # temporal +frame_idx then /fps.
        want = oracle_video_positions(1, 1, 2, 2, causal_fix=False).numpy()
        want[:, 0:1] = (want[:, 0:1] + frame_idx) / 25.0
        np.testing.assert_allclose(
            np.asarray(out.positions)[:, :, n0:], want, rtol=1e-6
        )

        # frame_idx = 0 applies the causal fix before the offset.
        out0 = VideoConditionByKeyframeIndex(
            keyframes=t2j(kf), frame_idx=0, strength=0.8
        ).apply_to(state, tools)
        want0 = oracle_video_positions(1, 1, 2, 2, causal_fix=True).numpy()
        want0[:, 0:1] = want0[:, 0:1] / 25.0
        np.testing.assert_allclose(
            np.asarray(out0.positions)[:, :, n0:], want0, rtol=1e-6
        )

    def test_clear_conditioning(self):
        """clear_conditioning truncates appended tokens and resets the mask
        to ones (tools.py:139-164)."""
        from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex

        tools, state = self._tools_state()
        n0 = np.asarray(state.latent).shape[1]
        g = torch.Generator().manual_seed(102)
        kf = torch.randn(1, 4, 1, 2, 2, generator=g)
        appended = VideoConditionByKeyframeIndex(
            keyframes=t2j(kf), frame_idx=8, strength=0.5
        ).apply_to(state, tools)

        cleared = tools.clear_conditioning(appended)
        assert np.asarray(cleared.latent).shape[1] == n0
        np.testing.assert_allclose(
            np.asarray(cleared.latent), np.asarray(state.latent), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cleared.denoise_mask), np.ones((1, n0, 1)), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cleared.positions), np.asarray(state.positions)
        )
