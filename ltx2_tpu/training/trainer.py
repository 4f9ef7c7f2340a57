"""Rectified-flow fine-tuning for the LTX-2 DiT.

The reference is inference-only (its MLX models have no training path);
this module is new TPU-first capability: one jitted train step — loss,
grads, optimizer update — over the same functional param tree the
inference stack uses, so everything the serving side already provides
composes for free:

- **Remat**: `LTXModelConfig.remat=True` checkpoints every transformer
  block inside the scan, so backprop recomputes activations per block and
  peak memory stays O(one block) instead of O(48 blocks).
- **Sharding**: grads and Adam state inherit the params' NamedShardings
  under GSPMD — `shard_dit_params` (TP) and batch-sharded inputs (DP)
  train multi-chip with zero training-specific communication code.
- **Partial fine-tuning**: `trainable_mask(params, predicate)` +
  `optax.multi_transform` freezes everything the predicate rejects (e.g. train
  only attention projections, LoRA-style targets, or AdaLN tables).

Objective (rectified flow / flow matching, the training objective of the
LTX-2 family): x_sigma = (1 - sigma) * x0 + sigma * noise, and the DiT
predicts VELOCITY v = noise - x0 (matching core.to_velocity's convention
x_sigma = x0 + sigma * v). Loss is fp32 MSE, optionally timestep-weighted.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    Modality,
    ltx_model_apply,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainBatch:
    """One training batch of patchified video latents (a pytree).

    x0:           (B, N, C) clean latent tokens (VAE-encoded, normalized)
    positions:    (B, 3, N, 2) fractional RoPE position bounds
    context:      (B, S, D_ctx) text conditioning
    context_mask: optional additive mask for padded captions (the same
                  convention inference threads from the Gemma attention
                  mask) — REQUIRED when batching variable-length prompts,
                  or cross-attention trains against padding tokens.
    """

    x0: jnp.ndarray
    positions: jnp.ndarray
    context: jnp.ndarray
    context_mask: Optional[jnp.ndarray] = None
    # Joint AV fine-tuning (AudioVideo checkpoints): audio latent tokens
    # and their seconds-positions; the loss becomes the sum of both
    # modalities' flow-matching MSEs (shared sigma per sample, like the
    # AV denoise loop's shared timestep).
    audio_x0: Optional[jnp.ndarray] = None
    audio_positions: Optional[jnp.ndarray] = None
    audio_context: Optional[jnp.ndarray] = None
    audio_context_mask: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.95
    grad_clip_norm: Optional[float] = 1.0
    # Logit-normal timestep sampling concentrates sigmas mid-schedule where
    # the velocity target is hardest (standard flow-matching practice);
    # uniform when None.
    logit_normal_loc: Optional[float] = 0.0
    logit_normal_scale: float = 1.0


def _sample_sigmas(key: jax.Array, batch: int, tc: TrainConfig) -> jnp.ndarray:
    if tc.logit_normal_loc is None:
        return jax.random.uniform(key, (batch,), jnp.float32, 1e-4, 1.0 - 1e-4)
    z = tc.logit_normal_loc + tc.logit_normal_scale * jax.random.normal(
        key, (batch,), jnp.float32
    )
    return jax.nn.sigmoid(z)


def rectified_flow_loss(
    params,
    cfg: LTXModelConfig,
    batch: TrainBatch,
    key: jax.Array,
    tc: TrainConfig = TrainConfig(),
) -> jnp.ndarray:
    """Flow-matching MSE for one batch: model(x_sigma, sigma) vs noise - x0.

    With audio fields present, both modalities share the per-sample sigma
    (mirroring the AV denoise loop) and the loss is the sum of their MSEs.
    """
    b = batch.x0.shape[0]
    k_sigma, k_v, k_a = jax.random.split(key, 3)
    sigmas = _sample_sigmas(k_sigma, b, tc)
    s = sigmas[:, None, None]

    def noised(x0_raw, k):
        x0 = x0_raw.astype(jnp.float32)
        noise = jax.random.normal(k, x0.shape, jnp.float32)
        return x0, noise, ((1.0 - s) * x0 + s * noise).astype(cfg.dtype)

    x0, noise, x_sigma = noised(batch.x0, k_v)
    video = Modality(
        latent=x_sigma,
        context=batch.context,
        context_mask=batch.context_mask,
        timesteps=sigmas,
        positions=batch.positions,
        sigma=sigmas,
    )

    if batch.audio_x0 is None:
        v_pred = ltx_model_apply(params, cfg, video=video)
        return jnp.mean((v_pred.astype(jnp.float32) - (noise - x0)) ** 2)

    from ltx2_tpu.models.transformer.model import LTXModelType

    if cfg.model_type != LTXModelType.AudioVideo:
        raise ValueError(
            "batch carries audio fields but cfg.model_type is video-only — "
            "a bare-array return would mis-unpack into (v_pred, a_pred)"
        )
    a0, a_noise, a_sigma_x = noised(batch.audio_x0, k_a)
    has_own_ctx = batch.audio_context is not None
    audio = Modality(
        latent=a_sigma_x,
        context=batch.audio_context if has_own_ctx else batch.context,
        # The video mask only applies when audio SHARES the video context;
        # a separate audio context needs its own mask (different S).
        context_mask=(
            batch.audio_context_mask if has_own_ctx else batch.context_mask
        ),
        timesteps=sigmas,
        positions=batch.audio_positions,
        sigma=sigmas,
    )
    v_pred, a_pred = ltx_model_apply(params, cfg, video=video, audio=audio)
    v_loss = jnp.mean((v_pred.astype(jnp.float32) - (noise - x0)) ** 2)
    a_loss = jnp.mean((a_pred.astype(jnp.float32) - (a_noise - a0)) ** 2)
    return v_loss + a_loss


def trainable_mask(params, predicate: Callable[[str], bool]):
    """Bool pytree for make_optimizer(mask=...): predicate over '/'-joined tree paths.
    e.g. `lambda p: "attn" in p` trains only the attention projections."""
    from ltx2_tpu.parallel.sharding import path_to_str

    return jax.tree_util.tree_map_with_path(
        lambda path, _: predicate(path_to_str(path)), params
    )


def make_optimizer(tc: TrainConfig, mask=None) -> optax.GradientTransformation:
    chain = []
    if tc.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(tc.grad_clip_norm))
    chain.append(
        optax.adamw(
            tc.learning_rate, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay
        )
    )
    opt = optax.chain(*chain)
    if mask is not None:
        # multi_transform (not optax.masked): frozen leaves get set_to_zero
        # updates — masked alone would pass their RAW gradients through.
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask
        )
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )
    return opt


def partition_params(params, mask):
    """Split a param tree by a bool mask into (trainable, frozen) trees.

    Non-selected positions become None — jax treats None as an empty
    pytree node, so each half is a valid tree containing only its leaves.
    """
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask
    )
    return trainable, frozen


def merge_params(trainable, frozen):
    """Inverse of partition_params (exactly one side is non-None per slot)."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t,
        trainable, frozen,
        is_leaf=lambda x: x is None,
    )


def make_train_step(
    cfg: LTXModelConfig,
    optimizer: optax.GradientTransformation,
    tc: TrainConfig = TrainConfig(),
    trainable_mask=None,
):
    """One jitted (params, opt_state, batch, key) -> (loss, params, opt_state).

    Donates params/opt_state so the update is in-place in HBM (no 2x weight
    peak). Under a mesh, pass TP-sharded params and DP-sharded batches —
    GSPMD propagates shardings through grads and Adam moments.

    With `trainable_mask`, the returned step has the PARTITIONED signature
    `(trainable, opt_state, frozen, batch, key) -> (loss, trainable,
    opt_state)`: it differentiates ONLY the trainable subtree (frozen
    params are loss constants — no gradient or Adam buffers ever
    materialize for them) and never returns the frozen base, so the step's
    outputs are megabytes even when the base is the 13 GB fp8 19B. Split
    once with `partition_params(params, mask)` before the loop, init the
    optimizer on the trainable half, and `merge_params` once at save time.
    """
    if trainable_mask is None:
        def step(params, opt_state, batch: TrainBatch, key: jax.Array):
            loss, grads = jax.value_and_grad(rectified_flow_loss)(
                params, cfg, batch, key, tc
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return loss, params, opt_state

        return jax.jit(step, donate_argnums=(0, 1))

    def step(trainable, opt_state, frozen, batch: TrainBatch, key: jax.Array):
        def loss_fn(tr):
            return rectified_flow_loss(
                merge_params(tr, frozen), cfg, batch, key, tc
            )

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return loss, trainable, opt_state

    return jax.jit(step, donate_argnums=(0, 1))
