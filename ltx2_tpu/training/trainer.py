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
x_sigma = x0 + sigma * v). Loss is a uniform-weight fp32 MSE; the
mid-schedule emphasis comes from logit-normal SIGMA SAMPLING
(TrainConfig.logit_normal_loc/scale) rather than an explicit per-timestep
loss weight.
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
    # LR schedule: linear warmup over `warmup_steps`, then "constant",
    # "cosine" (decay to 0 over total_steps - warmup_steps) or "linear"
    # (same horizon). Decaying schedules require total_steps.
    warmup_steps: int = 0
    lr_schedule: str = "constant"
    total_steps: Optional[int] = None


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


# Every audio-branch param key in the DiT tree (top-level audio_* /
# av_ca_* leaves and the blocks' audio_attn*/audio_ff/audio_*_table/
# audio_to_video_attn/video_to_audio_attn sublayers, plus any LoRA
# adapters attached inside them).
AUDIO_BRANCH_PATTERN = r"(^|/)(audio_|av_ca_|video_to_audio_attn)"


def freeze_audio_branch_mask(params, mask=None):
    """Trainable mask with every audio-branch leaf frozen.

    For an AudioVideo model trained on video-only batches: the audio
    branch gets exactly-zero gradients (the loss never touches it), but
    AdamW weight decay would still shrink the untrained audio weights
    every step — silently destroying the checkpoint's audio capability at
    export. Intersects with an existing `mask` when given.
    """
    import re

    audio_re = re.compile(AUDIO_BRANCH_PATTERN)
    not_audio = trainable_mask(params, lambda p: not audio_re.search(p))
    if mask is None:
        return not_audio
    return jax.tree_util.tree_map(
        lambda a, b: bool(a and b), mask, not_audio
    )


def trainable_mask(params, predicate: Callable[[str], bool]):
    """Bool pytree for make_optimizer(mask=...): predicate over '/'-joined tree paths.
    e.g. `lambda p: "attn" in p` trains only the attention projections."""
    from ltx2_tpu.parallel.sharding import path_to_str

    return jax.tree_util.tree_map_with_path(
        lambda path, _: predicate(path_to_str(path)), params
    )


def learning_rate_schedule(tc: TrainConfig):
    """Scalar LR or an optax schedule per tc's warmup/decay settings.

    step -> lr: linear 0 -> lr over warmup_steps, then constant, or cosine/
    linear decay to 0 across the remaining total_steps - warmup_steps.
    """
    if tc.lr_schedule not in ("constant", "cosine", "linear"):
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")
    lr = tc.learning_rate
    if tc.lr_schedule == "constant" and not tc.warmup_steps:
        return lr
    if tc.lr_schedule == "constant":
        decay = optax.constant_schedule(lr)
    else:
        if not tc.total_steps:
            raise ValueError(
                f"lr_schedule={tc.lr_schedule!r} needs total_steps "
                "(the decay horizon)"
            )
        decay_steps = max(1, tc.total_steps - tc.warmup_steps)
        if tc.lr_schedule == "cosine":
            decay = optax.cosine_decay_schedule(lr, decay_steps)
        else:
            decay = optax.linear_schedule(lr, 0.0, decay_steps)
    if not tc.warmup_steps:
        return decay
    warmup = optax.linear_schedule(0.0, lr, tc.warmup_steps)
    return optax.join_schedules([warmup, decay], [tc.warmup_steps])


def make_optimizer(tc: TrainConfig, mask=None) -> optax.GradientTransformation:
    chain = []
    if tc.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(tc.grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate_schedule(tc),
            b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay,
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


def _data_extended_sharding(leaf, p_shard, mesh, data_axis: str,
                            start_dim: int = 0):
    """Param sharding + the `data` axis on the first still-free divisible
    dim (at or after `start_dim`) — the shared layout rule for ZeRO-1
    moments, ZeRO-2 grads, and ZeRO-3/FSDP params. A spec that already
    carries `data_axis` (FSDP params feeding the ZeRO helpers) passes
    through unchanged."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dsize = dict(mesh.shape).get(data_axis, 1)
    ndim = getattr(leaf, "ndim", 0)
    spec = list(p_shard.spec) + [None] * (ndim - len(p_shard.spec))
    if data_axis in spec:
        return NamedSharding(mesh, P(*spec))
    if dsize > 1:
        for i in range(start_dim, ndim):
            if spec[i] is None and leaf.shape[i] % dsize == 0 and leaf.shape[i] >= dsize:
                spec[i] = data_axis
                break
    return NamedSharding(mesh, P(*spec))


def fsdp_param_shardings(params, param_shardings, mesh, data_axis: str = "data"):
    """ZeRO-3 / FSDP: shard the PARAMETERS themselves over the `data` axis.

    ZeRO-1/2 leave one full copy of the weights on every data shard; for
    full fine-tuning of the 19B that copy is the remaining memory wall.
    This layout extends each param's TP spec with `data_axis` on a free
    divisible dim, so per-device parameter bytes drop to ~1/(D*TP); GSPMD
    then all-gathers each block's weights where the forward/backward needs
    them (one block at a time inside the scan — peak live weights stay one
    block's worth) and reduce-scatters the matching gradient, the
    classical FSDP exchange, expressed purely through shardings.

    Stacked transformer-block leaves (leading (L, ...) scan axis) shard a
    NON-scan dim: `lax.scan` slices layer l out of the leading axis every
    iteration, and a `data`-sharded scan axis would force a full-stack
    gather per step instead of per-layer gathers.

    Compose with the ZeRO helpers by passing the result as their
    `param_shardings`: leaves already carrying `data_axis` pass through,
    so moments/grads simply inherit the FSDP layout. Pass the same tree to
    `make_train_step(param_shardings=...)` so donation keeps the layout
    across steps.
    """
    from ltx2_tpu.parallel.sharding import path_to_str

    def ext(path, p_shard, leaf):
        # Stacked scan leaves live under transformer_blocks/ in every tree
        # this is used with (the DiT — see model.py:675). Trees with other
        # stacked layouts (e.g. Gemma's layers/) need their own rule,
        # added WITH a test when FSDP-training such a tree becomes real.
        stacked = "transformer_blocks/" in path
        return _data_extended_sharding(
            leaf, p_shard, mesh, data_axis, start_dim=1 if stacked else 0
        )

    return jax.tree_util.tree_map_with_path(
        lambda path, p_shard, leaf: ext(path_to_str(path), p_shard, leaf),
        param_shardings, params,
    )


def zero2_grad_shardings(params, param_shardings, mesh, data_axis: str = "data"):
    """ZeRO-2: NamedSharding tree pinning GRADIENTS data-sharded.

    ZeRO-1 shards the Adam moments; the gradient itself still materializes
    full-size (fp32) on every device between backprop and the optimizer
    update — on DP meshes that is the peak-memory term remat can't touch.
    Constraining grads to the same data-extended layout as the moments
    makes GSPMD REDUCE-SCATTER the microbatch gradients straight into
    1/D-per-device shards (instead of all-reduce to replicated), run the
    moment/update math shard-local, and all-gather only the parameter
    updates — the classical ZeRO-2 exchange, expressed purely through
    shardings. Pass to `make_train_step(grad_shardings=...)`; under
    `accum_steps > 1` the fp32 accumulator carries the same 1/D layout, so
    accumulation memory also drops D-fold.
    """
    return jax.tree_util.tree_map(
        lambda p_shard, leaf: _data_extended_sharding(leaf, p_shard, mesh, data_axis),
        param_shardings, params,
    )


def zero1_opt_state_shardings(
    opt_state, params, param_shardings, mesh, data_axis: str = "data"
):
    """ZeRO-1: NamedSharding tree for an optax state with Adam moments
    sharded over the `data` mesh axis.

    On DP-dominant meshes the Adam mu/nu otherwise replicate per data shard
    — 2x the trainable params' fp32 bytes on EVERY device. Sharding the
    moments over 'data' cuts optimizer memory to ~1/D per device; GSPMD
    then computes each moment shard from the (all-reduced) gradient slice
    and all-gathers only the parameter UPDATES once per step — the
    classical ZeRO-1 exchange, expressed purely through shardings.

    Moment leaves keep their param's TP spec and additionally shard the
    first still-free divisible axis over `data_axis`. Non-moment state
    (clip/count scalars) replicates. Pass the result to
    `make_train_step(opt_state_shardings=...)` AND `jax.device_put` the
    initial opt state with it.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    pdef = jax.tree_util.tree_structure(params)

    def is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:
            return False

    def moment_sharding(p_shard, leaf):
        return _data_extended_sharding(leaf, p_shard, mesh, data_axis)

    flat, treedef = jax.tree_util.tree_flatten(opt_state, is_leaf=is_param_tree)
    out = [
        jax.tree_util.tree_map(moment_sharding, param_shardings, node)
        if is_param_tree(node)
        else NamedSharding(mesh, P())
        for node in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _accumulated_value_and_grad(
    loss_fn, params, batch, key, accum_steps, grad_shardings=None
):
    """Microbatch gradient accumulation: scan `accum_steps` micro-grads in
    fp32 and average. Peak activation memory is one microbatch's backprop;
    the extra cost is one fp32 grad buffer for the differentiated tree
    (1/D per device when `grad_shardings` pins it, ZeRO-2 style)."""
    def split_micro(x):
        if x is None:
            return None
        b = x.shape[0]
        assert b % accum_steps == 0, (
            f"batch {b} must divide --accum-steps {accum_steps}"
        )
        return x.reshape(accum_steps, b // accum_steps, *x.shape[1:])

    micro = jax.tree_util.tree_map(split_micro, batch)
    keys = jax.random.split(key, accum_steps)

    def pin(grads):
        if grad_shardings is None:
            return grads
        return jax.lax.with_sharding_constraint(grads, grad_shardings)

    def body(carry, inp):
        acc_loss, acc_grads = carry
        mb, k = inp
        loss, grads = jax.value_and_grad(loss_fn)(params, mb, k)
        # Pinning the per-microbatch grads here turns backprop's cross-data
        # all-reduce into a reduce-scatter; the fp32 carry then stays 1/D.
        acc_grads = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(jnp.float32), acc_grads, pin(grads)
        )
        return (acc_loss + loss, pin(acc_grads)), None

    zeros = pin(jax.tree_util.tree_map(
        lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params
    ))
    (loss, grads), _ = jax.lax.scan(body, (jnp.float32(0.0), zeros), (micro, keys))
    inv = 1.0 / accum_steps
    grads = jax.tree_util.tree_map(
        lambda g, p: (g * inv).astype(jnp.asarray(p).dtype), grads, params
    )
    return loss * inv, grads


def make_train_step(
    cfg: LTXModelConfig,
    optimizer: optax.GradientTransformation,
    tc: TrainConfig = TrainConfig(),
    trainable_mask=None,
    accum_steps: int = 1,
    opt_state_shardings=None,
    grad_shardings=None,
    param_shardings=None,
):
    """One jitted (params, opt_state, batch, key) -> (loss, params, opt_state).

    Donates params/opt_state so the update is in-place in HBM (no 2x weight
    peak). Under a mesh, pass TP-sharded params and DP-sharded batches —
    GSPMD propagates shardings through grads and Adam moments.

    accum_steps > 1: the batch's leading dim splits into `accum_steps`
    microbatches whose fp32-accumulated mean gradient feeds ONE optimizer
    update — the effective batch no longer has to fit a backprop in HBM.

    opt_state_shardings (ZeRO-1, see zero1_opt_state_shardings): pins the
    updated optimizer state to data-sharded moments inside the step, so
    donation keeps the 1/D-per-device layout across steps.

    grad_shardings (ZeRO-2, see zero2_grad_shardings): pins the gradient
    tree data-sharded the moment backprop produces it, so GSPMD lowers the
    cross-'data' gradient sync to reduce-scatter (not all-reduce) and the
    grad + clip + Adam math runs on 1/D shards. With accum_steps > 1 the
    fp32 accumulator carries the same layout.

    param_shardings (ZeRO-3/FSDP, see fsdp_param_shardings): pins the
    UPDATED params to the same data-extended layout the params were
    PLACED with, so donation keeps the 1/(D*TP) layout across steps. Must
    be the identical tree used for placement — a mismatch silently
    reshards every parameter every step.

    With `trainable_mask`, the returned step has the PARTITIONED signature
    `(trainable, opt_state, frozen, batch, key) -> (loss, trainable,
    opt_state)`: it differentiates ONLY the trainable subtree (frozen
    params are loss constants — no gradient or Adam buffers ever
    materialize for them) and never returns the frozen base, so the step's
    outputs are megabytes even when the base is the 13 GB fp8 19B. Split
    once with `partition_params(params, mask)` before the loop, init the
    optimizer on the trainable half, and `merge_params` once at save time.
    """
    def constrain(opt_state):
        if opt_state_shardings is None:
            return opt_state
        return jax.lax.with_sharding_constraint(opt_state, opt_state_shardings)

    def constrain_params(params):
        # ZeRO-3/FSDP (fsdp_param_shardings): pin the UPDATED params so
        # donation keeps the 1/D layout across steps instead of drifting
        # to whatever GSPMD propagates out of apply_updates.
        if param_shardings is None:
            return params
        return jax.lax.with_sharding_constraint(params, param_shardings)

    def pin_grads(grads):
        if grad_shardings is None:
            return grads
        return jax.lax.with_sharding_constraint(grads, grad_shardings)

    def value_and_grad(loss_fn, params, batch, key):
        if accum_steps <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            return loss, pin_grads(grads)
        return _accumulated_value_and_grad(
            loss_fn, params, batch, key, accum_steps, grad_shardings
        )

    if trainable_mask is None:
        def loss_fn(p, b, k):
            return rectified_flow_loss(p, cfg, b, k, tc)

        def step(params, opt_state, batch: TrainBatch, key: jax.Array):
            loss, grads = value_and_grad(loss_fn, params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return loss, constrain_params(params), constrain(opt_state)

        return jax.jit(step, donate_argnums=(0, 1))

    def step(trainable, opt_state, frozen, batch: TrainBatch, key: jax.Array):
        def loss_fn(tr, b, k):
            return rectified_flow_loss(merge_params(tr, frozen), cfg, b, k, tc)

        loss, grads = value_and_grad(loss_fn, trainable, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return loss, constrain_params(trainable), constrain(opt_state)

    return jax.jit(step, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# EMA (exponential moving average of the trained weights)
# ---------------------------------------------------------------------------
# Standard practice for diffusion fine-tuning (the sampled-from weights are
# the EMA, not the last step's). The EMA tree shadows only the OPTIMIZER
# TARGET (full params, or the trainable half of a partition_params split),
# held in fp32 so small per-step updates don't vanish in bf16.


def init_ema(opt_target):
    """fp32 COPY of the optimizer target (None/frozen slots pass through).

    Must not alias the live buffers: the train step donates its target, so
    an aliased fp32 leaf would be deleted out from under the EMA."""
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, jnp.float32, copy=True), opt_target
    )


def make_ema_update(decay: float):
    """Jitted `(ema, new_target) -> ema` with `ema` donated in place:
    ema = decay * ema + (1 - decay) * target."""
    d = jnp.float32(decay)

    def update(ema, target):
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d), ema, target
        )

    return jax.jit(update, donate_argnums=(0,))


def ema_params(ema, like):
    """Cast the fp32 EMA tree back to the dtypes of `like` (the live
    target) for export / evaluation."""
    return jax.tree_util.tree_map(
        lambda e, p: e.astype(jnp.asarray(p).dtype), ema, like
    )


def make_eval_step(cfg: LTXModelConfig, tc: TrainConfig = TrainConfig(),
                   partitioned: bool = False):
    """Jitted validation loss (no grads, nothing donated).

    partitioned=False: (params, batch, key) -> loss
    partitioned=True:  (trainable, frozen, batch, key) -> loss
    Pass a FIXED key per validation batch index so successive evaluations
    draw identical sigmas/noise and the metric is comparable across steps.
    """
    if partitioned:
        def eval_step(trainable, frozen, batch: TrainBatch, key: jax.Array):
            return rectified_flow_loss(
                merge_params(trainable, frozen), cfg, batch, key, tc
            )
    else:
        def eval_step(params, batch: TrainBatch, key: jax.Array):
            return rectified_flow_loss(params, cfg, batch, key, tc)

    return jax.jit(eval_step)
