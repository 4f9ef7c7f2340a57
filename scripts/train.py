"""Fine-tune the LTX-2 DiT with rectified flow (ltx2_tpu.training).

The reference is inference-only; this entry point closes the loop:
load a checkpoint (or --placeholder random weights), train on a dataset
of pre-encoded latents, and save a checkpoint in the REFERENCE format —
the output loads back into scripts/generate.py (and into the reference
implementation: same model.diffusion_model.* key scheme).

Data: an .npz with arrays
    x0         (N, tokens, C)   clean patchified video latents
    positions  (N, 3, tokens, 2) fractional RoPE position bounds
    context    (N, S, D_ctx)    text embeddings
(produce with your VAE-encode + text-encode of choice; `--synthetic F H W`
generates a random dataset at that latent shape for smoke/profiling runs).

Multi-chip: --tp-devices shards the weights (Megatron rules) and
--dp-devices shards the batch; grads and Adam moments inherit the
shardings under GSPMD — no training-specific flags beyond the mesh.

Example:
    python scripts/train.py --checkpoint ckpt.safetensors \
        --data latents.npz --steps 1000 --lr 1e-5 \
        --trainable 'attn' --save tuned.safetensors
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ltx2_tpu.utils.platform import apply_env_platform_overrides

apply_env_platform_overrides()


def build_parser():
    p = argparse.ArgumentParser(description="LTX-2 TPU rectified-flow fine-tuning")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--placeholder", action="store_true",
                   help="small random-weight DiT (no checkpoint needed)")
    p.add_argument("--audio", action="store_true",
                   help="load (and fine-tune through) the audio/AV-cross "
                        "branch weights — REQUIRED for AV checkpoints, or "
                        "the saved checkpoint silently loses its audio "
                        "capability")
    p.add_argument("--data", type=str, default=None,
                   help=".npz with x0/positions/context arrays (plus "
                        "audio_x0/audio_positions[/audio_context[_mask]] "
                        "for joint AV fine-tuning of --audio checkpoints)")
    p.add_argument("--synthetic", type=int, nargs=3, metavar=("F", "H", "W"),
                   default=None, help="random dataset at latent shape FxHxW")
    p.add_argument("--synthetic-samples", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=1.0,
                   help="global-norm gradient clip; 0 disables clipping")
    p.add_argument("--fp8-serving", action="store_true",
                   help="keep the checkpoint's fp8 weights quantized as the "
                        "FROZEN base (QLoRA-style): with --lora-rank, the "
                        "full 48-block 19B fine-tunes on one 16 GB chip")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="train LoRA adapters of this rank instead of the "
                        "base weights; --save then writes a reference-format "
                        "LoRA file loadable via generate.py --lora")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="LoRA scale numerator (default: rank)")
    p.add_argument("--trainable", type=str, default=None,
                   help="regex over param tree paths; non-matching leaves "
                        "freeze (e.g. 'attn' trains attention only)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save", type=str, default=None,
                   help="write the fine-tuned checkpoint here "
                        "(reference-format safetensors)")
    p.add_argument("--tp-devices", type=int, default=0)
    p.add_argument("--dp-devices", type=int, default=0)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="split each batch into this many microbatches and "
                        "accumulate fp32 gradients before ONE optimizer "
                        "update (effective batch no longer bounded by HBM)")
    p.add_argument("--zero1", action="store_true",
                   help="shard Adam moments over the 'data' mesh axis "
                        "(ZeRO-1): per-device optimizer memory ~1/dp "
                        "instead of fully replicated")
    p.add_argument("--save-state", type=str, default=None,
                   help="periodically persist (step, trainable params, "
                        "optimizer state) to this path for exact mid-run "
                        "resume (atomic; overwrites)")
    p.add_argument("--save-every", type=int, default=100,
                   help="checkpoint the training state every N steps "
                        "(with --save-state)")
    p.add_argument("--resume", type=str, default=None,
                   help="resume from a --save-state file: continues at the "
                        "saved step with bit-identical losses/weights vs "
                        "the uninterrupted run (config must match)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup from 0 over this many steps")
    p.add_argument("--lr-schedule", choices=("constant", "cosine", "linear"),
                   default="constant",
                   help="post-warmup decay to 0 across the remaining "
                        "--steps (cosine/linear), or flat (constant)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="keep an fp32 exponential moving average of the "
                        "trained weights (e.g. 0.999) and EXPORT the EMA; "
                        "0 disables. Standard diffusion fine-tuning "
                        "practice: the sampled-from weights are the EMA")
    p.add_argument("--val-fraction", type=float, default=0.0,
                   help="hold out this fraction of the dataset (the tail) "
                        "for validation loss")
    p.add_argument("--val-data", type=str, default=None,
                   help="separate .npz (x0/positions/context) used only "
                        "for validation loss")
    p.add_argument("--eval-every", type=int, default=50,
                   help="compute validation loss every N steps (fixed "
                        "per-batch keys -> comparable across steps)")
    p.add_argument("--zero2", action="store_true",
                   help="additionally pin GRADIENTS data-sharded (ZeRO-2): "
                        "backprop's cross-data sync lowers to reduce-scatter "
                        "and grad/clip/Adam math runs on 1/dp shards "
                        "(implies --zero1)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard the PARAMETERS over 'data' too (ZeRO-3 / "
                        "FSDP): per-device weight bytes ~1/(dp*tp), GSPMD "
                        "all-gathers each block's weights per scan step and "
                        "reduce-scatters its gradient (implies --zero1/2)")
    return p


def _reject_fp8_trainable(params, mask):
    """--fp8-serving + --trainable: refuse regexes that mark quantized
    leaves trainable. A matmul `weight` stored as fp8-E4M3 (detectable by
    its sibling `weight_scale`) cannot take AdamW updates — grads in fp8
    storage precision are near-useless — so steer users to --lora-rank,
    which trains fp32 adapters around the frozen quantized base."""
    bad = []

    def visit(p_node, m_node, path):
        for k, v in p_node.items():
            sub = f"{path}.{k}" if path else k
            if isinstance(v, dict):
                if "weight_scale" in v and (
                    m_node[k].get("weight", False)
                    or m_node[k].get("weight_scale", False)
                ):
                    bad.append(sub)
                else:
                    visit(v, m_node[k], sub)

    visit(params, mask, "")
    if bad:
        raise SystemExit(
            "--trainable selects fp8-quantized leaves under --fp8-serving "
            f"(e.g. {bad[0]}.weight): quantized weights are a FROZEN base. "
            "Use --lora-rank to train adapters, or drop --fp8-serving to "
            "dequantize the base for full fine-tuning."
        )


def _fsdp_shardings(mesh, tree):
    """The ONE derivation rule for the ZeRO-3/FSDP layout — used for both
    the initial parameter placement and the train step's sharding
    constraints (via the ZeRO helpers), so the two cannot drift into a
    silent every-step reshard (review r4)."""
    from ltx2_tpu.parallel.sharding import dit_param_shardings
    from ltx2_tpu.training import fsdp_param_shardings

    return fsdp_param_shardings(tree, dit_param_shardings(mesh, tree), mesh)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.grad_clip < 0:
        raise SystemExit("--grad-clip must be >= 0 (0 disables clipping)")
    if args.fp8_serving and not (args.lora_rank or args.trainable):
        # One guard for both the placeholder and checkpoint branches.
        raise SystemExit(
            "--fp8-serving requires --lora-rank or --trainable: fp8 "
            "weights are a FROZEN base (adamw cannot update them)"
        )

    import jax
    import jax.numpy as jnp

    from ltx2_tpu.ops.rope import create_position_grid
    from ltx2_tpu.training import (
        TrainBatch,
        TrainConfig,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )
    from ltx2_tpu.utils.profiling import log

    # ---- Model.
    if args.placeholder or args.checkpoint is None:
        from ltx2_tpu.models.transformer.model import (
            LTXModelConfig,
            LTXModelType,
            init_ltx_model,
        )

        cfg = LTXModelConfig(
            num_attention_heads=4, attention_head_dim=32, num_layers=4,
            cross_attention_dim=128, caption_channels=None,
            compute_dtype="bfloat16", remat=True,
            # --audio: a tiny AudioVideo placeholder so the joint-AV
            # training paths (and the video-only-data freeze) are drivable
            # without a checkpoint.
            **({"model_type": LTXModelType.AudioVideo,
                "audio_heads": 4, "audio_head_dim": 16,
                "audio_in_channels": 32, "audio_out_channels": 32}
               if args.audio else {}),
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(
            jax.random.PRNGKey(args.seed)
        )
        if args.fp8_serving:
            # Honor the flag under --placeholder too: quantize the random
            # base so the fp8 training semantics (frozen quantized base,
            # trainable-regex guard) are drivable without a checkpoint.
            from ltx2_tpu.loader.fp8 import quantize_params_fp8

            params = jax.jit(quantize_params_fp8)(params)
        log.info("placeholder DiT (%d blocks)", cfg.num_layers)
    else:
        from ltx2_tpu.utils.model_ledger import ModelLedger

        ledger = ModelLedger(
            checkpoint_path=args.checkpoint, include_audio=args.audio,
            keep_fp8=args.fp8_serving,
        )
        params, cfg = ledger.transformer()
        import dataclasses

        cfg = dataclasses.replace(cfg, remat=True)

    # ---- LoRA adapters attach BEFORE sharding so the TP rules place
    # lora_A/B with their base weights (sharding.py LoRA entries).
    lora_mode = bool(args.lora_rank) and args.lora_rank > 0
    if args.trainable and lora_mode:
        raise SystemExit("--trainable and --lora-rank are mutually exclusive")
    if lora_mode:
        from ltx2_tpu.training.lora import add_lora_params

        params, n_adapters = add_lora_params(
            jax.random.PRNGKey(args.seed + 100), params,
            rank=args.lora_rank,
            alpha=args.lora_alpha if args.lora_alpha is not None else float(args.lora_rank),
        )
        log.info("LoRA: rank %d adapters on %d linears", args.lora_rank, n_adapters)

    # ---- Mesh (TP x DP).
    mesh = None
    tp = max(args.tp_devices, 1)
    dp = max(args.dp_devices, 1)
    if dp > 1 and args.batch_size % dp != 0:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by "
            f"--dp-devices {dp} (each data shard takes batch/dp samples)"
        )
    if tp > 1 or dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import shard_dit_params

        mesh = create_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
        if args.fsdp:
            params = jax.tree_util.tree_map(
                jax.device_put, params, _fsdp_shardings(mesh, params)
            )
        else:
            params = shard_dit_params(mesh, params)
        dp_put = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        log.info("training mesh: %s", mesh)
    else:
        dp_put = lambda a: a  # noqa: E731

    # ---- Data. Optional audio arrays turn each batch into a joint-AV
    # TrainBatch (shared per-sample sigma, summed flow-matching MSEs).
    _AUDIO_KEYS = ("audio_x0", "audio_positions", "audio_context",
                   "audio_context_mask")
    aud = {}
    if args.data:
        data = np.load(args.data)
        x0s, poss, ctxs = data["x0"], data["positions"], data["context"]
        aud = {k: data[k] for k in _AUDIO_KEYS if k in data.files}
        if aud and "audio_positions" not in aud:
            raise SystemExit("dataset has audio_x0 but no audio_positions")
    elif args.synthetic:
        f, h, w = args.synthetic
        n, tokens = args.synthetic_samples, f * h * w
        rng = np.random.RandomState(args.seed)
        grid = np.asarray(create_position_grid(1, f, h, w), np.float32)
        pos = np.stack([grid, grid + 1], axis=-1)
        x0s = rng.randn(n, tokens, cfg.in_channels).astype(np.float32)
        poss = np.repeat(pos, n, axis=0)
        ctx_dim = cfg.caption_channels or cfg.cross_attention_dim
        ctxs = rng.randn(n, 32, ctx_dim).astype(np.float32) * 0.1
        if args.audio:
            # Joint-AV synthetic batch: audio tokens at one-per-frame,
            # seconds positions, own small context in the audio stream dim.
            t = np.arange(f, dtype=np.float32)[None, None, :]
            apos = np.stack([t, t + 0.1], axis=-1)
            aud = {
                "audio_x0": rng.randn(n, f, cfg.audio_in_channels).astype(np.float32),
                "audio_positions": np.repeat(apos, n, axis=0),
                "audio_context": (
                    rng.randn(
                        n, 8, cfg.caption_channels or cfg.audio_inner_dim
                    ).astype(np.float32) * 0.1
                ),
            }
    else:
        raise SystemExit("pass --data latents.npz or --synthetic F H W")
    # ---- Validation split (held-out tail, or a separate file).
    val = None
    val_aud = {}
    if args.val_data:
        vdata = np.load(args.val_data)
        val = (vdata["x0"], vdata["positions"], vdata["context"])
        val_aud = {k: vdata[k] for k in aud if k in vdata.files}
        if set(val_aud) != set(aud):
            raise SystemExit(
                "--val-data must carry the same audio arrays as --data "
                f"(train has {sorted(aud)}, val has {sorted(val_aud)})"
            )
    elif args.val_fraction > 0:
        n_val = max(1, int(round(x0s.shape[0] * args.val_fraction)))
        if n_val >= x0s.shape[0]:
            raise SystemExit(
                f"--val-fraction {args.val_fraction} leaves no training data"
            )
        val = (x0s[-n_val:], poss[-n_val:], ctxs[-n_val:])
        x0s, poss, ctxs = x0s[:-n_val], poss[:-n_val], ctxs[:-n_val]
        val_aud = {k: a[-n_val:] for k, a in aud.items()}
        aud = {k: a[:-n_val] for k, a in aud.items()}
    n_samples = x0s.shape[0]
    log.info(
        "dataset: %d samples, %d tokens%s", n_samples, x0s.shape[1],
        f" (+{val[0].shape[0]} validation)" if val is not None else "",
    )

    # ---- Optimizer + step.
    tc = TrainConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay,
        grad_clip_norm=args.grad_clip if args.grad_clip > 0 else None,
        warmup_steps=args.warmup_steps, lr_schedule=args.lr_schedule,
        total_steps=args.steps,
    )
    mask = None
    if lora_mode:
        from ltx2_tpu.training.lora import lora_trainable_mask

        mask = lora_trainable_mask(params)
    if args.trainable:
        pat = re.compile(args.trainable)
        mask = trainable_mask(params, lambda p: bool(pat.search(p)))
        if args.fp8_serving:
            _reject_fp8_trainable(params, mask)
        n_train = sum(
            int(np.prod(np.shape(l)))
            for l, m in zip(
                jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask)
            )
            if m
        )
        log.info("trainable params: %.2f M (regex %r)", n_train / 1e6, args.trainable)
    # An AV model on a video-only dataset: the audio branch gets exactly-
    # zero grads (the loss never touches it), but AdamW weight decay would
    # still shrink the untrained audio weights every step — silently
    # destroying the checkpoint's audio capability at export. Freeze the
    # whole branch instead (also: no Adam moments materialize for it).
    from ltx2_tpu.models.transformer.model import LTXModelType

    if aud and cfg.model_type != LTXModelType.AudioVideo:
        raise SystemExit(
            "dataset carries audio arrays but the model is video-only — "
            "pass --audio with an AudioVideo checkpoint"
        )
    if cfg.model_type == LTXModelType.AudioVideo and not aud:
        from ltx2_tpu.training import freeze_audio_branch_mask

        mask = freeze_audio_branch_mask(params, mask)
        log.info(
            "video-only dataset on an AV model: audio-branch params frozen"
        )
    opt = make_optimizer(tc)
    if mask is not None:
        # Partitioned step: frozen params are loss CONSTANTS — no grad or
        # Adam buffers materialize for them, and the step never returns
        # the frozen base (what makes single-chip LoRA on the fp8 19B
        # feasible: 13 GB frozen base + MB of adapters in flight).
        from ltx2_tpu.training import merge_params, partition_params

        trainable, frozen = partition_params(params, mask)
        opt_state = opt.init(trainable)
        opt_target = trainable
    else:
        opt_state = opt.init(params)
        opt_target = params

    opt_shardings = None
    grad_shardings = None
    step_param_shardings = None
    if args.fsdp or args.zero1 or args.zero2:
        which = ("--fsdp" if args.fsdp
                 else "--zero2" if args.zero2 else "--zero1")
        if mesh is None or max(args.dp_devices, 1) <= 1:
            raise SystemExit(f"{which} needs --dp-devices > 1 (a 'data' axis "
                             "to shard over)")
        from ltx2_tpu.parallel.sharding import dit_param_shardings
        from ltx2_tpu.training import (
            zero1_opt_state_shardings,
            zero2_grad_shardings,
        )

        param_shardings = dit_param_shardings(mesh, opt_target)
        if args.fsdp:
            # ZeRO-3: moments/grads inherit the params' data-extended
            # layout (the zero helpers pass data-sharded specs through),
            # and the step pins its returned params to keep it. Same
            # derivation rule as the placement above (_fsdp_shardings).
            param_shardings = _fsdp_shardings(mesh, opt_target)
            step_param_shardings = param_shardings
        opt_shardings = zero1_opt_state_shardings(
            opt_state, opt_target, param_shardings, mesh
        )
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, opt_shardings)
        if args.zero2 or args.fsdp:
            grad_shardings = zero2_grad_shardings(
                opt_target, param_shardings, mesh
            )
        log.info("ZeRO-%d: %sAdam moments%s sharded over 'data' (%d-way)",
                 3 if args.fsdp else 2 if args.zero2 else 1,
                 "params + " if args.fsdp else "",
                 " + gradients" if (args.zero2 or args.fsdp) else "",
                 max(args.dp_devices, 1))
    step = make_train_step(
        cfg, opt, tc, trainable_mask=mask, accum_steps=args.accum_steps,
        opt_state_shardings=opt_shardings, grad_shardings=grad_shardings,
        param_shardings=step_param_shardings,
    )

    # ---- EMA of the optimizer target (fp32 shadow; exported at save).
    ema = None
    if args.ema_decay > 0:
        from ltx2_tpu.training import init_ema, make_ema_update

        if not (0.0 < args.ema_decay < 1.0):
            raise SystemExit("--ema-decay must be in (0, 1)")
        ema = init_ema(opt_target)
        ema_update = make_ema_update(args.ema_decay)
        log.info("EMA: decay %.5f (exported weights are the EMA)", args.ema_decay)

    # ---- Validation loss (fixed per-batch keys -> comparable).
    eval_loss = None
    if val is not None:
        from ltx2_tpu.training import make_eval_step

        eval_step = make_eval_step(cfg, tc, partitioned=mask is not None)
        vx, vp, vc = val
        vbs = args.batch_size
        if vx.shape[0] < vbs:  # repeat-pad a tiny val set to one batch
            reps = -(-vbs // vx.shape[0])
            tile = lambda a: np.tile(  # noqa: E731
                a, (reps,) + (1,) * (a.ndim - 1)
            )[:vbs]
            vx, vp, vc = (tile(a) for a in (vx, vp, vc))
            val_aud = {k: tile(a) for k, a in val_aud.items()}
        n_val_batches = vx.shape[0] // vbs

        def eval_loss(tr_or_params):
            total = 0.0
            for j in range(n_val_batches):
                sl = slice(j * vbs, (j + 1) * vbs)
                vbatch = TrainBatch(
                    x0=dp_put(jnp.asarray(vx[sl])),
                    positions=dp_put(jnp.asarray(vp[sl])),
                    context=dp_put(jnp.asarray(vc[sl])),
                    **{k: dp_put(jnp.asarray(a[sl]))
                       for k, a in val_aud.items()},
                )
                k = jax.random.PRNGKey(args.seed + 7000 + j)
                if mask is not None:
                    total += float(eval_step(tr_or_params, frozen, vbatch, k))
                else:
                    total += float(eval_step(tr_or_params, vbatch, k))
            return total / n_val_batches

    # ---- Loop. Runs under the ambient mesh (SCOPED, not process-global —
    # a leaked ambient mesh bleeds into unrelated later computations): lets
    # the differentiable Pallas flash kernel shard-map over 'model' so fwd
    # AND bwd run on local heads.
    import contextlib

    mesh_scope = (
        jax.sharding.set_mesh(mesh) if mesh is not None
        else contextlib.nullcontext()
    )
    start = 0
    if args.resume:
        from ltx2_tpu.training.checkpoint import load_train_state

        # With EMA the persisted target is the (target, ema) pair — the
        # treedef fingerprint then also catches an --ema-decay on/off
        # mismatch between the runs.
        tmpl = trainable if mask is not None else params
        tmpl = (tmpl, ema) if ema is not None else tmpl
        start, restored, opt_state = load_train_state(
            args.resume, tmpl, opt_state
        )
        if ema is not None:
            restored, ema = restored
        if mask is not None:
            trainable = restored
        else:
            params = restored
        log.info("resumed training state from %s at step %d", args.resume, start)

    state_meta = {
        "seed": str(args.seed), "batch_size": str(args.batch_size),
        "accum_steps": str(args.accum_steps),
        "trainable": str(args.trainable), "lora_rank": str(args.lora_rank),
        "ema_decay": str(args.ema_decay), "lr_schedule": args.lr_schedule,
        "warmup_steps": str(args.warmup_steps),
    }

    def save_state(next_step):
        from ltx2_tpu.training.checkpoint import save_train_state

        target = trainable if mask is not None else params
        save_train_state(
            args.save_state, next_step,
            (target, ema) if ema is not None else target,
            opt_state, metadata=state_meta,
        )
        log.info("saved training state -> %s (step %d)", args.save_state, next_step)

    rng = np.random.RandomState(args.seed + 1)
    # Fast-forward the batch-index stream so a resumed run sees the exact
    # batches the uninterrupted run would have at each step.
    for _ in range(start):
        rng.randint(0, n_samples, size=args.batch_size)
    t0 = time.perf_counter()
    with mesh_scope:
      for i in range(start, args.steps):
        idx = rng.randint(0, n_samples, size=args.batch_size)
        batch = TrainBatch(
            x0=dp_put(jnp.asarray(x0s[idx])),
            positions=dp_put(jnp.asarray(poss[idx])),
            context=dp_put(jnp.asarray(ctxs[idx])),
            **{k: dp_put(jnp.asarray(a[idx])) for k, a in aud.items()},
        )
        if mask is not None:
            loss, trainable, opt_state = step(
                trainable, opt_state, frozen, batch,
                jax.random.PRNGKey(args.seed + 2 + i),
            )
        else:
            loss, params, opt_state = step(
                params, opt_state, batch, jax.random.PRNGKey(args.seed + 2 + i)
            )
        if ema is not None:
            ema = ema_update(ema, trainable if mask is not None else params)
        if i % args.log_every == 0 or i == args.steps - 1:
            log.info(
                "step %d/%d  loss %.5f  (%.2f s)",
                i, args.steps, float(loss), time.perf_counter() - t0,
            )
        if eval_loss is not None and (
            (i + 1) % args.eval_every == 0 or i == args.steps - 1
        ):
            log.info(
                "step %d/%d  VAL loss %.5f", i, args.steps,
                eval_loss(trainable if mask is not None else params),
            )
        if args.save_state and (
            (i + 1) % args.save_every == 0 or i == args.steps - 1
        ):
            save_state(i + 1)

    if ema is not None:
        # Export the EMA weights (cast back to the live dtypes) — the
        # standard sampled-from weights for diffusion fine-tunes.
        from ltx2_tpu.training import ema_params

        if mask is not None:
            trainable = ema_params(ema, trainable)
        else:
            params = ema_params(ema, params)
    if mask is not None:
        params = merge_params(trainable, frozen)

    if args.save and lora_mode:
        from ltx2_tpu.training.lora import export_lora_checkpoint

        export_lora_checkpoint(args.save, params)
        log.info("saved LoRA adapter to %s (load via generate.py --lora)", args.save)
    elif args.save:
        from ltx2_tpu.loader.export import export_transformer_checkpoint

        # Carry the SOURCE checkpoint's metadata (model_version/config):
        # the ledger's V2 detection reads it — without it a fine-tuned
        # V2.3 checkpoint would reload as V1 with the wrong architecture.
        metadata = None
        if args.checkpoint:
            from ltx2_tpu.loader.safetensors_io import read_metadata

            metadata = read_metadata(args.checkpoint) or None
        # carry_from: copy the source checkpoint's non-DiT tensors (VAE,
        # text_embedding_projection, connectors, vocoder) so the export is
        # a COMPLETE single-file checkpoint usable as the sole
        # --checkpoint in generate.py (the ledger loads every component
        # from one path).
        export_transformer_checkpoint(
            args.save, params, metadata=metadata, carry_from=args.checkpoint,
        )
        log.info("saved fine-tuned checkpoint to %s", args.save)


if __name__ == "__main__":
    main()
