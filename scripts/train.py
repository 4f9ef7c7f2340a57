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
                   help=".npz with x0/positions/context arrays")
    p.add_argument("--synthetic", type=int, nargs=3, metavar=("F", "H", "W"),
                   default=None, help="random dataset at latent shape FxHxW")
    p.add_argument("--synthetic-samples", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=1.0)
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
    p.add_argument("--zero2", action="store_true",
                   help="additionally pin GRADIENTS data-sharded (ZeRO-2): "
                        "backprop's cross-data sync lowers to reduce-scatter "
                        "and grad/clip/Adam math runs on 1/dp shards "
                        "(implies --zero1)")
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


def main(argv=None):
    args = build_parser().parse_args(argv)

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
            init_ltx_model,
        )

        cfg = LTXModelConfig(
            num_attention_heads=4, attention_head_dim=32, num_layers=4,
            cross_attention_dim=128, caption_channels=None,
            compute_dtype="bfloat16", remat=True,
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(
            jax.random.PRNGKey(args.seed)
        )
        if args.fp8_serving:
            # Honor the flag under --placeholder too: quantize the random
            # base so the fp8 training semantics (frozen quantized base,
            # trainable-regex guard) are drivable without a checkpoint.
            if not (args.lora_rank or args.trainable):
                raise SystemExit(
                    "--fp8-serving requires --lora-rank or --trainable: fp8 "
                    "weights are a FROZEN base (adamw cannot update them)"
                )
            from ltx2_tpu.loader.fp8 import quantize_params_fp8

            params = jax.jit(quantize_params_fp8)(params)
        log.info("placeholder DiT (%d blocks)", cfg.num_layers)
    else:
        from ltx2_tpu.utils.model_ledger import ModelLedger

        if args.fp8_serving and not (args.lora_rank or args.trainable):
            raise SystemExit(
                "--fp8-serving requires --lora-rank or --trainable: fp8 "
                "weights are a FROZEN base (adamw cannot update them)"
            )
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
    if tp > 1 or dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import shard_dit_params

        mesh = create_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
        params = shard_dit_params(mesh, params)
        dp_put = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        log.info("training mesh: %s", mesh)
    else:
        dp_put = lambda a: a  # noqa: E731

    # ---- Data.
    if args.data:
        data = np.load(args.data)
        x0s, poss, ctxs = data["x0"], data["positions"], data["context"]
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
    else:
        raise SystemExit("pass --data latents.npz or --synthetic F H W")
    n_samples = x0s.shape[0]
    log.info("dataset: %d samples, %d tokens", n_samples, x0s.shape[1])

    # ---- Optimizer + step.
    tc = TrainConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay,
        grad_clip_norm=args.grad_clip,
    )
    mask = None
    if lora_mode:
        from ltx2_tpu.training.lora import lora_trainable_mask

        mask = lora_trainable_mask(params)
    if args.trainable:
        import re as re_mod

        pat = re_mod.compile(args.trainable)
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
    if args.zero1 or args.zero2:
        which = "--zero2" if args.zero2 else "--zero1"
        if mesh is None or max(args.dp_devices, 1) <= 1:
            raise SystemExit(f"{which} needs --dp-devices > 1 (a 'data' axis "
                             "to shard the Adam moments over)")
        from ltx2_tpu.parallel.sharding import dit_param_shardings
        from ltx2_tpu.training import (
            zero1_opt_state_shardings, zero2_grad_shardings,
        )

        param_shardings = dit_param_shardings(mesh, opt_target)
        opt_shardings = zero1_opt_state_shardings(
            opt_state, opt_target, param_shardings, mesh
        )
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, opt_shardings)
        if args.zero2:
            grad_shardings = zero2_grad_shardings(
                opt_target, param_shardings, mesh
            )
        log.info("ZeRO-%d: Adam moments%s sharded over 'data' (%d-way)",
                 2 if args.zero2 else 1,
                 " + gradients" if args.zero2 else "",
                 max(args.dp_devices, 1))
    step = make_train_step(
        cfg, opt, tc, trainable_mask=mask, accum_steps=args.accum_steps,
        opt_state_shardings=opt_shardings, grad_shardings=grad_shardings,
    )

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

        if mask is not None:
            start, trainable, opt_state = load_train_state(
                args.resume, trainable, opt_state
            )
        else:
            start, params, opt_state = load_train_state(
                args.resume, params, opt_state
            )
        log.info("resumed training state from %s at step %d", args.resume, start)

    state_meta = {
        "seed": str(args.seed), "batch_size": str(args.batch_size),
        "accum_steps": str(args.accum_steps),
        "trainable": str(args.trainable), "lora_rank": str(args.lora_rank),
    }

    def save_state(next_step):
        from ltx2_tpu.training.checkpoint import save_train_state

        save_train_state(
            args.save_state, next_step,
            trainable if mask is not None else params,
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
        if i % args.log_every == 0 or i == args.steps - 1:
            log.info(
                "step %d/%d  loss %.5f  (%.2f s)",
                i, args.steps, float(loss), time.perf_counter() - t0,
            )
        if args.save_state and (
            (i + 1) % args.save_every == 0 or i == args.steps - 1
        ):
            save_state(i + 1)

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
