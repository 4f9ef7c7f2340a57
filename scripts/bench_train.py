"""Training-step throughput on the real TPU.

Fwd+bwd+update through full-width DiT blocks (heads 32 x 128, dim 4096)
at the flagship 6144-token shape, bf16 params with remat (block-wise
activation checkpointing — the memory policy a real fine-tune needs).
Layer count is capped by HBM: Adam moments are 2x fp32 per param, so
params(bf16) + moments ~ 10x param bytes; 2 full-width blocks + heads fit
a 16 GB v5e comfortably, and per-block throughput is layer-count
invariant (the scan body is the unit of work).

FLOPs: backward is ~2x forward for matmul-dominated transformers, and
remat recomputes the forward once more -> 4x forward FLOPs per step.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def zero1_report():
    """Per-device optimizer-state bytes for FULL 48-block (19B) fine-tuning,
    replicated vs ZeRO-1 (training.zero1_opt_state_shardings): Adam mu+nu
    are 2x fp32 per trainable param, so a DP-replicated optimizer costs
    8 bytes/param on EVERY chip — more than the bf16 weights themselves.
    Sharded over 'data', the per-device share divides by D; shapes are
    computed ABSTRACTLY (jax.eval_shape) so this reports the real tree, not
    a back-of-envelope, without allocating anything."""
    import jax.numpy as jnp

    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32, attention_head_dim=128,
        in_channels=128, out_channels=128, num_layers=48,
        cross_attention_dim=4096, caption_channels=None,
        compute_dtype="bfloat16",
    )
    shapes = jax.eval_shape(
        lambda k: init_ltx_model(k, cfg), jax.random.PRNGKey(0)
    )
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes)
    )
    weight_gb = n_params * 2 / 1e9  # bf16
    opt_gb = n_params * 8 / 1e9  # Adam mu + nu, fp32
    grad_gb = n_params * 2 / 1e9  # bf16 grads (transient)
    print(f"48-block DiT: {n_params/1e9:.2f} B params")
    print(f"  bf16 weights/chip        : {weight_gb:6.1f} GB")
    print(f"  Adam mu+nu fp32 replicated: {opt_gb:6.1f} GB/chip "
          f"(full FT impossible on 16 GB chips)")
    print(f"  {'D':>4} {'ZeRO-1 opt GB/chip':>20} {'weights+opt+grads GB':>22}")
    for d in (4, 8, 16, 32, 64):
        z = opt_gb / d
        print(f"  {d:>4} {z:>20.2f} {weight_gb + z + grad_gb:>22.1f}")
    print("(weights column assumes replicated weights — TP over the same "
          "chips divides them too, and zero1 composes on top of TP specs; "
          "activation memory extra, remat bounds it to ~one block. "
          "Shardings validated on the virtual mesh in tests/test_training.py"
          "::TestTrainStep::test_zero1_shards_moments_and_matches_replicated)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=16)
    ap.add_argument("--width", type=int, default=24)
    ap.add_argument("--lora-rank", type=int, default=0,
                    help="benchmark LoRA-adapter training instead of full FT")
    ap.add_argument("--lora-attn-only", action="store_true",
                    help="adapters on attention projections only")
    ap.add_argument("--fp8-base", action="store_true",
                    help="freeze the base in fp8 serving form (QLoRA-style: "
                    "with --layers 48 this is the full 19B fine-tuning on "
                    "one 16 GB chip — only adapters get grads/Adam state)")
    ap.add_argument("--zero1-report", action="store_true",
                    help="print the per-device optimizer-memory table for "
                    "FULL 48-block fine-tuning with and without ZeRO-1 "
                    "(abstract shapes only — runs anywhere, no HBM)")
    args = ap.parse_args(argv)

    if args.zero1_report:
        zero1_report()
        return
    if args.fp8_base and not args.lora_rank:
        # Mirror train.py's guard: AdamW on fp8-E4M3 storage is not a
        # training configuration that exists — benchmarking it would print
        # TF/s for a meaningless step.
        raise SystemExit("--fp8-base requires --lora-rank (fp8 weights are "
                         "a FROZEN base; only adapters take grads)")

    import jax.numpy as jnp

    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )
    from ltx2_tpu.ops.rope import create_position_grid
    from ltx2_tpu.training import (
        TrainBatch,
        TrainConfig,
        make_optimizer,
        make_train_step,
    )
    from ltx2_tpu.utils.flops import dit_step_flops, mfu_report

    cfg = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32, attention_head_dim=128,
        in_channels=128, out_channels=128, num_layers=args.layers,
        cross_attention_dim=4096, caption_channels=None,
        compute_dtype="bfloat16", remat=True,
    )
    if args.fp8_base:
        import dataclasses

        from ltx2_tpu.loader.fp8 import quantize_params_fp8

        one = jax.jit(
            lambda k: init_ltx_model(k, dataclasses.replace(cfg, num_layers=1))
        )(jax.random.PRNGKey(0))
        one_q = jax.jit(quantize_params_fp8)(one)
        jax.block_until_ready(one_q)
        stacked = jax.jit(
            lambda b: jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, args.layers, axis=0), b
            )
        )(one_q["transformer_blocks"])
        params = dict(one_q)
        params["transformer_blocks"] = stacked
        # Free the staging artifacts: the unquantized f32 single block is
        # ~1.6 GB and its fp8 copy ~0.4 GB — dead weight on a 16 GB chip.
        del one, one_q, stacked
    else:
        params = jax.jit(
            lambda k: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), init_ltx_model(k, cfg)
            )
        )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    tokens = args.frames * args.height * args.width
    grid = create_position_grid(1, args.frames, args.height, args.width).astype(
        jnp.float32
    )
    batch = TrainBatch(
        x0=jax.random.normal(jax.random.PRNGKey(1), (1, tokens, 128), jnp.float32),
        positions=jnp.stack([grid, grid + 1], axis=-1),
        context=jax.random.normal(jax.random.PRNGKey(2), (1, 1024, 4096), jnp.bfloat16),
    )

    tc = TrainConfig(logit_normal_loc=None)
    mask = None
    if args.lora_rank:
        from ltx2_tpu.training import partition_params
        from ltx2_tpu.training.lora import add_lora_params, lora_trainable_mask

        kw = {}
        if args.lora_attn_only:
            kw["targets"] = r"transformer_blocks/.*(to_q|to_k|to_v|to_out)$"
        params, n = add_lora_params(
            jax.random.PRNGKey(9), params, rank=args.lora_rank, **kw
        )
        mask = lora_trainable_mask(params)
        print(f"LoRA rank {args.lora_rank} on {n} linears", flush=True)
        opt = make_optimizer(tc)
        pstep = make_train_step(cfg, opt, tc, trainable_mask=mask)
        trainable, frozen = partition_params(params, mask)
        opt_state = opt.init(trainable)
        state = {"tr": trainable}

        def step(params, opt_state, batch, key):
            loss, state["tr"], opt_state = pstep(
                state["tr"], opt_state, frozen, batch, key
            )
            return loss, params, opt_state
    else:
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        opt_state = opt.init(params)

    loss, params, opt_state = step(params, opt_state, batch, jax.random.PRNGKey(3))
    print(f"compile done, loss {float(loss):.4f}", flush=True)
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        loss, params, opt_state = step(
            params, opt_state, batch, jax.random.PRNGKey(4 + i)
        )
    _ = float(np.asarray(loss))
    sec = (time.perf_counter() - t0) / n

    fwd = dit_step_flops(cfg, tokens, 1024, rows=1)
    # Full FT: fwd + ~2x bwd (dX + dW) + remat re-fwd = 4x. Frozen-base
    # LoRA: dW of frozen matmuls is skipped, bwd ~ 1x (dX only) -> 3x.
    train_flops = (3 if args.lora_rank else 4) * fwd
    rep = mfu_report(train_flops, sec)
    print(
        f"train step ({args.layers} full-width blocks, {tokens} tokens, "
        f"bf16+remat+adamw{', lora r' + str(args.lora_rank) if args.lora_rank else ''}): "
        f"{sec*1e3:.1f} ms/step, "
        f"{rep['achieved_tflops_per_s']:.1f} TF/s ({rep['pct_of_peak']:.1f}% peak)"
    )


if __name__ == "__main__":
    main()
