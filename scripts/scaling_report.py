#!/usr/bin/env python
"""Generate SCALING.md: an auditable multi-chip comm/compute report.

VERDICT r3 #5: multi-chip correctness is equality-tested on the virtual
8-CPU mesh, but no artifact made the SCALING claims auditable. This script
derives, per parallel mode, the per-step communication volume and the
compute:comm ratio against v5e ICI bandwidth — NOT from hand math, but by:

1. walking the ACTUAL sharding rules (parallel/sharding.py
   DIT_SHARDING_RULES) over the ACTUAL flagship param tree
   (jax.eval_shape of init_ltx_model at the 48-block 19B config — real
   shapes, zero memory): every row-parallel weight contributes one
   all-reduce of its output activation; ring/pipeline traffic is computed
   from the same config numbers the kernels use;
2. compiling each mode's real program at tiny shapes on the virtual
   8-device CPU mesh and parsing the optimized HLO for collective
   instructions (op kind + payload shape) — ground truth that the
   analytic model is reconciled against;
3. timing one executed step per mode on the same mesh (functional
   evidence, not a perf claim — CPU timings say nothing about TPU).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_report.py [--output SCALING.md]
"""

import argparse
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_m = re.search(
    r"xla_force_host_platform_device_count=(\d+)", os.environ.get("XLA_FLAGS", "")
)
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(_m.group(1)) if _m else 8)
except Exception:
    pass

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Hardware model (documented assumptions, single place).
# ---------------------------------------------------------------------------
V5E_BF16_TFLOPS = 197.0  # public spec peak (utils/flops.py)
# v5e public spec: 1600 Gbps ICI per chip (4 links). A 1D ring collective
# drives 2 opposite links concurrently at ~45 GB/s one-way each (scaling-book
# numbers) => ~90 GB/s effective per-chip collective bandwidth. Conservative;
# 2D-torus-aware collectives can do better.
V5E_ICI_BYTES_PER_S = 90e9

# Flagship serving step (BENCH headline): 768x512x121f -> 6144 video tokens,
# 1024 text tokens, CFG pair = 2 rows, 48 blocks, inner 4096, bf16 acts.
FLAGSHIP = dict(rows=2, n_tokens=6144, text_tokens=1024, dtype_bytes=2)


def flagship_cfg():
    from ltx2_tpu.models.transformer.model import LTXModelConfig, LTXModelType

    return LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=32,
        attention_head_dim=128,
        in_channels=128,
        out_channels=128,
        num_layers=48,
        cross_attention_dim=4096,
        caption_channels=None,
        compute_dtype="bfloat16",
        remat=False,
    )


# ---------------------------------------------------------------------------
# 1) Analytic comm from the ACTUAL shardings over the ACTUAL param shapes.
# ---------------------------------------------------------------------------


def flagship_param_shapes():
    """Flagship param tree as ShapeDtypeStructs — real 19B shapes, no memory."""
    from ltx2_tpu.models.transformer.model import init_ltx_model

    cfg = flagship_cfg()
    return cfg, jax.eval_shape(
        lambda k: init_ltx_model(k, cfg), jax.random.PRNGKey(0)
    )


def tp_allreduce_bytes(params_shapes, rows, n_tokens, dtype_bytes):
    """Walk DIT_SHARDING_RULES over the param tree: every row-parallel
    weight (in-features sharded over 'model') forces one all-reduce of its
    OUTPUT activation (rows, n_tokens, out_features) per use. Returns
    (total payload bytes per step, [(path, L, out, bytes), ...])."""
    from ltx2_tpu.parallel.mesh import MODEL_AXIS
    from ltx2_tpu.parallel.sharding import path_to_str, spec_for_path

    total = 0
    entries = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params_shapes):
        ps = path_to_str(path)
        if not ps.endswith("/weight"):
            continue
        spec = spec_for_path(ps)
        # Row-parallel = a stacked (L, out, in) MATMUL weight with the
        # in-features (last) axis sharded. Norm weights (L, dim) also shard
        # their last axis but are elementwise — no all-reduce.
        if leaf.ndim != 3 or len(spec) != 3 or spec[-1] != MODEL_AXIS:
            continue
        layers = leaf.shape[0] if leaf.ndim == 3 else 1
        out_features = leaf.shape[-2]
        payload = rows * n_tokens * out_features * dtype_bytes * layers
        total += payload
        entries.append((ps, layers, out_features, payload))
    return total, entries


def sp_ring_bytes(cfg, rows, n_tokens, sp, dtype_bytes):
    """Ring self-attention (parallel/ring_attention.py): each device holds
    K,V for n_tokens/sp tokens and ppermutes them (sp-1) rounds per
    self-attention, per block. Text cross-attn replicates context: 0 comm."""
    inner = cfg.num_attention_heads * cfg.attention_head_dim
    kv_chunk = 2 * rows * inner * (n_tokens // sp) * dtype_bytes
    return cfg.num_layers * (sp - 1) * kv_chunk


def pp_permute_bytes(cfg, rows, n_tokens, stages, microbatches, dtype_bytes):
    """GPipe (parallel/pipeline_parallel.py): activation (rows/m, N, D)
    ppermutes one hop per tick EXCEPT the final tick (its rotation was
    computed-and-discarded; removed in review r4) -> m + P - 2 hops."""
    inner = cfg.num_attention_heads * cfg.attention_head_dim
    act = (rows // microbatches or 1) * n_tokens * inner * dtype_bytes
    return (microbatches + stages - 2) * act


def ring_allreduce_wire_bytes(payload, n):
    """Per-device wire traffic of a ring all-reduce: 2*X*(n-1)/n."""
    return 2 * payload * (n - 1) / n


def analytic_modes():
    """Per-mode analytic table at the flagship step."""
    from ltx2_tpu.utils.flops import dit_step_flops

    cfg, shapes = flagship_param_shapes()
    rows, n_tok, text, dtb = (
        FLAGSHIP["rows"], FLAGSHIP["n_tokens"],
        FLAGSHIP["text_tokens"], FLAGSHIP["dtype_bytes"],
    )
    step_flops = dit_step_flops(cfg, n_tok, text, rows=rows)
    ar_payload, ar_entries = tp_allreduce_bytes(shapes, rows, n_tok, dtb)

    modes = []
    for name, tp, sp, pp, mb in (
        ("TP4", 4, 1, 1, 1),
        ("TP8", 8, 1, 1, 1),
        ("SP4", 1, 4, 1, 1),
        ("SP8", 1, 8, 1, 1),
        ("SP4 x TP2", 2, 4, 1, 1),
        ("PP4 x TP2 (2 mb)", 2, 1, 4, 2),
        ("PP4 (2 mb)", 1, 1, 4, 2),
    ):
        devices = tp * sp * pp
        wire = 0.0
        detail = []
        if tp > 1:
            # SP shards the token axis, so each TP group's all-reduce
            # payload shrinks by the SP factor.
            payload = ar_payload / sp
            wire_tp = ring_allreduce_wire_bytes(payload, tp)
            wire += wire_tp
            detail.append(f"all-reduce {payload/1e6:.0f} MB payload -> "
                          f"{wire_tp/1e6:.0f} MB wire (ring, {tp} devices)")
        if sp > 1:
            wire_sp = sp_ring_bytes(cfg, rows, n_tok, sp, dtb)
            wire += wire_sp
            detail.append(f"ring-attention ppermute {wire_sp/1e6:.0f} MB wire")
        if pp > 1:
            wire_pp = pp_permute_bytes(cfg, rows, n_tok, pp, mb, dtb)
            wire += wire_pp
            detail.append(f"GPipe ppermute {wire_pp/1e6:.0f} MB wire")
        flops_per_chip = step_flops / devices
        compute_s = flops_per_chip / (V5E_BF16_TFLOPS * 1e12)
        comm_s = wire / V5E_ICI_BYTES_PER_S
        modes.append(dict(
            name=name, devices=devices, wire_bytes=wire,
            flops_per_chip=flops_per_chip, compute_s=compute_s, comm_s=comm_s,
            ratio=(compute_s / comm_s) if comm_s else float("inf"),
            detail="; ".join(detail) or "none",
        ))
    return cfg, step_flops, ar_entries, modes


# ---------------------------------------------------------------------------
# 2) HLO ground truth: compile tiny real programs, parse collectives.
# ---------------------------------------------------------------------------

_COLLECTIVE_RE = re.compile(
    r"=\s+(\w+)\[([\d,]*)\][^=]*?\b"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "f64": 8, "s64": 8, "u64": 8,
}


def parse_collectives(hlo_text):
    """-> {op_kind: (count, payload_bytes)} of STATIC instructions (ops in
    a scan body appear once; multiply by trip count when comparing)."""
    out = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        dtype, dims, kind = m.group(1), m.group(2), m.group(3)
        elems = 1
        for d in filter(None, dims.split(",")):
            elems *= int(d)
        nbytes = elems * _DTYPE_BYTES.get(dtype, 4)
        cnt, tot = out.get(kind, (0, 0))
        out[kind] = (cnt + 1, tot + nbytes)
    return out


def _tiny_cfg(heads, layers):
    from ltx2_tpu.models.transformer.model import LTXModelConfig

    return LTXModelConfig(
        num_attention_heads=heads,
        attention_head_dim=16,
        num_layers=layers,
        in_channels=8,
        out_channels=8,
        cross_attention_dim=heads * 16,
        caption_channels=24,
        compute_dtype="float32",
        remat=False,
    )


def _tiny_modality(cfg, width):
    from ltx2_tpu.models.transformer.model import Modality
    from ltx2_tpu.ops.rope import create_position_grid

    f, h = 2, 2
    n = f * h * width
    grid = create_position_grid(1, f, h, width).astype(jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return Modality(
        latent=jax.random.normal(k1, (1, n, cfg.in_channels), cfg.dtype),
        context=jax.random.normal(k2, (1, 5, cfg.caption_channels), cfg.dtype),
        context_mask=None,
        timesteps=jnp.full((1,), 0.7, jnp.float32),
        positions=jnp.stack([grid, grid + 1], axis=-1),
        sigma=jnp.full((1,), 0.7, jnp.float32),
    )


def compiled_modes(n_devices=8):
    """Compile + run one forward per mode on the virtual CPU mesh; return
    [(mode, parsed-collectives, measured step seconds)]."""
    from ltx2_tpu.models.transformer.model import init_ltx_model, x0_model_apply
    from ltx2_tpu.parallel.mesh import create_mesh
    from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward
    from ltx2_tpu.parallel.sharding import shard_dit_params

    results = []

    def timed(fn, *args):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # --- TP (GSPMD Megatron) over ('data','model') -------------------------
    tp = n_devices // 2
    mesh = create_mesh(data=2, model=tp)
    cfg = _tiny_cfg(heads=tp, layers=2)
    params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))
    sharded = shard_dit_params(mesh, params)
    modality = _tiny_modality(cfg, width=4)
    fn = jax.jit(lambda p, m: x0_model_apply(p, cfg, video=m))
    hlo = fn.lower(sharded, modality).compile().as_text()
    sec = timed(fn, sharded, modality)
    results.append((f"TP{tp} (DP2)", parse_collectives(hlo), sec))

    # --- SP ring attention over 'seq' --------------------------------------
    sp_mesh = create_mesh(data=1, model=1, seq=n_devices)
    sp_cfg = _tiny_cfg(heads=2, layers=2)
    sp_params = jax.jit(lambda k: init_ltx_model(k, sp_cfg))(jax.random.PRNGKey(0))
    sp_modality = _tiny_modality(sp_cfg, width=n_devices)
    sp_fn = make_sequence_parallel_forward(sp_mesh, sp_cfg)
    try:
        sp_hlo = sp_fn.lower(sp_params, sp_modality, None).compile().as_text()
    except (AttributeError, TypeError):
        sp_hlo = (
            jax.jit(lambda p, m: sp_fn(p, m))
            .lower(sp_params, sp_modality)
            .compile()
            .as_text()
        )
    sp_sec = timed(sp_fn, sp_params, sp_modality)
    results.append((f"SP{n_devices}", parse_collectives(sp_hlo), sp_sec))

    # --- SP x TP composed --------------------------------------------------
    sptp_mesh = create_mesh(data=1, model=2, seq=n_devices // 2)
    sptp_cfg = _tiny_cfg(heads=2, layers=2)
    sptp_params = shard_dit_params(
        sptp_mesh,
        jax.jit(lambda k: init_ltx_model(k, sptp_cfg))(jax.random.PRNGKey(0)),
    )
    sptp_modality = _tiny_modality(sptp_cfg, width=n_devices)
    sptp_fn = make_sequence_parallel_forward(sptp_mesh, sptp_cfg, model_axis="model")
    try:
        sptp_hlo = (
            sptp_fn.lower(sptp_params, sptp_modality, None).compile().as_text()
        )
    except (AttributeError, TypeError):
        sptp_hlo = (
            jax.jit(lambda p, m: sptp_fn(p, m))
            .lower(sptp_params, sptp_modality)
            .compile()
            .as_text()
        )
    sptp_sec = timed(sptp_fn, sptp_params, sptp_modality)
    results.append(
        (f"SP{n_devices // 2} x TP2", parse_collectives(sptp_hlo), sptp_sec)
    )

    return results


# ---------------------------------------------------------------------------
# 3) Report.
# ---------------------------------------------------------------------------


def fmt_bytes(b):
    if b >= 1e9:
        return f"{b / 1e9:.2f} GB"
    if b >= 1e6:
        return f"{b / 1e6:.0f} MB"
    return f"{b / 1e3:.1f} KB"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default=str(
        Path(__file__).resolve().parent.parent / "SCALING.md"
    ))
    ap.add_argument("--skip-compile", action="store_true",
                    help="analytic tables only (no tiny-program HLO pass)")
    args = ap.parse_args(argv)

    cfg, step_flops, ar_entries, modes = analytic_modes()

    lines = []
    w = lines.append
    w("# SCALING — multi-chip comm/compute report (generated)")
    w("")
    w(f"Generated by `python scripts/scaling_report.py` (do not hand-edit).")
    w("")
    w("Comm volumes are derived by walking the ACTUAL sharding rules")
    w("(`parallel/sharding.py DIT_SHARDING_RULES`) over the ACTUAL flagship")
    w("param tree (`jax.eval_shape(init_ltx_model)` at the 48-block config),")
    w("then reconciled against collectives parsed from the compiled HLO of")
    w("each mode's real program on the virtual 8-device CPU mesh.")
    w("")
    w("## Hardware model")
    w("")
    w(f"- v5e bf16 matmul peak: {V5E_BF16_TFLOPS} TFLOP/s (public spec)")
    w(f"- v5e effective per-chip collective bandwidth: "
      f"{V5E_ICI_BYTES_PER_S / 1e9:.0f} GB/s — assumption: 1600 Gbps ICI "
      f"per chip (public spec), 1D ring driving two opposite links at "
      f"~45 GB/s one-way each; 2D-torus-aware collectives can beat this.")
    w("- All-reduce wire cost: ring algorithm, `2 * payload * (n-1)/n` per"
      " device.")
    w("")
    w("## Flagship step (768x512x121f -> 6144 tokens, CFG pair, 48 blocks)")
    w("")
    w(f"- Per-step FLOPs (both CFG rows): {step_flops / 1e12:.1f} TFLOP")
    w(f"- Single-chip step time at {V5E_BF16_TFLOPS:.0f} TF/s peak: "
      f"{step_flops / (V5E_BF16_TFLOPS * 1e12):.2f} s (measured: ~1.24 s"
      f" fp8, BENCH_DETAIL.json)")
    w("")
    w("### Row-parallel all-reduce inventory (walked from the param tree)")
    w("")
    w("| weight (tree path) | layers | out-features | payload/step |")
    w("|---|---|---|---|")
    for ps, layers, out, payload in ar_entries:
        w(f"| `{ps}` | {layers} | {out} | {fmt_bytes(payload)} |")
    w("")
    w("### Per-mode budget")
    w("")
    w("| mode | devices | wire bytes/step/chip | compute s/chip | comm s | compute:comm | notes |")
    w("|---|---|---|---|---|---|---|")
    for m in modes:
        w(f"| {m['name']} | {m['devices']} | {fmt_bytes(m['wire_bytes'])} "
          f"| {m['compute_s']:.3f} | {m['comm_s']:.3f} | "
          f"{m['ratio']:.1f}x | {m['detail']} |")
    w("")
    w("compute:comm > 1 means the mode stays compute-bound even with ZERO")
    w("overlap; XLA overlaps ring ppermutes with the next block's matmuls")
    w("(latency-hiding), so effective comm cost is lower than the column.")
    w("")

    if not args.skip_compile:
        w("## HLO reconciliation (compiled tiny programs, 8-CPU mesh)")
        w("")
        w("Collective instructions parsed from each mode's OPTIMIZED HLO at")
        w("tiny shapes (2 blocks). Instructions inside the block scan appear")
        w("once (static count); runtime executes them `num_layers` times.")
        w("Step seconds are functional evidence on CPU, not a perf claim.")
        w("")
        w("| mode | collectives (static count, payload) | step s (CPU) |")
        w("|---|---|---|")
        for name, coll, sec in compiled_modes():
            desc = "; ".join(
                f"{kind}: {cnt}x {fmt_bytes(tot)}"
                for kind, (cnt, tot) in sorted(coll.items())
            ) or "none found"
            w(f"| {name} | {desc} | {sec:.3f} |")
        w("")
        w("Reconciliation: TP modes must show `all-reduce` (Megatron")
        w("row-parallel outputs), SP modes `collective-permute` (ring")
        w("attention K/V rotation), SP x TP both. The numeric equality of")
        w("every mode against the single-device forward is separately")
        w("asserted by tests/test_parallel.py on the same mesh.")
        w("")

    Path(args.output).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
