"""Parallelism advisor: pick the best (tp, sp, pp) layout for N chips.

VERDICT r4 #3: SCALING.md already knows TP8 is comm-bound at the flagship
shape (compute:comm = 0.8x) while SP8 / SP4xTP2 stay compute-bound — but
nothing acted on it: `--tp-devices 8` would happily configure the worst
8-chip layout. This module encodes the SAME analytic model the scaling
report prints (scripts/scaling_report.py imports these functions, so the
chooser and the report cannot drift) into `choose()`, wired to
`generate.py/serve.py --auto-shard N`. Explicit --tp-devices/--sp-devices/
--pp-stages always win; the advisor only fills a layout when none is given.

Model (per denoise step, documented in SCALING.md):
- compute_s  = step_flops / devices / peak, inflated by the GPipe bubble
  (m + P - 1)/m when PP stages the blocks (m = guidance rows used as
  microbatches);
- comm_s     = per-chip wire bytes / effective ICI bandwidth, where wire
  is the sum of (a) Megatron TP all-reduces of every row-parallel matmul
  output (walked from the REAL sharding rules over the REAL param tree),
  (b) ring-attention K/V ppermutes under SP, (c) GPipe activation hops;
- step_s     = compute_s + comm_s for modes whose collectives XLA does
  NOT overlap, and max(compute_s, comm_s) for modes where the compiled
  HLO schedule proves async start/done separation (see SCALING.md
  "overlap evidence"; conservative sum when unknown).

The constants and formulas here are the single source of truth — the
scaling report reconciles them against collectives parsed from compiled
HLO on the virtual 8-device mesh (tests/test_scaling_report.py), and
tests/test_advisor.py pins the chooser against the report's table.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Optional, Tuple

# ---------------------------------------------------------------------------
# Hardware model (documented assumptions, single place — SCALING.md prints
# these; scripts/scaling_report.py imports them).
# ---------------------------------------------------------------------------
V5E_BF16_TFLOPS = 197.0  # public spec peak (utils/flops.py)
# v5e public spec: 1600 Gbps ICI per chip (4 links). A 1D ring collective
# drives 2 opposite links concurrently at ~45 GB/s one-way each (scaling-book
# numbers) => ~90 GB/s effective per-chip collective bandwidth. Conservative;
# 2D-torus-aware collectives can do better.
V5E_ICI_BYTES_PER_S = 90e9


# ---------------------------------------------------------------------------
# Analytic comm volumes from the ACTUAL shardings / config numbers.
# ---------------------------------------------------------------------------


def tp_allreduce_bytes(params_shapes, rows, n_tokens, dtype_bytes):
    """Walk DIT_SHARDING_RULES over the param tree: every row-parallel
    weight (in-features sharded over 'model') forces one all-reduce of its
    OUTPUT activation (rows, n_tokens, out_features) per use. Returns
    (total payload bytes per step, [(path, L, out, bytes), ...])."""
    import jax

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


@lru_cache(maxsize=8)
def _allreduce_payload_units(cfg) -> int:
    """sum(layers * out_features) over the row-parallel matmul weights of
    `cfg`'s param tree — the request-independent factor of the TP
    all-reduce payload (full payload = units * rows * n_tokens *
    dtype_bytes). Walked from the REAL sharding rules over the REAL tree
    via eval_shape (zero memory)."""
    import jax

    from ltx2_tpu.models.transformer.model import init_ltx_model

    shapes = jax.eval_shape(lambda k: init_ltx_model(k, cfg), jax.random.PRNGKey(0))
    total, entries = tp_allreduce_bytes(shapes, rows=1, n_tokens=1, dtype_bytes=1)
    return total  # == sum(layers * out_features)


# ---------------------------------------------------------------------------
# Per-layout step-time estimate + chooser.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LayoutEstimate:
    tp: int
    sp: int
    pp: int
    devices: int
    compute_s: float
    comm_s: float
    step_s: float
    wire_bytes: float
    overlapped: bool
    detail: str

    @property
    def name(self) -> str:
        parts = []
        if self.sp > 1:
            parts.append(f"SP{self.sp}")
        if self.tp > 1:
            parts.append(f"TP{self.tp}")
        if self.pp > 1:
            parts.append(f"PP{self.pp}")
        return " x ".join(parts) or "single-chip"

    def justification(self, n_tokens: int) -> str:
        return (
            f"--auto-shard: {self.name} over {self.devices} chips at "
            f"{n_tokens} tokens — modeled step "
            f"{self.step_s * 1e3:.0f} ms (compute {self.compute_s * 1e3:.0f} ms, "
            f"comm {self.comm_s * 1e3:.0f} ms"
            f"{', overlapped' if self.overlapped else ''}; {self.detail})"
        )


# Which collective families XLA provably overlaps with block compute on
# this build, from parsing REAL v5e AOT-compiled schedules for async
# collective-start/done separation (scripts/scaling_report.py writes the
# measurement to SCALING_OVERLAP.json; tests/test_advisor.py pins this
# table against it). Measured on the v5e 2x4 topology: the TP program's
# collectives (the Megatron all-reduce, decomposed by the backend into a
# collective-permute ring) and the SP ring K/V permutes both schedule
# with ~21-95 instruction definitions between start and done — the
# latency-hiding scheduler puts real block compute in their flight time.
# GPipe's stage-boundary permute is a hard dependency (each microbatch's
# next stage NEEDS the permuted activation) — never overlapped.
# `overlapped` makes the chooser model step = max(compute, comm), an
# optimistic bound; non-overlapped modes pay compute + comm in sequence.
OVERLAPPABLE_COLLECTIVES = {
    "tp_allreduce": True,
    "sp_ppermute": True,
    "pp_ppermute": False,
}


def estimate_layout(
    cfg,
    n_tokens: int,
    rows: int,
    tp: int,
    sp: int,
    pp: int,
    dtype_bytes: int = 2,
    step_flops: Optional[float] = None,
    peak_tflops: float = V5E_BF16_TFLOPS,
    ici_bytes_per_s: float = V5E_ICI_BYTES_PER_S,
) -> LayoutEstimate:
    """Modeled per-step time of one (tp, sp, pp) layout at this request."""
    if step_flops is None:
        from ltx2_tpu.utils.flops import dit_step_flops

        step_flops = dit_step_flops(cfg, n_tokens, 1024, rows=rows)
    devices = tp * sp * pp

    wire = 0.0
    detail = []
    overlapped = devices > 1
    if tp > 1:
        # SP shards the token axis, so each TP group's all-reduce payload
        # shrinks by the SP factor.
        units = _allreduce_payload_units(cfg)
        payload = units * rows * n_tokens * dtype_bytes / sp
        wire_tp = ring_allreduce_wire_bytes(payload, tp)
        wire += wire_tp
        detail.append(f"TP all-reduce {wire_tp / 1e9:.1f} GB wire")
        overlapped &= OVERLAPPABLE_COLLECTIVES["tp_allreduce"]
    if sp > 1:
        wire_sp = sp_ring_bytes(cfg, rows, n_tokens, sp, dtype_bytes)
        wire += wire_sp
        detail.append(f"ring ppermute {wire_sp / 1e9:.1f} GB wire")
        overlapped &= OVERLAPPABLE_COLLECTIVES["sp_ppermute"]
    microbatches = max(rows, 1)
    bubble = 1.0
    if pp > 1:
        wire_pp = pp_permute_bytes(cfg, rows, n_tokens, pp, microbatches, dtype_bytes)
        wire += wire_pp
        # GPipe bubble: (m + P - 1)/m inflation of per-chip compute.
        bubble = (microbatches + pp - 1) / microbatches
        detail.append(
            f"GPipe {wire_pp / 1e9:.2f} GB wire, bubble {bubble:.2f}x"
        )
        overlapped &= OVERLAPPABLE_COLLECTIVES["pp_ppermute"]

    compute_s = step_flops / devices / (peak_tflops * 1e12) * bubble
    comm_s = wire / ici_bytes_per_s
    if devices == 1:
        overlapped = False
    step_s = max(compute_s, comm_s) if overlapped else compute_s + comm_s
    return LayoutEstimate(
        tp=tp, sp=sp, pp=pp, devices=devices,
        compute_s=compute_s, comm_s=comm_s, step_s=step_s,
        wire_bytes=wire, overlapped=overlapped,
        detail="; ".join(detail) or "no collectives",
    )


def _divisors(n: int) -> List[int]:
    return [d for d in range(1, n + 1) if n % d == 0]


def enumerate_layouts(
    cfg,
    n_devices: int,
    n_tokens: int,
    extra_sp_constraints: Tuple[int, ...] = (),
) -> List[Tuple[int, int, int]]:
    """All (tp, sp, pp) with tp*sp*pp == n_devices satisfying the REAL
    divisibility constraints the parallel layer enforces: TP shards heads
    (sharding.py), SP shards tokens (_check_seq_divisible), PP stages whole
    blocks (shard_pipeline_params). `extra_sp_constraints` lists ADDITIONAL
    token counts sp must divide — the two-stage recipe's half-resolution
    stage and the audio stream run through the same sequence axis
    (denoise.py:759-762, 1231-1232), so a layout valid only at the final
    video resolution would crash mid-pipeline."""
    out = []
    for tp in _divisors(n_devices):
        if cfg.num_attention_heads % tp:
            continue
        rest = n_devices // tp
        for sp in _divisors(rest):
            if n_tokens % sp:
                continue
            if any(c % sp for c in extra_sp_constraints):
                continue
            pp = rest // sp
            if cfg.num_layers % pp:
                continue
            out.append((tp, sp, pp))
    return out


def choose(
    cfg,
    n_devices: int,
    n_tokens: int,
    rows: int = 2,
    dtype_bytes: int = 2,
    extra_sp_constraints: Tuple[int, ...] = (),
) -> Tuple[LayoutEstimate, List[LayoutEstimate]]:
    """Best modeled layout for this request; also returns the full ranked
    table (printed by scaling_report / --auto-shard-verbose)."""
    candidates = enumerate_layouts(
        cfg, n_devices, n_tokens, extra_sp_constraints=extra_sp_constraints
    )
    if not candidates:
        raise ValueError(
            f"no (tp, sp, pp) layout of {n_devices} devices satisfies the "
            f"divisibility constraints at {n_tokens} tokens / "
            f"{cfg.num_attention_heads} heads / {cfg.num_layers} layers"
        )
    from ltx2_tpu.utils.flops import dit_step_flops

    step_flops = dit_step_flops(cfg, n_tokens, 1024, rows=rows)
    estimates = [
        estimate_layout(
            cfg, n_tokens, rows, tp, sp, pp,
            dtype_bytes=dtype_bytes, step_flops=step_flops,
        )
        for tp, sp, pp in candidates
    ]
    # Deterministic tie-break: prefer fewer mesh axes (simpler layout),
    # then more SP (cheapest collective family at these shapes).
    estimates.sort(
        key=lambda e: (
            e.step_s,
            (e.tp > 1) + (e.sp > 1) + (e.pp > 1),
            -e.sp,
        )
    )
    return estimates[0], estimates


def flagship_serving_config():
    """The 48-block production DiT the chooser models when the checkpoint
    architecture is unknown at mesh-build time (generate.py builds meshes
    BEFORE loading weights so leaves can stream onto their shards)."""
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


def video_token_count(frames: int, height: int, width: int) -> int:
    """Pixel shape -> DiT token count (VAE 8x temporal-causal / 32x spatial
    with the patch-1 patchifier — types.VideoLatentShape.from_pixel_shape)."""
    return ((frames - 1) // 8 + 1) * (height // 32) * (width // 32)


def peek_checkpoint_arch(path: str):
    """Header-only peek at a real checkpoint's DiT architecture so the
    chooser validates tp/pp against the ACTUAL head/layer counts rather
    than the flagship assumption (a 30-layer fine-tune given pp=4 would
    otherwise crash at placement, after the mesh is already built).
    num_layers comes from the max transformer_blocks index in the tensor
    names; heads from the metadata config blob when present. Returns
    (num_layers or None, num_heads or None); (None, None) on any failure
    — the caller keeps its default."""
    import re

    layers = heads = None
    try:
        from ltx2_tpu.loader.safetensors_io import SafetensorsFile
        from ltx2_tpu.loader.weight_loader import read_checkpoint_config

        f = SafetensorsFile(path)
        try:
            idx = [
                int(m.group(1))
                for k in f.keys()
                for m in (re.search(r"transformer_blocks\.(\d+)\.", k),)
                if m
            ]
        finally:
            f.close()
        if idx:
            layers = max(idx) + 1
        blob = read_checkpoint_config(path)
        h = blob.get("num_attention_heads")
        heads = int(h) if h else None
    except Exception:
        pass
    return layers, heads
