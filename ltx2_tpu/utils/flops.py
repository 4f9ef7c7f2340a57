"""Analytic FLOP accounting for MFU reporting (bench.py).

Counts what the compiled programs actually EXECUTE (dense matmuls; masked
positions and causal halves are still multiplied on the MXU), so
achieved-TFLOP/s = flops / wall-clock is a true utilization number against
the chip peak. 1 MAC = 2 FLOPs throughout. Elementwise/norm work is omitted
(<1% of the matmul totals at these shapes; it shows up as the gap to peak,
which is the honest place for it).

Peaks: v5e bf16 matmul peak 197 TFLOP/s (public spec); the measured
achievable matmul roofline on this chip via big-GEMM probes is ~165 TFLOP/s
(padding + HBM effects), reported alongside.
"""

from __future__ import annotations

from typing import Optional

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_INT8_PEAK_TFLOPS = 394.0  # v5e int8 MXU path is 2x bf16 (public spec)
V5E_MEASURED_ROOFLINE_TFLOPS = 165.0


def _attn_flops(n_q: int, n_kv: int, inner_dim: int) -> int:
    """QK^T + PV for one attention call at full density."""
    return 2 * 2 * n_q * n_kv * inner_dim


def dit_step_flops(
    cfg,
    n_video_tokens: int,
    n_text_tokens: int,
    n_audio_tokens: int = 0,
    rows: int = 1,
    text_kv_cached: bool = False,
) -> int:
    """FLOPs of ONE x0/velocity forward of the LTX DiT.

    cfg: LTXModelConfig. rows multiplies everything (batched CFG/STG rows).
    Covers per-block self-attn, text cross-attn, A<->V cross-modal attn,
    FFNs, plus the in/out projections; AdaLN/norm elementwise omitted.
    """
    d_v = cfg.num_attention_heads * cfg.attention_head_dim  # video inner
    n = n_video_tokens
    s = n_text_tokens
    ctx = cfg.cross_attention_dim

    per_block = 0
    # video self-attn: q,k,v,out projections + attention
    per_block += 4 * 2 * n * d_v * d_v + _attn_flops(n, n, d_v)
    # video text cross-attn: q + out over d_v, k/v from context dim
    per_block += 2 * 2 * n * d_v * d_v + _attn_flops(n, s, d_v)
    if not text_kv_cached:
        per_block += 2 * 2 * s * ctx * d_v
    # video FFN: d -> 4d -> d
    per_block += 2 * 2 * n * d_v * (4 * d_v)

    if n_audio_tokens:
        d_a = cfg.audio_inner_dim  # audio_heads * audio_head_dim
        na = n_audio_tokens
        per_block += 4 * 2 * na * d_a * d_a + _attn_flops(na, na, d_a)
        per_block += 2 * 2 * na * d_a * d_a + _attn_flops(na, s, d_a)
        if not text_kv_cached:
            per_block += 2 * 2 * s * ctx * d_a
        per_block += 2 * 2 * na * d_a * (4 * d_a)
        # A2V + V2A cross-modal (q/out in own dim, k/v project the other)
        per_block += 2 * 2 * na * d_a * d_a + 2 * 2 * n * d_v * d_a + _attn_flops(na, n, d_a)
        per_block += 2 * 2 * n * d_v * d_v + 2 * 2 * na * d_a * d_v + _attn_flops(n, na, d_v)

    total = cfg.num_layers * per_block
    # patchify-in / proj-out + caption projection (once, not per block)
    total += 2 * 2 * n * cfg.in_channels * d_v
    if n_audio_tokens:
        total += 2 * 2 * n_audio_tokens * cfg.audio_in_channels * cfg.audio_inner_dim
    return total * rows


def gemma_encode_flops(cfg, seq_len: int) -> int:
    """FLOPs of one Gemma-3 forward (all 48 layers), full-density attention
    (the einsum computes every masked position)."""
    d = cfg.hidden_size
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    s = seq_len
    per_layer = (
        2 * s * d * (qd + 2 * kvd)  # qkv projections
        + _attn_flops(s, s, qd)  # scores + values (GQA repeats to qd)
        + 2 * s * qd * d  # o_proj
        + 3 * 2 * s * d * cfg.intermediate_size  # gate/up/down
    )
    return cfg.num_hidden_layers * per_layer


def video_decoder_flops(cfg, latent_f: int, latent_h: int, latent_w: int) -> int:
    """FLOPs of one SimpleVideoDecoder forward by walking cfg.plan().

    Each conv3d: 2 * out_voxels * Cin * Cout * k^3 (k=3). Res blocks have
    2 convs at constant channels; upsample blocks conv to
    Cin*prod(stride)/multiplier then depth-to-space.
    """
    f, h, w = latent_f, latent_h, latent_w
    k3 = 27
    total = 0
    c = cfg.base_channels * 8
    # conv_in: latent_channels -> c
    total += 2 * f * h * w * cfg.latent_channels * c * k3

    for kind, spec, in_ch in cfg.plan():
        if kind == "res":
            (num_layers,) = spec
            total += num_layers * 2 * (2 * f * h * w * in_ch * in_ch * k3)
        else:
            stride, multiplier, _residual = spec
            conv_out = in_ch * stride[0] * stride[1] * stride[2] // multiplier
            total += 2 * f * h * w * in_ch * conv_out * k3
            f *= stride[0]
            h *= stride[1]
            w *= stride[2]
            if stride[0] > 1:
                f -= 1  # causal first-frame trim

    # conv_out: final_channels -> 3 * patch^2
    total += 2 * f * h * w * cfg.final_channels * (3 * cfg.patch_size**2) * k3
    return total


# Measured per-stage conv throughput ceilings (TF/s, v5e) for the
# production kT x 2D lowering — the fastest KNOWN execution of each
# decoder stage shape. Established by three exhaustive sweeps:
#   scripts/bench_conv_lowering.py : 5 XLA lowerings x 8 real stage
#     shapes; kT x 2D wins every stage (values below).
#   scripts/bench_conv_pallas.py   : hand Pallas implicit-GEMM kernels
#     (3 formulations x block/tap-group sweep); best loses to kT x 2D
#     (94-96 vs 101-104 TF/s at C=128, 112-113 vs 130 at C=256).
#   scripts/bench_vae_stage4.py    : pure-GEMM probes — the per-tap
#     [M,128]@[128,128] GEMM and the 9-tap im2col GEMM of the SAME
#     shapes run at-or-below these numbers (im2col is HBM-bound at
#     ~94 TF/s by intensity).
# The limiter is the K=C contraction depth on the 128-lane MXU (the
# identical ~105 TF/s wall appears in flash attention's head_dim-128
# contractions), so these ceilings are properties of the SHAPES, not of
# the lowering. Keyed by conv in_channels; upsample/expansion convs
# (Cout > Cin) tile deeper and are keyed separately.
_VAE_CONV_CEILING_RES = {128: 114.0, 256: 143.0, 512: 149.0, 1024: 160.0}
_VAE_CONV_CEILING_UP = {128: 114.0, 256: 163.0, 512: 146.0, 1024: 166.0}
_VAE_CONV_CEILING_OUT = 68.0  # conv_out 128 -> 48 (narrow-Cout tail)


def _nearest(table: dict, c: int) -> float:
    return table[min(table, key=lambda k: abs(k - c))]


def video_decoder_ceiling_tflops(cfg, latent_f: int, latent_h: int, latent_w: int) -> float:
    """FLOP-weighted measured throughput ceiling (TF/s) of one decode.

    Walks the same plan as video_decoder_flops, pricing each conv at its
    measured per-shape ceiling: ceiling = sum(flops) / sum(flops/ceil_i).
    This is the honest denominator for decode MFU — a decode at 100% of
    this number cannot be made faster without changing the conv shapes
    themselves (see docs/PERF.md).
    """
    f, h, w = latent_f, latent_h, latent_w
    k3 = 27
    flops_total = 0.0
    time_total = 0.0

    def add(flops: float, ceil_tfs: float) -> None:
        nonlocal flops_total, time_total
        flops_total += flops
        time_total += flops / (ceil_tfs * 1e12)

    c = cfg.base_channels * 8
    add(2 * f * h * w * cfg.latent_channels * c * k3, _nearest(_VAE_CONV_CEILING_UP, cfg.latent_channels))
    for kind, spec, in_ch in cfg.plan():
        if kind == "res":
            (num_layers,) = spec
            add(num_layers * 2 * (2 * f * h * w * in_ch * in_ch * k3), _nearest(_VAE_CONV_CEILING_RES, in_ch))
        else:
            stride, multiplier, _residual = spec
            conv_out = in_ch * stride[0] * stride[1] * stride[2] // multiplier
            add(2 * f * h * w * in_ch * conv_out * k3, _nearest(_VAE_CONV_CEILING_UP, in_ch))
            f *= stride[0]
            h *= stride[1]
            w *= stride[2]
            if stride[0] > 1:
                f -= 1
    add(2 * f * h * w * cfg.final_channels * (3 * cfg.patch_size**2) * k3, _VAE_CONV_CEILING_OUT)
    return flops_total / time_total / 1e12


def mfu_report(
    flops: int,
    seconds: float,
    peak_tflops: float = V5E_BF16_PEAK_TFLOPS,
    roofline_tflops: Optional[float] = V5E_MEASURED_ROOFLINE_TFLOPS,
    shape_ceiling_tflops: Optional[float] = None,
    roofline_name: str = "pct_of_measured_matmul_roofline",
) -> dict:
    """roofline_name labels WHICH roofline the percentage is against —
    int8 phases must pass their own measured int8 matmul roofline (and a
    matching name) instead of the default bf16/fp8 number, otherwise the
    percentage reads >100% and misleads (advisor r4)."""
    achieved = flops / seconds / 1e12
    out = {
        "tflops": round(flops / 1e12, 2),
        "achieved_tflops_per_s": round(achieved, 2),
        "peak_tflops_denominator": peak_tflops,
        "pct_of_peak": round(100 * achieved / peak_tflops, 1),
    }
    if roofline_tflops:
        out[roofline_name] = round(100 * achieved / roofline_tflops, 1)
    if shape_ceiling_tflops:
        out["measured_shape_ceiling_tflops"] = round(shape_ceiling_tflops, 1)
        out["pct_of_measured_shape_ceiling"] = round(
            100 * achieved / shape_ceiling_tflops, 1
        )
    return out
