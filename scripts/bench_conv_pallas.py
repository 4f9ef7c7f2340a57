"""Pallas implicit-GEMM 3x3x3 conv for the VAE decoder's weak stages.

Round-3/4 measurements: the production kT x 2D XLA lowering runs the
C=128 stage at ~104 TF/s and C=256 at ~132 TF/s while big matmuls hit
~165 TF/s on the same chip — the MXU is starved by XLA's conv tiling at
these channel counts. This kernel restates the conv as tap-GEMMs over a
flattened VMEM slab:

  - pad W to P (multiple of 16, bf16 sublane tile) so every (kt, kh) tap
    offset kt*FP + kh*P + kw is a STATIC flat offset into the slab;
  - grid (H/bh, T): each step DMAs (3, bh+2, P, C) from HBM (double
    buffered, overlapped with compute);
  - taps grouped into chunks of `group` consecutive taps -> one
    [bh*P, group*C] @ [group*C, C] MXU dot per chunk, fp32 accumulation;
  - junk columns [W, P) compute garbage and are sliced off at the write.

Variants measured: group in {1 (direct tap dots), 3 (kw-merged), 9
(kt-chunked im2col), 27 (full im2col)} x bh in {4, 8, 16}.

MEASURED CONCLUSION (v5e, 2026-08): every Pallas variant LOSES to the
production XLA kT x 2D lowering. Best hand-kernel vs xla_cur under the
same serialized chains: S4 (C=128): v3 fuse/taps 94-96 TF/s vs XLA
101-104; S3 (C=256): v3 112-113 vs XLA 130. v1 (scratch-staged im2col)
compiles only at small shapes (Mosaic relayout blowup at S4/S3 sizes);
v2 is uncompilable (Mosaic requires 8-aligned DMA offsets, the kw-shift
DMA cannot exist); v3 (aligned slices + output pltpu.roll) is the best
formulation possible under Mosaic's alignment rules and still loses —
the limiter is the K=C contraction depth on the MXU, not data movement
(v3's DMAs fully overlap; the same ~105 TF/s wall shows up in flash
attention's head_dim-128 contractions, scripts/bench_block_parts.py).
Together with bench_conv_lowering.py (5 XLA lowerings) and
bench_vae_stage4.py (pure-GEMM probes of the same shapes), this closes
the search: the per-shape conv ceilings ARE the XLA kT x 2D numbers, and
the decoder runs at them (see docs/PERF.md).

Usage: python scripts/bench_conv_pallas.py [--check-only]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, x_buf, col, sem, *, bh, P, W, C, Cout, group):
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_i = pl.num_programs(0)
    step = i * n_t + t
    total = n_i * n_t

    def dma(slot, i_, t_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t_, 3), pl.ds(i_ * bh, bh + 2)],
            x_buf.at[slot, :, : bh + 2],
            sem.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(slot, i, t).start()

    @pl.when(step + 1 < total)
    def _():
        nxt_i = jax.lax.select(t + 1 < n_t, i, i + 1)
        nxt_t = jax.lax.select(t + 1 < n_t, t + 1, 0)
        dma(1 - slot, nxt_i, nxt_t).start()

    dma(slot, i, t).wait()

    FP = (bh + 3) * P  # flat rows per temporal frame (1 spare garbage row)
    Mv = bh * P
    xv = x_buf[slot]  # (3, bh+3, P, C)
    xf = xv.reshape(3 * (bh + 3) * P, C)

    taps = [(kt, kh, kw) for kt in range(3) for kh in range(3) for kw in range(3)]
    acc = jnp.zeros((Mv, Cout), jnp.float32)
    for g0 in range(0, 27, group):
        chunk = taps[g0 : g0 + group]
        if len(chunk) == 1:
            (kt, kh, kw) = chunk[0]
            off = kt * FP + kh * P + kw
            lhs = jax.lax.slice(xf, (off, 0), (off + Mv, C))
        else:
            # Mosaic cannot concat vectors with mismatched sublane offsets
            # (the kw=1,2 slices); staging each tap through the col scratch
            # normalizes the layout and materializes the im2col block once.
            for j, (kt, kh, kw) in enumerate(chunk):
                off = kt * FP + kh * P + kw
                col[:, j * C : (j + 1) * C] = jax.lax.slice(
                    xf, (off, 0), (off + Mv, C)
                )
            lhs = col[:, : len(chunk) * C]
        wseg = w_ref[g0 * C : (g0 + len(chunk)) * C, :]
        acc = acc + jnp.dot(lhs, wseg, preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(bh, P, Cout)[:, :W, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "group", "causal"))
def conv3d_pallas(w, b, x, bh=8, group=9, causal=False):
    """3x3x3 stride-1 conv, NDHWC, reflect-W/H + replicate-T padding.

    w: (Cout, Cin, 3, 3, 3); x: (B, T, H, W, C) bf16. Matches
    conv3d_ndhwc(p, x, causal=causal, spatial_mode="reflect").
    """
    B, T, H, W, C = x.shape
    Cout = w.shape[0]
    P = _round_up(W + 2, 16)
    # Spatial reflect pad + width pad to P with zeros (junk columns).
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (0, P - (W + 2)), (0, 0)])
    if causal:
        xp = jnp.pad(xp, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)], mode="edge")
    else:
        xp = jnp.pad(xp, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)], mode="edge")

    # (Cout, Cin, kT, kH, kW) -> (kT, kH, kW, Cin, Cout) -> (27*Cin, Cout)
    w_flat = w.transpose(2, 3, 4, 1, 0).reshape(27 * C, Cout).astype(x.dtype)
    b_row = b.reshape(1, Cout).astype(jnp.float32)

    kern = functools.partial(
        _conv_kernel, bh=bh, P=P, W=W, C=C, Cout=Cout, group=group
    )
    call = pl.pallas_call(
        kern,
        grid=(H // bh, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, W, Cout), lambda i, t: (t, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bh + 3, P, C), x.dtype),
            pltpu.VMEM((bh * P, max(group, 2) * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * W * C * Cout * 27,
            bytes_accessed=(T + 2) * (H + 2) * P * C * 2 * 3 + T * H * W * Cout * 2,
            transcendentals=0,
        ),
    )
    return jnp.stack([call(xp[bi], w_flat, b_row) for bi in range(B)])


def _conv_kernel_v2(x_hbm, w_ref, b_ref, o_ref, x_buf, sem, *, bh, P, PW, W, C, Cout):
    """Aligned-slab variant: three kw-shifted copies of the input slab are
    DMA'd from HBM (a DMA source offset is free), so every one of the 27 tap
    slices lands at a flat row offset kt*FP + kh*P — a multiple of P (itself
    a multiple of 16) — i.e. sublane-aligned. No staging copies, no Mosaic
    relayouts: 27 direct [bh*P, C] @ [C, Cout] MXU dots. v1's scratch-staged
    im2col stored ~11.5 MB per grid step just to normalize layouts, which
    roughly doubled the step time.
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_i = pl.num_programs(0)
    step = i * n_t + t
    total = n_i * n_t

    def dma(slot, kw, i_, t_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t_, 3), pl.ds(i_ * bh, bh + 2), pl.ds(kw, PW)],
            x_buf.at[slot, kw, :, : bh + 2, :PW],
            sem.at[slot, kw],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for kw in range(3):
            dma(slot, kw, i, t).start()

    @pl.when(step + 1 < total)
    def _():
        nxt_i = jax.lax.select(t + 1 < n_t, i, i + 1)
        nxt_t = jax.lax.select(t + 1 < n_t, t + 1, 0)
        for kw in range(3):
            dma(1 - slot, kw, nxt_i, nxt_t).start()

    for kw in range(3):
        dma(slot, kw, i, t).wait()

    FP = (bh + 3) * P
    Mv = bh * P
    acc = jnp.zeros((Mv, Cout), jnp.float32)
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                xf = x_buf[slot, kw].reshape(3 * (bh + 3) * P, C)
                off = kt * FP + kh * P
                lhs = jax.lax.slice(xf, (off, 0), (off + Mv, C))
                tap = (kt * 3 + kh) * 3 + kw
                wseg = w_ref[tap * C : (tap + 1) * C, :]
                acc = acc + jnp.dot(lhs, wseg, preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(bh, P, Cout)[:, :W, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "causal"))
def conv3d_pallas_v2(w, b, x, bh=8, causal=False):
    """Same contract as conv3d_pallas, aligned-slab kernel."""
    B, T, H, W, C = x.shape
    Cout = w.shape[0]
    P = _round_up(W + 2, 16)
    # DMA widths must be 8-aligned (sublane tile); each kw slab must still
    # cover xp columns kw .. kw+W-1.
    PW = P - 8
    if PW < W:
        P += 16
        PW = P - 8
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (0, P - (W + 2)), (0, 0)])
    if causal:
        xp = jnp.pad(xp, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)], mode="edge")
    else:
        xp = jnp.pad(xp, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)], mode="edge")

    w_flat = w.transpose(2, 3, 4, 1, 0).reshape(27 * C, Cout).astype(x.dtype)
    b_row = b.reshape(1, Cout).astype(jnp.float32)

    kern = functools.partial(
        _conv_kernel_v2, bh=bh, P=P, PW=PW, W=W, C=C, Cout=Cout
    )
    call = pl.pallas_call(
        kern,
        grid=(H // bh, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, W, Cout), lambda i, t: (t, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 3, bh + 3, P, C), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * W * C * Cout * 27,
            bytes_accessed=3 * (T + 2) * (H + 2) * P * C * 2 * 3 + T * H * W * Cout * 2,
            transcendentals=0,
        ),
    )
    return jnp.stack([call(xp[bi], w_flat, b_row) for bi in range(B)])


def _conv_kernel_v3(x_hbm, w_ref, b_ref, o_ref, x_buf, sem, *, bh, P, W, C, Cout, fuse):
    """Aligned-slice variant with OUTPUT rotation.

    Mosaic requires 8-aligned offsets on the second-to-minor dim for every
    ref slice and DMA, so the kw in {1,2} input shifts of v1/v2 always cost
    a relayout or are outright uncompilable. v3 removes them from the input
    side entirely: all 9 (kt, kh) slices sit at offsets kt*FP + kh*P
    (multiples of P, itself a multiple of 16), and the kw taps accumulate
    into three separate outputs Z_kw = sum_{kt,kh} x[kt,kh] @ W[kt,kh,kw].
    The conv identity out[m] = Z_0[m] + Z_1[m+1] + Z_2[m+2] then needs just
    TWO native sublane rotates (pltpu.roll) of the fp32 output per grid
    step (~0.85 MB each) instead of 27 staged input copies (~11.5 MB).

    fuse=True additionally concatenates the 9 aligned slices into one
    [Mv+8, 9C] im2col block per step (sublane phases all match, so the
    concat is layout-clean) -> 3 dots with K=9C; fuse=False runs 27 K=C
    dots into 3 accumulators.
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_i = pl.num_programs(0)
    step = i * n_t + t
    total = n_i * n_t

    def dma(slot, i_, t_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t_, 3), pl.ds(i_ * bh, bh + 2)],
            x_buf.at[slot, :, : bh + 2],
            sem.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(slot, i, t).start()

    @pl.when(step + 1 < total)
    def _():
        nxt_i = jax.lax.select(t + 1 < n_t, i, i + 1)
        nxt_t = jax.lax.select(t + 1 < n_t, t + 1, 0)
        dma(1 - slot, nxt_i, nxt_t).start()

    dma(slot, i, t).wait()

    FP = (bh + 3) * P
    Mv = bh * P
    Mz = Mv + 8  # two extra rows (8-aligned) feed the kw=1,2 rotations
    xf = x_buf[slot].reshape(3 * (bh + 3) * P, C)

    if fuse:
        cols = jnp.concatenate(
            [
                jax.lax.slice(xf, (kt * FP + kh * P, 0), (kt * FP + kh * P + Mz, C))
                for kt in range(3)
                for kh in range(3)
            ],
            axis=1,
        )
        z = [
            jnp.dot(cols, w_ref[kw], preferred_element_type=jnp.float32)
            for kw in range(3)
        ]
    else:
        z = [jnp.zeros((Mz, Cout), jnp.float32) for _ in range(3)]
        for kt in range(3):
            for kh in range(3):
                off = kt * FP + kh * P
                lhs = jax.lax.slice(xf, (off, 0), (off + Mz, C))
                blk = kt * 3 + kh
                for kw in range(3):
                    wseg = w_ref[kw, blk * C : (blk + 1) * C, :]
                    z[kw] = z[kw] + jnp.dot(
                        lhs, wseg, preferred_element_type=jnp.float32
                    )

    # pltpu.roll requires a non-negative shift; Mz - kw is the equivalent
    # positive cyclic shift for the logical shift by -kw.
    out = z[0] + pltpu.roll(z[1], Mz - 1, 0) + pltpu.roll(z[2], Mz - 2, 0)
    out = out[:Mv] + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(bh, P, Cout)[:, :W, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "causal", "fuse"))
def conv3d_pallas_v3(w, b, x, bh=8, causal=False, fuse=True):
    """Same contract as conv3d_pallas, aligned-slice + output-rotate kernel."""
    B, T, H, W, C = x.shape
    Cout = w.shape[0]
    P = _round_up(W + 2, 16)
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (0, P - (W + 2)), (0, 0)])
    if causal:
        xp = jnp.pad(xp, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)], mode="edge")
    else:
        xp = jnp.pad(xp, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)], mode="edge")

    # (Cout, Cin, kT, kH, kW) -> (kW, kT, kH, Cin, Cout) -> (3, 9C, Cout):
    # kw selects the output-rotation branch; within a branch the 9C rows
    # run (kt, kh, cin), matching the concat/tap order in the kernel.
    w_r = w.transpose(4, 2, 3, 1, 0).reshape(3, 9 * C, Cout).astype(x.dtype)
    b_row = b.reshape(1, Cout).astype(jnp.float32)

    kern = functools.partial(
        _conv_kernel_v3, bh=bh, P=P, W=W, C=C, Cout=Cout, fuse=fuse
    )
    call = pl.pallas_call(
        kern,
        grid=(H // bh, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, W, Cout), lambda i, t: (t, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bh + 3, P, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * W * C * Cout * 27,
            bytes_accessed=(T + 2) * (H + 2) * P * C * 2 * 3 + T * H * W * Cout * 2,
            transcendentals=0,
        ),
    )
    return jnp.stack([call(xp[bi], w_r, b_row) for bi in range(B)])


def check(T=5, H=32, W=44, C=128, Cout=128, causal=False, bh=8, group=9, seed=0):
    from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc

    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(kx, (1, T, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(kw, (Cout, C, 3, 3, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b = jax.random.normal(kb, (Cout,), jnp.float32).astype(jnp.bfloat16)
    ref = conv3d_ndhwc({"weight": w, "bias": b}, x, causal=causal, spatial_mode="reflect")
    ref32 = ref.astype(jnp.float32)
    variants = [("v1", lambda: conv3d_pallas(w, b, x, bh=bh, group=group, causal=causal))]
    for fuse in (True, False):
        variants.append(
            (f"v3f{int(fuse)}", lambda fuse=fuse: conv3d_pallas_v3(w, b, x, bh=bh, causal=causal, fuse=fuse))
        )
    for name, fn in variants:
        try:
            got = fn()
        except Exception as e:  # noqa: BLE001 — report per-variant compile failures
            print(f"  check[{name}] FAILED: {str(e).splitlines()[0][:110]}")
            continue
        got32 = got.astype(jnp.float32)
        err = jnp.max(jnp.abs(ref32 - got32)) / (jnp.max(jnp.abs(ref32)) + 1e-9)
        print(
            f"  check[{name}] T{T} H{H} W{W} C{C}->{Cout} causal={causal} bh={bh} "
            f"g={group}: rel-max-err {float(err):.2e}"
        )
        assert float(err) < 2e-2, f"{name} mismatch: {float(err)}"


def bench_chain(fn, x, n):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / n


def bench_stage(name, T, H, W, C, n_chain, variants):
    from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc

    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (1, T, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(kw, (C, C, 3, 3, 3), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b = jnp.zeros((C,), jnp.bfloat16)
    tflop = 2 * T * H * W * C * C * 27 / 1e12
    print(f"{name} ({T}x{H}x{W}x{C}, {tflop:.2f} TFLOP/conv):")

    dt = bench_chain(
        lambda c: conv3d_ndhwc({"weight": w, "bias": b}, c, causal=False, spatial_mode="reflect"),
        x,
        n_chain,
    )
    print(f"  xla_cur              {dt*1e3:8.2f} ms  {tflop/dt:6.1f} TF/s")

    for bh, mode in variants:
        if H % bh:
            continue
        if mode == "v1":
            fn = lambda c: conv3d_pallas(w, b, c, bh=bh, group=9, causal=False)[0:1]
            tag = f"pallas_v1 bh={bh:2d} g=9 "
        elif mode == "v3f":
            fn = lambda c: conv3d_pallas_v3(w, b, c, bh=bh, causal=False, fuse=True)[0:1]
            tag = f"pallas_v3 bh={bh:2d} fuse"
        else:
            fn = lambda c: conv3d_pallas_v3(w, b, c, bh=bh, causal=False, fuse=False)[0:1]
            tag = f"pallas_v3 bh={bh:2d} taps"
        try:
            dt = bench_chain(fn, x, n_chain)
            print(f"  {tag} {dt*1e3:8.2f} ms  {tflop/dt:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001 — report per-variant compile failures
            msg = str(e).split("\n")[0][:110]
            print(f"  {tag} FAILED: {msg}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    print("correctness:")
    check(causal=False)
    check(causal=True)
    check(W=48, C=128, Cout=256)  # exact P=W+2 multiple-of-16 path untested otherwise
    if args.check_only:
        return

    variants = [
        (8, "v1"),
        (4, "v3f"), (8, "v3f"), (16, "v3f"), (32, "v3f"),
        (8, "v3t"), (16, "v3t"),
    ]
    bench_stage("S4_res_128", 121, 128, 192, 128, 10, variants)
    bench_stage("S3_res_256", 61, 64, 96, 256, 24, variants)


if __name__ == "__main__":
    main()
