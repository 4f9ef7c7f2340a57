"""Deep-dive on the decode bottleneck: stage-4 (C=128 @ 121x128x192).

Round-3 left VAE decode at 56% of peak / 67% of the measured big-matmul
roofline (BENCH_DETAIL r3); the conv-lowering shootout proved the kT x 2D
path already beats every alternative lowering (bench_conv_lowering.py).
This script answers the NEXT question: is the residual gap (a) the
elementwise chain between convs (pixel_norm/silu/scale-shift, fp32), or
(b) an intrinsic MXU ceiling at C=128 conv shapes — i.e. would even a pure
matmul of the same effective shape run at ~115 TF/s?

Measurements (output-feeds-input chains under one jit, the bulletproof
methodology from bench_conv_lowering.py):
  conv_only   : bare 3x3x3 conv chain (reproduces the shootout's 114)
  resblock    : the production _res_block (2 convs + norm/scale/silu + add)
                -> compares FLOP rate against conv_only to price the
                elementwise chain
  mm_tap      : dot chain [M,128]@[128,128] at M = S4 pixel count / 8
                (per-tap GEMM shape; memory-bound by intensity math)
  mm_im2col   : dot chain [M,1152]@[1152,128] (the 9-tap 2D im2col GEMM)
  mm_big      : dot chain [4096,4096]@[4096,4096] (the big-matmul roofline
                reference, ~165 TF/s on v5e)
  conv_w_tiled: conv executed W-tile-by-W-tile inside one jit (locality probe)

FLOP intensity at S4 (bf16): conv reuses each input pixel across 27 taps ->
1728 FLOP/B (compute-bound in theory); the im2col GEMM without reuse is
115 FLOP/B (memory-bound below peak: 819 GB/s * 115 = 94 TF/s). The conv's
achievable rate therefore sits between those bounds depending on how much
tap-reuse the tiling actually captures.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

C = 128
T, H, W = 121, 128, 192


def chain(fn, x, n, tflop_per_iter):
    # Proven eps-carry from bench_conv_lowering.py: single multi-dim index
    # scatter (a flat reshape+scatter on the 729M-element carry compiles
    # pathologically slowly / may materialize copies).
    zero_in = (0,) * x.ndim

    @jax.jit
    def loop(x):
        def body(c, _):
            out = fn(c)
            head = out[tuple([0] * (out.ndim - 1))][:8]
            eps = (jnp.sum(head.astype(jnp.float32)) * 1e-30).astype(c.dtype)
            return c.at[zero_in].add(eps), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / n
    print(f"  {dt*1e3:8.2f} ms/iter  {tflop_per_iter/dt:6.1f} TF/s")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kx, kw1, kw2, kt = jax.random.split(key, 4)
    x = jax.random.normal(kx, (1, T, H, W, C), jnp.bfloat16)
    w1 = jax.random.normal(kw1, (C, C, 3, 3, 3), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(kw2, (C, C, 3, 3, 3), jnp.bfloat16) * 0.02
    conv_tflop = 2 * T * H * W * C * C * 27 / 1e12

    from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc
    from ltx2_tpu.models.video_vae.decoder import _res_block

    print(f"S4 shape ({T}x{H}x{W}x{C}), conv = {conv_tflop:.2f} TFLOP")

    print("conv_only (1 conv):")
    p1 = {"weight": w1, "bias": jnp.zeros((C,), jnp.bfloat16)}
    chain(lambda c: conv3d_ndhwc(p1, c, causal=False, spatial_mode="reflect"), x, 10, conv_tflop)

    print("resblock (2 convs + elementwise):")
    rb = {
        "conv1": {"weight": w1, "bias": jnp.zeros((C,), jnp.bfloat16)},
        "conv2": {"weight": w2, "bias": jnp.zeros((C,), jnp.bfloat16)},
        "scale_shift_table": jax.random.normal(kt, (4, C), jnp.float32) * 0.02,
    }
    temb = jax.random.normal(kt, (1, 4 * C), jnp.float32) * 0.02
    chain(lambda c: _res_block(rb, c, False, temb, C), x, 8, 2 * conv_tflop)

    M = T * H * W  # 2.97M pixels
    print(f"mm_tap [M={M},128]@[128,128] x 27 accumulation equivalent:")
    a = jax.random.normal(kx, (M, C), jnp.bfloat16)
    # 27 DISTINCT weights — identical ones get CSE'd to a single dot
    # (a first draft of this probe read an impossible 365 TF/s that way).
    b27 = jax.random.normal(kw1, (27, C, C), jnp.bfloat16) * 0.02
    mm_tflop = 2 * M * C * C / 1e12

    def mm27(c):
        out = None
        for j in range(27):
            o = jnp.dot(c, b27[j])
            out = o if out is None else out + o
        return out

    chain(mm27, a, 8, 27 * mm_tflop)

    print("mm_im2col [M,1152]@[1152,128]:")
    a9 = jax.random.normal(kx, (M, 9 * C), jnp.bfloat16)
    b9 = jax.random.normal(kw1, (9 * C, C), jnp.bfloat16) * 0.02

    # chain needs out shape == in shape; wrap: out (M,128) -> eps into carry
    @jax.jit
    def loop9(c):
        def body(carry, _):
            out = jnp.dot(carry, b9)
            eps = (jnp.sum(out[0, :8].astype(jnp.float32)) * 1e-30).astype(carry.dtype)
            return carry.at[0, 0].add(eps), None

        out, _ = jax.lax.scan(body, c, None, length=8)
        return jnp.sum(out.astype(jnp.float32))

    float(loop9(a9))
    t0 = time.perf_counter()
    float(loop9(a9))
    dt = (time.perf_counter() - t0) / 8
    i2c_tflop = 2 * M * 9 * C * C / 1e12
    print(f"  {dt*1e3:8.2f} ms/iter  {i2c_tflop/dt:6.1f} TF/s "
          f"(HBM bound at ~94 by intensity)")

    print("mm_big [4096,4096]@[4096,4096] (roofline ref):")
    abig = jax.random.normal(kx, (4096, 4096), jnp.bfloat16)
    bbig = jax.random.normal(kw1, (4096, 4096), jnp.bfloat16) * 0.02
    big_tflop = 2 * 4096**3 / 1e12

    # Constant rescale keeps magnitudes stable across the chain; a
    # max-renorm carry (first draft) is reduction-bound and read 51 TF/s.
    big_scale = jnp.bfloat16(1.0 / (0.02 * 4096**0.5))

    @jax.jit
    def loopbig(c):
        def body(carry, _):
            out = jnp.dot(carry, bbig)
            return out * big_scale, None

        out, _ = jax.lax.scan(body, c, None, length=16)
        return jnp.sum(out.astype(jnp.float32))

    float(loopbig(abig))
    t0 = time.perf_counter()
    float(loopbig(abig))
    dt = (time.perf_counter() - t0) / 16
    print(f"  {dt*1e3:8.2f} ms/iter  {big_tflop/dt:6.1f} TF/s")

    # Wider-channel probe: same total FLOPs, C=256 at quarter pixels —
    # measures how much of the gap is the C=128 tile shape itself.
    print("conv_only C=256 @ (61,64,96) [S3 shape]:")
    x3 = jax.random.normal(kx, (1, 61, 64, 96, 256), jnp.bfloat16)
    w3 = jax.random.normal(kw1, (256, 256, 3, 3, 3), jnp.bfloat16) * 0.02
    p3 = {"weight": w3, "bias": jnp.zeros((256,), jnp.bfloat16)}
    tf3 = 2 * 61 * 64 * 96 * 256 * 256 * 27 / 1e12
    chain(lambda c: conv3d_ndhwc(p3, c, causal=False, spatial_mode="reflect"), x3, 16, tf3)


if __name__ == "__main__":
    main()
