"""VAE conv3d lowering shootout at the decoder's real stage shapes (v5e).

The decoder is 41% of peak (BENCH_DETAIL r2) while the DiT runs at 75%;
the conv execution strategy is the suspect. Candidates, all numerically
identical modulo fp accumulation order:

- cur     : kT separate 2D convs over temporal taps (round-1 choice)
- c3d     : XLA's native 3D conv lowering (NDHWC)
- tap27   : 27 slice+matmul accumulations (pure MXU dot_general)
- mergedT : temporal taps concatenated into channels -> ONE 2D conv with
            kernel (kH, kW, kT*Cin, Cout) — deepens the contraction dim
            3x so the MXU tiles better at small channel counts
- im2col  : full 27-tap im2col -> one matmul (skipped where the
            materialized input exceeds a memory cap)

Methodology: lax.scan dependence chain under one jit (see
bench_block_parts.py — standalone timings are unreliable through the dev
tunnel). The chain carries the INPUT with a 1e-30-scaled scalar from the
output folded into one element, so iterations serialize without changing
the compute.

MEASURED CONCLUSION (v5e, 2026-08): `cur` (the production kT x 2D path)
wins at EVERY stage — S4_res 114, S3_res 143, S3_up 163, S2_res 149,
S2_up 146, S1_up 166, S1_res 160, S4_out 68 TF/s. CAVEAT on c3d: under
this eps-chain XLA manages to eliminate the NATIVE 3D conv entirely
(impossible 1000+ TF/s readings); re-measured with output-feeds-input
chains (bulletproof), c3d is SLOWER than cur (83 vs 104 TF/s at S4_res,
106 vs 132 at S3_res) while numerically equal. tap27/im2col/mergedT all
measured at-or-below cur. Keep the kT x 2D lowering.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STAGES = [
    # (name, Cin, Cout, T, H, W, chain_len)  — 768x512x121f decode plan,
    # LARGEST-FLOP stages first. chain_len sized so total chain compute >>
    # the ~35-70 ms dev-tunnel dispatch latency (short chains read as
    # impossible TF/s).
    ("S4_res_128", 128, 128, 121, 128, 192, 12),
    ("S3_res_256", 256, 256, 61, 64, 96, 32),
    ("S3_up_256_1024", 256, 1024, 61, 64, 96, 16),
    ("S2_res_512", 512, 512, 31, 32, 48, 64),
    ("S1_up_1024_4096", 1024, 4096, 16, 16, 24, 64),
    ("S1_res_1024", 1024, 1024, 16, 16, 24, 128),
    ("S2_up_512_2048", 512, 2048, 31, 32, 48, 32),
    ("S4_out_128_48", 128, 48, 121, 128, 192, 12),
]
N_CHAIN = 8  # overridden per stage


def bench_chain(fn, x, n_chain=None):
    N_CHAIN = n_chain or 8

    @jax.jit
    def loop(x):
        def body(c, _):
            out = fn(c)
            # 1e-30-scaled (NOT 0-scaled: XLA folds mul-by-0 and then
            # dead-code-eliminates the whole conv) output scalar folded into
            # one input element: serializes iterations, perturbs nothing.
            eps = (
                jnp.sum(out[0, 0, 0, 0, :8].astype(jnp.float32)) * 1e-30
            ).astype(c.dtype)
            return c.at[0, 0, 0, 0, 0].add(eps), None

        out, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(x))  # compile
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / N_CHAIN


def pad_x(x):
    x = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    return jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)], mode="edge")


def make_lowerings(w):
    cout, cin = w.shape[0], w.shape[1]
    rhs = w.transpose(2, 3, 4, 1, 0)  # (kT,kH,kW,I,O)

    def cur(x):
        xp = pad_x(x)
        b, tp, hp, wp, c = xp.shape
        t_out = tp - 2
        out = None
        for kt in range(3):
            xs = jax.lax.slice_in_dim(xp, kt, kt + t_out, axis=1)
            xs = xs.reshape(b * t_out, hp, wp, c)
            o = jax.lax.conv_general_dilated(
                xs, rhs[kt], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
        return out.reshape(b, t_out, out.shape[1], out.shape[2], cout)

    def c3d(x):
        xp = pad_x(x)
        return jax.lax.conv_general_dilated(
            xp, rhs, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def tap27(x):
        xp = pad_x(x)
        b, tp, hp, wp, c = xp.shape
        t, h, wd = tp - 2, hp - 2, wp - 2
        out = None
        for kt in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = xp[:, kt:kt + t, kh:kh + h, kw:kw + wd, :]
                    o = jnp.einsum(
                        "bthwi,io->bthwo", xs, rhs[kt, kh, kw],
                        preferred_element_type=jnp.float32,
                    )
                    out = o if out is None else out + o
        return out.astype(x.dtype)

    def mergedT(x):
        xp = pad_x(x)
        b, tp, hp, wp, c = xp.shape
        t = tp - 2
        xt = jnp.concatenate(
            [jax.lax.slice_in_dim(xp, kt, kt + t, axis=1) for kt in range(3)],
            axis=-1,
        )  # (b, t, hp, wp, 3*Cin) — dt-major channel packing
        k2d = w.transpose(3, 4, 2, 1, 0).reshape(3, 3, 3 * cin, cout)
        xt = xt.reshape(b * t, hp, wp, 3 * c)
        o = jax.lax.conv_general_dilated(
            xt, k2d, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return o.reshape(b, t, o.shape[1], o.shape[2], cout)

    def im2col(x):
        xp = pad_x(x)
        b, tp, hp, wp, c = xp.shape
        t, h, wd = tp - 2, hp - 2, wp - 2
        cols = jnp.concatenate(
            [
                xp[:, kt:kt + t, kh:kh + h, kw:kw + wd, :]
                for kt in range(3)
                for kh in range(3)
                for kw in range(3)
            ],
            axis=-1,
        )
        k = rhs.reshape(27 * cin, cout)
        o = jnp.einsum(
            "bthwi,io->bthwo", cols, k, preferred_element_type=jnp.float32
        )
        return o.astype(x.dtype)

    return {"cur": cur, "c3d": c3d, "tap27": tap27, "mergedT": mergedT,
            "im2col": im2col}


def main():
    key = jax.random.PRNGKey(0)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, cin, cout, t, h, wd, n_chain in STAGES:
        if only and only not in name:
            continue
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        x = jax.random.normal(kx, (1, t, h, wd, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.02
        tflop = 2 * t * h * wd * cin * cout * 27 / 1e12
        print(f"{name}: {tflop:.3f} TFLOP x {n_chain}")
        for lname, fn in make_lowerings(w).items():
            im2col_gb = 27 * cin * t * h * wd * 2 / 1e9
            if lname == "im2col" and im2col_gb > 4.0:
                print(f"  {lname:8s}  skipped ({im2col_gb:.1f} GB im2col)")
                continue
            try:
                s = bench_chain(fn, x, n_chain)
                print(f"  {lname:8s}  {s*1e3:8.2f} ms  {tflop/s:6.1f} TF/s")
            except Exception as e:  # OOM etc.
                print(f"  {lname:8s}  FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
