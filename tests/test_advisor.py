"""Parallelism advisor tests (VERDICT r4 #3).

The chooser must act on what SCALING.md already reports: TP8 is comm-bound
at the flagship shape (compute:comm = 0.8x, 25.4 GB wire/step/chip) while
SP8 / SP4xTP2 stay compute-bound — so `--auto-shard 8` must never pick
TP8 at 6144 tokens, and explicit layout flags must always win.
"""

import dataclasses

import pytest

from ltx2_tpu.parallel import advisor


@pytest.fixture(scope="module")
def cfg():
    return advisor.flagship_serving_config()


def test_tp8_never_chosen_at_flagship_shape(cfg):
    """SCALING.md:35: TP8's compute:comm is 0.8x — the chooser must pick
    an SP-bearing layout instead on 8 chips at 6144 tokens."""
    best, table = advisor.choose(cfg, 8, 6144, rows=2)
    assert not (best.tp == 8 and best.sp == 1 and best.pp == 1)
    assert best.sp > 1  # some sequence parallelism in the winning layout
    tp8 = next(e for e in table if (e.tp, e.sp, e.pp) == (8, 1, 1))
    assert tp8.step_s > best.step_s
    # and TP8 really is comm-bound in the model (pin against the report)
    assert tp8.comm_s > tp8.compute_s


def test_table_matches_scaling_report_wire_volumes(cfg):
    """The chooser and SCALING.md share one implementation; pin the two
    headline wire numbers the round-4 report published (25.4 GB TP8,
    compute:comm 0.8x; SP8 compute-bound)."""
    _, table = advisor.choose(cfg, 8, 6144, rows=2)
    tp8 = next(e for e in table if (e.tp, e.sp, e.pp) == (8, 1, 1))
    assert 24e9 < tp8.wire_bytes < 27e9  # 25.4 GB/step/chip
    assert 0.7 < tp8.compute_s / tp8.comm_s < 0.9  # 0.8x
    sp8 = next(e for e in table if (e.tp, e.sp, e.pp) == (1, 8, 1))
    assert sp8.compute_s / sp8.comm_s > 2.0  # compute-bound (report: 2.4x)


def test_divisibility_constraints_respected(cfg):
    for n in (2, 4, 8, 16):
        for tp, sp, pp in advisor.enumerate_layouts(cfg, n, 6144):
            assert tp * sp * pp == n
            assert cfg.num_attention_heads % tp == 0
            assert 6144 % sp == 0
            assert cfg.num_layers % pp == 0
    # odd token counts kill SP>1 candidates entirely
    layouts = advisor.enumerate_layouts(cfg, 8, 6145)
    assert all(sp == 1 for _, sp, _ in layouts)


def test_pp_bubble_penalizes_low_row_serving(cfg):
    """GPipe with rows=1 (distilled, no CFG) has a (1+P-1)/1 = P bubble —
    pure PP must never beat SP at equal device count."""
    best, table = advisor.choose(cfg, 8, 6144, rows=1)
    pp8 = next(e for e in table if (e.tp, e.sp, e.pp) == (1, 1, 8))
    assert pp8.step_s > 2 * best.step_s
    assert best.pp == 1


def test_overlap_table_is_conservative_until_measured():
    """The chooser's overlap assumptions must agree with SCALING.md's
    measured overlap evidence (scripts/scaling_report.py writes it; this
    pin forces the two to move together)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_OVERLAP.json",
    )
    if not os.path.exists(path):
        # no measured artifact -> every family must be assumed
        # non-overlapped (sum of compute+comm, the conservative model)
        assert not any(advisor.OVERLAPPABLE_COLLECTIVES.values())
        return
    with open(path) as fh:
        measured = json.load(fh)
    for family, claimed in advisor.OVERLAPPABLE_COLLECTIVES.items():
        assert measured[family]["overlapped"] == claimed, (
            f"advisor claims {family} overlapped={claimed} but "
            f"SCALING_OVERLAP.json measured {measured[family]}"
        )


def test_estimate_scales_with_devices(cfg):
    e4 = advisor.estimate_layout(cfg, 6144, 2, tp=1, sp=4, pp=1)
    e8 = advisor.estimate_layout(cfg, 6144, 2, tp=1, sp=8, pp=1)
    assert e8.compute_s < e4.compute_s
    assert e8.devices == 8 and e4.devices == 4


def test_apply_auto_shard_cli_semantics():
    """generate.py: --auto-shard fills the layout flags; explicit flags
    win; auto-shard 0/1 is a no-op."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    try:
        import generate
    finally:
        sys.path.pop(0)

    def make_args(**kw):
        defaults = dict(
            auto_shard=0, sp_devices=0, pp_stages=0, tp_devices=0,
            placeholder=False, checkpoint="x.safetensors",
            num_frames=121, height=512, width=768,
            cfg_scale=3.0, stg_scale=0.0,
        )
        defaults.update(kw)
        return type("Args", (), defaults)()

    # no-op without the flag
    args = make_args()
    assert generate.apply_auto_shard(args) is None
    assert (args.tp_devices, args.sp_devices, args.pp_stages) == (0, 0, 0)

    # fills the flags at N=8, never TP8 (6144 tokens)
    args = make_args(auto_shard=8)
    best = generate.apply_auto_shard(args)
    assert best is not None
    assert (args.tp_devices or 1) * (args.sp_devices or 1) * (
        args.pp_stages or 1
    ) == 8
    assert not (args.tp_devices == 8 and not args.sp_devices)

    # explicit flags win
    args = make_args(auto_shard=8, tp_devices=8)
    assert generate.apply_auto_shard(args) is None
    assert args.tp_devices == 8 and args.sp_devices == 0

    # placeholder models constrain to their 4-head/4-layer architecture
    args = make_args(auto_shard=8, placeholder=True)
    best = generate.apply_auto_shard(args)
    assert best is not None
    assert (args.tp_devices or 1) <= 4
    assert (args.pp_stages or 1) <= 4

    # review r5: sp must divide EVERY sequence that rides the mesh, not
    # just the final resolution. two-stage at 192x192x9f: full-res
    # tokens = 2*6*6 = 72 (sp=8 divides), but stage 1 runs 96x96 -> 18
    # tokens, so sp in {8, 4} must be rejected (18 % 4 != 0, 18 % 8 != 0).
    args = make_args(
        auto_shard=8, placeholder=True, pipeline="two-stage",
        num_frames=9, height=192, width=192,
    )
    generate.apply_auto_shard(args)
    sp = args.sp_devices or 1
    assert 18 % sp == 0 and 72 % sp == 0, sp

    # review r5: the audio stream's token count constrains sp too
    args = make_args(auto_shard=8, placeholder=True, audio=True)
    generate.apply_auto_shard(args)
    if args.sp_devices:
        from ltx2_tpu.types import AudioLatentShape, VideoPixelShape

        a_tokens = AudioLatentShape.from_video_pixel_shape(
            VideoPixelShape(batch=1, frames=121, height=512, width=768, fps=24.0)
        ).frames
        assert a_tokens % args.sp_devices == 0

    # review r5: the distilled pipeline is guidance-free regardless of
    # --cfg-scale (it hardcodes CFGGuider(1.0)), so the chooser must
    # model rows=1 — visible as a larger modeled PP bubble. Pin via the
    # returned estimate's rows-independent identity: chosen layouts for
    # distilled-vs-default may differ, but the distilled choice must be
    # valid at rows=1 (re-estimate equality).
    args = make_args(auto_shard=8, pipeline="distilled", cfg_scale=3.0)
    best = generate.apply_auto_shard(args)
    assert best is not None
    re_best, _ = advisor.choose(
        advisor.flagship_serving_config(), 8,
        advisor.video_token_count(121, 512, 768), rows=1,
    )
    assert (best.tp, best.sp, best.pp) == (re_best.tp, re_best.sp, re_best.pp)


def test_peek_checkpoint_arch(tmp_path):
    """Header-only architecture peek (review r5): a 6-block checkpoint
    must constrain the chooser's pp to divisors of 6, BEFORE placement."""
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import write_safetensors

    path = str(tmp_path / "ckpt.safetensors")
    tensors = {
        f"model.diffusion_model.transformer_blocks.{i}.attn1.to_q.weight":
            np.zeros((4, 4), np.float32)
        for i in range(6)
    }
    write_safetensors(
        path, tensors, metadata={"config": '{"num_attention_heads": 8}'}
    )
    layers, heads = advisor.peek_checkpoint_arch(path)
    assert layers == 6
    assert heads == 8
    # failure stays soft: caller keeps its default
    assert advisor.peek_checkpoint_arch(str(tmp_path / "nope.st")) == (None, None)


@pytest.mark.slow
def test_auto_shard_cli_smoke(tmp_path):
    """--auto-shard 8 drives a real placeholder generation on the virtual
    8-CPU mesh end-to-end (the chosen layout must actually execute)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "clip.avi"
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["LTX2_TESTS_NO_CACHE"] = "1"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "scripts", "generate.py"),
            "--placeholder", "--pipeline", "distilled",
            "--prompt", "a cat", "--auto-shard", "8",
            "--height", "128", "--width", "128", "--num-frames", "9",
            "--output", str(out),
        ],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert out.exists()
    assert "--auto-shard:" in proc.stderr + proc.stdout