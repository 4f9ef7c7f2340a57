"""bench.py orchestration tests (VERDICT r3 #1, r4 #1/#2).

Round 3 lost its headline perf artifact to a transient `ABORTED: TPU
backend error`: the old bench.py swallowed each tier's exception with a
bare `except: pass`, never retried, and recorded nothing. These tests
drive the rebuilt subprocess-per-tier harness end-to-end in smoke mode
(LTX2_BENCH_SMOKE=1: CPU, tiny shapes) with injected ABORTED faults
(LTX2_BENCH_FAULT) and assert the failure-discipline guarantees:

1. a transient failure is retried and can succeed on a later attempt;
2. a tier that keeps failing is recorded (error tail + outcome) and the
   harness falls back to the next tier — the round still gets a number;
3. even total failure produces a parseable JSON line plus a
   BENCH_DETAIL.json explaining every attempt — never a bare stack trace;
4. (r4) the EXTRA measured tiers (int8_e2e / two_stage / av_e2e) always
   run, record p50/min/max phase stats, and their failures never change
   the exit code or the headline metric;
5. (r4) every tier subprocess enables the persistent compile cache with
   atomic entry writes, so consecutive runs skip recompilation.

Real-TPU timing behavior is unchanged: the driver still runs plain
`python bench.py` which executes the same tier functions at full shapes.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SMOKE_CACHE = "/tmp/jax_cache_bench_smoke"


def run_bench(tmp_path, fault: str, extras: bool = False, timeout: int = 900):
    detail_out = tmp_path / "detail.json"
    env = os.environ.copy()
    env.update(
        LTX2_BENCH_SMOKE="1",
        LTX2_BENCH_FAULT=fault,
        LTX2_BENCH_DETAIL_OUT=str(detail_out),
        # Children are fresh processes; the shared smoke compile cache
        # keeps repeated tiny-shape tiers from paying cold XLA compiles.
        LTX2_BENCH_CACHE_DIR=SMOKE_CACHE,
    )
    if not extras:
        env["LTX2_BENCH_SKIP_EXTRAS"] = "1"
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    detail = json.loads(detail_out.read_text())
    return proc.returncode, result, detail


def tier_record(detail, name, extra=False):
    return next(
        t for t in detail["extra_tiers" if extra else "tiers"] if t["tier"] == name
    )


def test_transient_fault_is_retried_then_succeeds(tmp_path):
    """Attempt 1 aborts (injected); attempt 2 must succeed — the exact
    scenario that cost round 3 its number."""
    rc, result, detail = run_bench(tmp_path, fault="e2e:1")
    assert rc == 0
    assert result["metric"].startswith("e2e_sec_prompt_to_pixels")
    assert result["value"] > 0
    e2e = tier_record(detail, "e2e")
    assert e2e["status"] == "ok"
    assert [a["outcome"] for a in e2e["attempts"]] == ["transient", "ok"]
    assert "injected fault" in e2e["attempts"][0]["error_tail"]
    # p50 discipline (r4): every timed phase carries >=3 samples + min/max
    for phase in ("text_encode", "denoise_loop_8step", "vae_decode"):
        rec = detail["phases"][phase]
        assert rec["n_samples"] >= 3
        assert rec["seconds_min"] <= rec["seconds"] <= rec["seconds_max"]
    # the child enabled the persistent compile cache with atomic writes
    assert detail["compile_cache"]["atomic_writes"] == "ok"
    assert detail["compile_cache"]["dir"] == SMOKE_CACHE
    assert os.listdir(SMOKE_CACHE), "cache must be populated after a run"


def test_persistent_fault_falls_back_to_next_tier(tmp_path):
    rc, result, detail = run_bench(tmp_path, fault="e2e")
    assert rc == 0
    assert result["metric"].startswith("dit_sec_per_step")
    e2e = tier_record(detail, "e2e")
    assert e2e["status"] == "failed"
    assert len(e2e["attempts"]) == 3  # bounded retry, all recorded
    assert all("injected fault" in a["error_tail"] for a in e2e["attempts"])
    assert tier_record(detail, "dit_fp8")["status"] == "ok"
    assert tier_record(detail, "dit_bf16_extrap")["status"] == "skipped"


def test_total_failure_still_emits_artifact(tmp_path):
    rc, result, detail = run_bench(tmp_path, fault="e2e,dit_fp8,dit_bf16_extrap")
    assert rc == 1
    assert result["metric"] == "bench_all_tiers_failed"
    for name in ("e2e", "dit_fp8", "dit_bf16_extrap"):
        rec = tier_record(detail, name)
        assert rec["status"] == "failed"
        assert all(a["error_tail"] for a in rec["attempts"])


@pytest.mark.slow
def test_extra_tiers_run_and_failures_stay_isolated(tmp_path):
    """VERDICT r4 #1: the int8/two-stage/AV configs are measured tiers.
    Inject a persistent fault into int8_e2e only: the headline stays ok
    (rc=0, fp8 metric), the failed extra is recorded with attempts, and
    the OTHER extras still produce results + phase stats."""
    rc, result, detail = run_bench(
        tmp_path, fault="int8_e2e", extras=True, timeout=1800
    )
    assert rc == 0
    assert result["metric"].startswith("e2e_sec_prompt_to_pixels")

    int8 = tier_record(detail, "int8_e2e", extra=True)
    assert int8["status"] == "failed"
    assert all("injected fault" in a["error_tail"] for a in int8["attempts"])
    assert "result" not in int8

    two_stage = tier_record(detail, "two_stage", extra=True)
    assert two_stage["status"] == "ok"
    assert two_stage["result"]["metric"].startswith("two_stage_e2e_sec")
    assert two_stage["result"]["value"] > 0
    for phase in (
        "text_encode",
        "two_stage_latents",
        "two_stage_latents_cfg_interval2",
        "vae_decode_97f",
    ):
        rec = two_stage["phases"][phase]
        assert rec["n_samples"] >= 3
        assert rec["seconds_min"] <= rec["seconds"] <= rec["seconds_max"]
    assert "two_stage_e2e_sec_cfg_interval2" in two_stage

    av = tier_record(detail, "av_e2e", extra=True)
    assert av["status"] == "ok"
    assert av["result"]["metric"].startswith("av_e2e_sec")
    # the AV loop phase is measured at AV_BLOCKS (the 48-block AV tree is
    # ~18.4 GiB even at int8 — over one v5e's HBM) and extrapolated x2;
    # SMOKE runs AV_BLOCKS == FULL_BLOCKS == 2 so the factor is 1.
    loop_name = next(
        k for k in av["phases"] if k.startswith("av_denoise_loop_8step_int8")
    )
    for phase in (loop_name, "vae_decode", "audio_decode_vocode"):
        assert av["phases"][phase]["n_samples"] >= 3
    # the int8 roofline is measured, and the int8 MFU percentage is named
    # against it — not the fp8/bf16 roofline (advisor r4)
    assert av["int8_matmul_roofline_tflops"] > 0
    loop_phase = av["phases"][loop_name]
    assert "pct_of_measured_int8_matmul_roofline" in loop_phase
    assert "pct_of_measured_matmul_roofline" not in loop_phase
    assert loop_phase["seconds_extrapolated_full"] >= loop_phase["seconds"]
    assert loop_phase["extrapolated_to_blocks"] >= loop_phase["measured_blocks"]
    assert av["result"]["metric"].endswith("_dit_extrapolated_48blk")

    # BASELINE.json configs 2 and 4 are measured tiers too (r5)
    t2v = tier_record(detail, "t2v_cfg", extra=True)
    assert t2v["status"] == "ok"
    assert t2v["result"]["metric"].startswith("t2v_e2e_sec")
    assert any(k.startswith("t2v_denoise_") for k in t2v["phases"])
    tup = tier_record(detail, "temporal_upscale", extra=True)
    assert tup["status"] == "ok"
    assert tup["phases"]["temporal_upscale_2x"]["n_samples"] >= 3
    assert "tiled" in tup["phases"]["vae_decode_tiled_2x_frames"]["note"]

    # summary block for the judge: one value per measured extra metric
    assert set(detail["extra_metrics"]) >= {
        two_stage["result"]["metric"],
        av["result"]["metric"],
        t2v["result"]["metric"],
        tup["result"]["metric"],
        "two_stage_e2e_sec_cfg_interval2",
    }


def test_int8_roofline_dot_stays_full():
    """The roofline chain must keep the full (m,n) int32 dot live: with a
    sliced consumer XLA sinks the slice into the dot and eliminates the
    work being measured (observed on the CPU pipeline: a y[:1,:1]
    consumer compiled the (m,k)x(k,n) dot down to a [1,1] dot, which
    would make the reported TF/s meaningless). Pin the optimized HLO."""
    import re as _re
    import sys

    sys.path.insert(0, REPO)
    import bench

    m, k, n, steps = 8, 128, 256, 2
    chain, ws, xq, _flops = bench.int8_roofline_chain(m, k, n, steps)
    txt = chain.lower(ws, xq).compile().as_text()
    assert _re.search(rf"s32\[{m},{n}\][^\n]*dot\(", txt), (
        "full-shape int32 dot missing from optimized HLO — the roofline "
        "chain's consumer no longer keeps the dot output live"
    )


@pytest.mark.parametrize(
    "text,expect",
    [
        ("jax.errors.JaxRuntimeError: ABORTED: TPU backend error", True),
        ("RPC failed: UNAVAILABLE: Socket closed", True),
        ("ValueError: shapes do not match", False),
    ],
)
def test_transient_classifier(text, expect):
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)
    assert bench._is_transient(text) is expect
