"""bench.py orchestration tests (VERDICT r3 #1).

Round 3 lost its headline perf artifact to a transient `ABORTED: TPU
backend error`: the old bench.py swallowed each tier's exception with a
bare `except: pass`, never retried, and recorded nothing. These tests
drive the rebuilt subprocess-per-tier harness end-to-end in smoke mode
(LTX2_BENCH_SMOKE=1: CPU, tiny shapes) with injected ABORTED faults
(LTX2_BENCH_FAULT) and assert the three failure-discipline guarantees:

1. a transient failure is retried and can succeed on a later attempt;
2. a tier that keeps failing is recorded (error tail + outcome) and the
   harness falls back to the next tier — the round still gets a number;
3. even total failure produces a parseable JSON line plus a
   BENCH_DETAIL.json explaining every attempt — never a bare stack trace.

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


def run_bench(tmp_path, fault: str):
    detail_out = tmp_path / "detail.json"
    env = os.environ.copy()
    env.update(
        LTX2_BENCH_SMOKE="1",
        LTX2_BENCH_FAULT=fault,
        LTX2_BENCH_DETAIL_OUT=str(detail_out),
        # Children are fresh processes; share a compile cache so repeated
        # tiny-shape tiers don't each pay cold XLA compiles.
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_bench_smoke",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1.0",
    )
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    detail = json.loads(detail_out.read_text())
    return proc.returncode, result, detail


def tier_record(detail, name):
    return next(t for t in detail["tiers"] if t["tier"] == name)


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
    assert detail["phases"]["vae_decode"]["seconds"] >= 0


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


def test_int8_phase_failure_never_kills_the_e2e_tier(tmp_path):
    """The optional --int8 extra phase is failure-isolated: a fault AFTER
    the int8 tree is allocated must (a) record the error in the phase,
    (b) free the tree so the VAE decode that follows doesn't OOM, and
    (c) leave the e2e tier ok with the fp8 headline (review r4: the old
    handler leaked the multi-GB int8 params into the decode)."""
    rc, result, detail = run_bench(tmp_path, fault="int8")
    assert rc == 0
    assert result["metric"].startswith("e2e_sec_prompt_to_pixels")
    assert result["value"] > 0
    assert tier_record(detail, "e2e")["status"] == "ok"
    int8_phase = detail["phases"]["denoise_loop_8step_int8"]
    assert "injected fault" in int8_phase["error"]
    assert detail["phases"]["vae_decode"]["seconds"] >= 0  # decode still ran


def test_total_failure_still_emits_artifact(tmp_path):
    rc, result, detail = run_bench(tmp_path, fault="e2e,dit_fp8,dit_bf16_extrap")
    assert rc == 1
    assert result["metric"] == "bench_all_tiers_failed"
    for name in ("e2e", "dit_fp8", "dit_bf16_extrap"):
        rec = tier_record(detail, name)
        assert rec["status"] == "failed"
        assert all(a["error_tail"] for a in rec["attempts"])


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
