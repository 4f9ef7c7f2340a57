"""Golden-tensor parity tests vs PyTorch/MLX reference dumps.

Reference QA model (docs/PARITY.md, tests/test_parity.py:36-49): per-stage
Pearson correlation >= 0.95 against .npy tensors dumped by the PyTorch
reference (scripts/generate_pytorch_checkpoints.py there, or
scripts/dump_parity_tensors.py here run against the reference outputs).

Set LTX2_PARITY_REFERENCE_DIR and LTX2_PARITY_CANDIDATE_DIR to directories
of matching .npy dumps. Skipped (requires_weights) when unset.
"""

import os
from pathlib import Path

import numpy as np
import pytest

REFERENCE_DIR = os.environ.get("LTX2_PARITY_REFERENCE_DIR")
CANDIDATE_DIR = os.environ.get("LTX2_PARITY_CANDIDATE_DIR")

CORRELATION_BAR = 0.95


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 1.0 if np.allclose(a, b) else 0.0
    return float(np.dot(a, b) / denom)


def _stage_files():
    if not REFERENCE_DIR or not CANDIDATE_DIR:
        return []
    ref = Path(REFERENCE_DIR)
    cand = Path(CANDIDATE_DIR)
    stages = []
    for ref_file in sorted(ref.glob("*.npy")):
        cand_file = cand / ref_file.name
        if cand_file.exists():
            stages.append((ref_file, cand_file))
    return stages


@pytest.mark.requires_weights
@pytest.mark.skipif(
    not (REFERENCE_DIR and CANDIDATE_DIR),
    reason="set LTX2_PARITY_REFERENCE_DIR / LTX2_PARITY_CANDIDATE_DIR",
)
def test_stage_correlations():
    stages = _stage_files()
    assert stages, "no overlapping .npy stage files found"
    report = {}
    failures = []
    for ref_file, cand_file in stages:
        ref = np.load(ref_file)
        cand = np.load(cand_file)
        if ref.shape != cand.shape:
            failures.append(f"{ref_file.name}: shape {cand.shape} != {ref.shape}")
            continue
        corr = pearson(ref, cand)
        report[ref_file.name] = round(corr, 4)
        if corr < CORRELATION_BAR:
            failures.append(f"{ref_file.name}: corr {corr:.4f} < {CORRELATION_BAR}")
    print("parity report:", report)
    assert not failures, "\n".join(failures)


class TestPearson:
    """The correlation metric itself is weight-free testable."""

    def test_identical(self):
        x = np.random.default_rng(0).normal(size=(100,))
        assert pearson(x, x) == pytest.approx(1.0)

    def test_scaled_shifted(self):
        x = np.random.default_rng(0).normal(size=(100,))
        assert pearson(x, 3 * x + 5) == pytest.approx(1.0)

    def test_uncorrelated(self):
        rng = np.random.default_rng(0)
        assert abs(pearson(rng.normal(size=(10000,)), rng.normal(size=(10000,)))) < 0.05
