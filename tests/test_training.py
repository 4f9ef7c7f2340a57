"""Training suite runner: executes tests/isolated/training_suite.py in a
FRESH python process.

Why: the sharded train-step executables (fwd+bwd+adamw with donation,
TPxDP / ZeRO-1/2 over the 8-device virtual mesh) are the largest XLA:CPU
compiles in the suite. Compiling or cache-serializing them late in a
long-lived process that has already JIT-compiled hundreds of modules
intermittently segfaults inside XLA C++ (observed twice at ~76% of the
full suite: once in backend_compile_and_load, once in the compilation
cache's serialize path; never reproducible in a fresh process, even with
a cold cache). Until the upstream crash is fixed, the training tests run
with a young process — identical coverage, deterministic result.

Run the suite directly for per-test granularity:
    python -m pytest tests/isolated/training_suite.py -q
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUITE = os.path.join(_REPO, "tests", "isolated", "training_suite.py")


@pytest.mark.slow
def test_training_suite_in_fresh_process():
    result = subprocess.run(
        [sys.executable, "-m", "pytest", _SUITE, "-q", "-p", "no:cacheprovider"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        env=os.environ.copy(),  # carries LTX2_TESTS_CACHE_OWNER=1
        timeout=3600,
    )
    tail = (result.stdout + result.stderr)[-4000:]
    assert result.returncode == 0, f"training suite failed:\n{tail}"
    summary = [
        ln for ln in result.stdout.splitlines() if " passed" in ln
    ]
    print(f"training suite: {summary[-1].strip() if summary else 'no summary'}")
    assert summary and "failed" not in summary[-1]
