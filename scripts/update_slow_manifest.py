"""Regenerate tests/slow_tests.txt from a pytest --durations=0 log.

The fast test lane (`pytest -m "not slow"`) excludes tests whose measured
setup+call+teardown exceeds the threshold; the manifest is checked in so
the lane is deterministic and auditable. Workflow:

    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/suite.log
    python scripts/update_slow_manifest.py /tmp/suite.log

conftest.py warns at sessionfinish when an unmanifested test runs >2x the
threshold, so drift surfaces in normal full-lane runs.
"""

import argparse
import collections
import os
import re

THRESHOLD_SECS = 5.0
# Capture to end-of-line, not \S+: parametrized nodeids may contain
# spaces (test_y[two words]) and a truncated id never matches in conftest.
_LINE = re.compile(r"\s*([\d.]+)s (call|setup|teardown)\s+(tests/.+?)\s*$")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log", help="pytest output captured with --durations=0")
    ap.add_argument("--threshold", type=float, default=THRESHOLD_SECS)
    ap.add_argument(
        "--manifest",
        default=os.path.join(os.path.dirname(__file__), "..", "tests", "slow_tests.txt"),
    )
    args = ap.parse_args()

    totals = collections.Counter()
    with open(args.log) as fh:
        for line in fh:
            m = _LINE.match(line)
            if m:
                totals[m.group(3)] += float(m.group(1))
    slow = sorted(nid for nid, secs in totals.items() if secs > args.threshold)
    if not slow:
        raise SystemExit(
            "no tests above threshold parsed — was the log captured with --durations=0?"
        )
    with open(args.manifest, "w") as fh:
        fh.write(
            f"# Tests measured >{args.threshold:.0f}s (setup+call+teardown) on a full-suite\n"
            "# run. conftest.py marks these `slow` so `pytest -m 'not slow'` is the\n"
            "# <10-min fast lane. Regenerate via scripts/update_slow_manifest.py.\n"
        )
        for nid in slow:
            fh.write(nid + "\n")
    print(f"wrote {len(slow)} entries to {args.manifest}")


if __name__ == "__main__":
    main()
