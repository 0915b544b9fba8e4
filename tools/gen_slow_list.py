"""Regenerate tests/slow_tests.txt from a pytest --durations=0 log.

The fast iteration tier (`pytest -m "not slow"`) deselects every nodeid in
tests/slow_tests.txt (applied by tests/conftest.py); this tool rebuilds the
list from measured durations so the tier tracks reality instead of guesses.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/pytest_dur.log
    python tools/gen_slow_list.py /tmp/pytest_dur.log [threshold_seconds]

A test is slow when its summed call+setup+teardown time is >= the threshold
(default 3.0 s -- measured to leave the fast tier under ~4 min on the
1-vCPU CI box at round 4's 320-test suite).
"""
import re
import sys
from collections import defaultdict
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "slow_tests.txt"


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    agg = defaultdict(float)
    pat = re.compile(r"^([0-9.]+)s (call|setup|teardown)\s+(\S+)")
    with open(sys.argv[1]) as f:
        for line in f:
            m = pat.match(line)
            if m:
                agg[m.group(3)] += float(m.group(1))
    slow = sorted(t for t, v in agg.items() if v >= threshold)
    OUT.write_text("\n".join(slow) + "\n")
    fast = sum(v for v in agg.values() if v < threshold)
    print(f"{len(slow)} slow nodeids written to {OUT} "
          f"(threshold {threshold}s; fast tier ~{fast:.0f}s accounted)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
