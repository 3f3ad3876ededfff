"""Foreign-busy attribution in bench.py's quiet-window telemetry.

The round-5 live failure mode: a concurrent pytest run inflated bench
queries up to 17x while steal stayed ~0 — same-box contention is
invisible to the steal signal, so the quiet gate also subtracts THIS
process tree's CPU from machine busy. The assertion here is written to
hold even on a contended box: whatever else is running, a burner spawned
in OUR tree must be attributed to own (not foreign) load."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_own_tree_cpu_is_not_foreign():
    from bench import _busy_steal_cores, _cpu_snapshot

    p = subprocess.Popen([sys.executable, "-c", "while True: pass"])
    try:
        time.sleep(0.3)
        a = _cpu_snapshot()
        time.sleep(2.0)
        b = _cpu_snapshot()
    finally:
        p.kill()
        p.wait()
    busy, steal, foreign = _busy_steal_cores(a, b)
    # the burner is ~1 core of OWN load: busy counts it, foreign must not
    assert busy >= 0.8
    assert busy - foreign >= 0.6, (busy, steal, foreign)
