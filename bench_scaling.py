"""Two-parallelism scaling evidence (BASELINE north_rule).

The rule's criterion — throughput scaling efficiency ≥ 0.8 from N to 4N
executors — can't use a real cluster in this sandbox, so we run the SAME
validation job on the SAME pre-materialized input at local[8] and local[32]
(fresh JVM each, via subprocess) and report throughput at both plus
  efficiency = (tput_4N / tput_N) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, turns: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY="validation",
        BENCH_TURNS=str(turns),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    turns = int(os.environ.get("BENCH_TURNS", "2000000"))
    # N vs 4N. On a shared box, leave headroom: if co-tenant load already
    # eats ~25% of the cores, local[32] cannot get 32 clean threads and the
    # measured efficiency is an artifact of contention, not the plan.
    n_small = int(os.environ.get("BENCH_N_SMALL", "8"))
    n_large = int(os.environ.get("BENCH_N_LARGE", str(4 * n_small)))

    r_small = run_at(n_small, turns)
    r_large = run_at(n_large, turns)
    t_s = r_small["validation"]["turns_per_sec"]
    t_l = r_large["validation"]["turns_per_sec"]
    eff = (t_l / t_s) / (n_large / n_small)

    result = {
        "metric": "validation_scaling_efficiency",
        "turns": r_small["validation"]["turns"],
        f"turns_per_sec_local[{n_small}]": t_s,
        f"turns_per_sec_local[{n_large}]": t_l,
        "efficiency_N_to_4N": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — validation throughput + scaling evidence

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by bench_scaling.py.

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox evidence: the SAME validation job (full transcript check battery:
single-pass stats, uniqueness, vocab, format, null/range, monotone-ts
window, contiguity, drift sketch, text-equality join vs clean baseline) on
the SAME pre-materialized parquet corpus (~{r_small['validation']['turns']:,} turns,
~0.1% injected violations, heavy-tail conversation lengths with hot
conversations), at two parallelism levels in fresh JVMs.

| parallelism | wall sec | validated turns/sec |
|---|---|---|
| local[{n_small}] (N) | {r_small['validation']['sec']} | {t_s:,.0f} |
| local[{n_large}] (4N) | {r_large['validation']['sec']} | {t_l:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})

Violations found: {r_large['validation']['violations']:,} rows;
failed (partition, check) cells: {r_large['validation']['failed_part_checks']:,}.

Method notes:
- Input is written once and reused, so both levels read identical bytes.
- Each level runs in its own JVM (subprocess) — no warm-cache advantage.
- local[k] shares one JVM heap; on a real cluster the same plan shape
  (partial aggs, salted sketch merge, broadcast joins, AQE) distributes
  across executors with the same shuffle volume per core.
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
