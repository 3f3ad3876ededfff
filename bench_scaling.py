"""Two-parallelism scaling evidence (BASELINE north_rule).

The rule's criterion — throughput scaling efficiency >= 0.8 from N to 4N
executors — can't use a real cluster in this sandbox, so we run the SAME
validation job on the SAME pre-materialized input at local[N] and
local[4N] (fresh JVM each, via subprocess) and report throughput at both
plus
  efficiency = (tput_4N / tput_N) / 4.

Methodology notes (the sandbox is a shared box whose identical runs vary
3-6x):
- Levels are INTERLEAVED round-by-round (N, 4N, N, 4N, ...) so both sample
  the same contention distribution, then best-of per level is compared —
  sequential level blocks would attribute a noisy window to one level.
- Each subprocess reports per-repeat wall times, per-stage breakdown and
  the loadavg at start (bench.py), all echoed into BENCH/BASELINE.md, so a
  contended round is visible rather than silently folded into the mean.

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
        BENCH_REPEATS=os.environ.get("BENCH_REPEATS", "2"),
        # early-exit threshold scales with cores: a repeat that already
        # demonstrates ~20k turns/s/core is a quiet-box measurement
        BENCH_TARGET_TPS=str(20_000 * cpus),
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
    turns = int(os.environ.get("BENCH_TURNS", "4000000"))
    # N vs 4N. On a shared box, leave headroom: if co-tenant load already
    # eats ~25% of the cores, local[32] cannot get 32 clean threads and the
    # measured efficiency is an artifact of contention, not the plan.
    n_small = int(os.environ.get("BENCH_N_SMALL", "4"))
    n_large = int(os.environ.get("BENCH_N_LARGE", str(4 * n_small)))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    runs: dict[int, list[dict]] = {n_small: [], n_large: []}
    for _ in range(rounds):
        for cpus in (n_small, n_large):
            runs[cpus].append(run_at(cpus, turns)["validation"])

    best = {c: max(rs, key=lambda r: r["turns_per_sec"]) for c, rs in runs.items()}
    t_s = best[n_small]["turns_per_sec"]
    t_l = best[n_large]["turns_per_sec"]
    eff = (t_l / t_s) / (n_large / n_small)

    result = {
        "metric": "validation_scaling_efficiency",
        "turns": best[n_small]["turns"],
        f"turns_per_sec_local[{n_small}]": t_s,
        f"turns_per_sec_local[{n_large}]": t_l,
        "efficiency_N_to_4N": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }

    def level_table(cpus: int) -> str:
        rows = []
        for i, r in enumerate(runs[cpus]):
            rows.append(
                f"| round {i} | {r['repeat_secs']} | "
                f"{r['stages']['loadavg_at_start']} | "
                f"{r['turns_per_sec']:,.0f} |"
            )
        return "\n".join(rows)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — validation throughput + scaling evidence

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by bench_scaling.py.

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox evidence: the SAME validation job (full transcript check battery:
single-pass stats profile with quantiles, uniqueness, vocab, format,
null/range, monotone-ts windows, contiguity, drift sketch, per-turn
text-equality vs the clean baseline) on the SAME pre-materialized
conv_id-bucketed corpus (~{best[n_small]['turns']:,} turns, ~0.1% injected
violations, heavy-tail conversation lengths), at two parallelism levels in
fresh JVMs, INTERLEAVED round-by-round so both levels sample the same
shared-box contention; best-of per level compared.

| parallelism | best wall sec | validated turns/sec |
|---|---|---|
| local[{n_small}] (N) | {best[n_small]['sec']} | {t_s:,.0f} |
| local[{n_large}] (4N) | {best[n_large]['sec']} | {t_l:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})

## All rounds (shared-box transparency)

local[{n_small}]: | round | repeat secs | loadavg at best | best turns/s |
|---|---|---|---|
{level_table(n_small)}

local[{n_large}]: | round | repeat secs | loadavg at best | best turns/s |
|---|---|---|---|
{level_table(n_large)}

Method notes:
- Input is written once (bucketed by conv_id, sorted by (conv_id,
  turn_idx)) and reused, so both levels read identical bytes; the
  text-equality join and all per-conversation windows are exchange-free
  over this layout, so the job's scalable cost is scan+compute rather
  than a single shared spill disk.
- Each level runs in its own JVM (subprocess) — no warm-cache advantage;
  plans are built once per process and re-executed per repeat (JIT
  compiles generated code once, as a long-running production validator
  would).
- local[k] shares one JVM heap; on a real cluster the same plan shape
  (partial aggs, salted sketch merge, broadcast joins, AQE) distributes
  across executors with the same shuffle volume per core.
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
