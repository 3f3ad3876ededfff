"""Interleaved A/B of the validation battery with and without the round-5
check family (role grammar, closing rule, ts gap) on the bench's bucketed
corpus — isolates the cost of the added checks from host noise.

Usage: python tools/ab_battery.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    v = [int(x) for x in p]
    return time.time(), sum(v) - v[3] - v[4], v[7]


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from taco_toolbox_spark.checks import (
        GapCheck,
        ROLE_LAST,
        role_sequence_check,
        transcript_checks,
    )
    from taco_toolbox_spark.checks.drift import approx_global_quantiles
    from taco_toolbox_spark.engine import EngineConfig, run_validation
    from taco_toolbox_spark.operators.bucketing import attach_bucketed
    from taco_toolbox_spark.session import get_spark

    corpus_dir = "/tmp/spark_graft_bench/corpus_500000"
    spark = get_spark("ab_battery", master="local[32]", shuffle_partitions=32)
    raw = spark.read.parquet(f"{corpus_dir}/transcripts")
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in raw.schema.fields
    )
    with open(os.path.join(corpus_dir, "_BUCKETED")) as f:
        marked = f.read().strip()
    n_buckets = int(marked) if marked.isdigit() else 64
    df = attach_bucketed(
        spark, "ab_t", f"{corpus_dir}/bucketed_transcripts",
        schema_ddl, ["conv_id"], n_buckets, ["conv_id", "turn_idx"],
    )
    ref = attach_bucketed(
        spark, "ab_b", f"{corpus_dir}/bucketed_transcripts_baseline",
        schema_ddl, ["conv_id"], n_buckets, ["conv_id", "turn_idx"],
    )
    print("turns:", df.count(), flush=True)
    bq = approx_global_quantiles(ref, "length(text)", (0.1, 0.25, 0.5, 0.75, 0.9))
    base = transcript_checks(reference=ref, drift_baseline=bq, colocated=True)
    extra = base + [
        role_sequence_check(),
        role_sequence_check(
            check_id="role_close", allowed=None, first=None, last=ROLE_LAST
        ),
        GapCheck(check_id="ts_gap", value_col="ts", max_step=120),
    ]
    plans = {
        "base": run_validation(df, base, EngineConfig()),
        "extra": run_validation(df, extra, EngineConfig()),
    }
    results = {"base": [], "extra": []}
    for rep in range(n_reps):
        for name in ("base", "extra"):
            t0, b0, s0 = _cpu()
            summary = plans[name].summary()
            t1, b1, s1 = _cpu()
            wall = t1 - t0
            hz = os.sysconf("SC_CLK_TCK")
            busy = (b1 - b0) / hz / wall
            steal = (s1 - s0) / hz / wall
            results[name].append((round(wall, 2), round(busy, 1), round(steal, 2)))
            print(f"rep{rep} {name}: wall={wall:.2f}s busy={busy:.1f} "
                  f"steal={steal:.2f} {summary}", flush=True)
    for name, rows in results.items():
        quiet = [w for (w, b, s) in rows if s < 0.5]
        print(f"{name}: best_quiet={min(quiet) if quiet else None} all={rows}")


if __name__ == "__main__":
    main()
