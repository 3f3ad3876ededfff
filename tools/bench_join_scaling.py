"""Two-parallelism scaling evidence for the batch top-k similarity join
(similarity/join.py:cosine_topk_join_blocked) — the north-rule protocol
applied to this round's new operator family.

Same methodology as bench_scaling.py (one VM, so N vs 4N threads stands
in for N vs 4N executors): the SAME pre-materialized input is scored at
two parallelism levels in fresh JVMs (subprocess per level), levels are
INTERLEAVED round-by-round so both sample the same contention
distribution, every repeat records machine-wide busy/steal cores, and
the reported figure per level is the MINIMUM over repeats (interference
only inflates elapsed time). Efficiency = (tput_hi / tput_lo) /
(hi / lo).

Why this operator is the right scaling demo: the blocked join is the
map-side-top-k design whose ONLY shuffle is O(batches x |Q| x k)
survivor rows — so its scaling is governed by the embarrassingly
parallel scan+matmul, and a flat efficiency number here directly
evidences that the shuffle really did drop out of the scaling path.

Input: a deterministic synthetic corpus (vector components are pure
integer-hash arithmetic of (id, dim) — no rand(), engine-replayable),
written once and reused by every level/repeat.

Usage:
  python tools/bench_join_scaling.py            # orchestrate, append to BENCH/BASELINE.md
  python tools/bench_join_scaling.py --worker N # one level, prints JSON (internal)

Env: JOIN_BENCH_ROWS (default 3_000_000), JOIN_BENCH_DIM (32),
JOIN_BENCH_QUERIES (64), JOIN_BENCH_REPEATS (3),
JOIN_BENCH_LEVELS (default "8,32"), JOIN_BENCH_DATA (/tmp dir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("JOIN_BENCH_ROWS", "3000000"))
DIM = int(os.environ.get("JOIN_BENCH_DIM", "32"))
N_QUERIES = int(os.environ.get("JOIN_BENCH_QUERIES", "64"))
REPEATS = int(os.environ.get("JOIN_BENCH_REPEATS", "3"))
DATA = os.environ.get("JOIN_BENCH_DATA", "/tmp/spark_graft_join_bench")


def _cpu():
    t = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(t), t[3] + t[4], (t[7] if len(t) > 7 else 0)


def _busy_steal(a, b):
    n = os.cpu_count() or 1
    dt = max(b[0] - a[0], 1)
    return (
        round(n * (1 - (b[1] - a[1]) / dt), 1),
        round(n * (b[2] - a[2]) / dt, 2),
    )


def _corpus_dir() -> str:
    return os.path.join(DATA, f"r{ROWS}_d{DIM}_q{N_QUERIES}")


def materialize(spark) -> None:
    """Deterministic synthetic vectors: component d of row i is
    pmod(xxhash64(i, d), 2001)/1000 - 1 in [-1, 1] — a pure function of
    (i, d), identical at any partitioning. Queries are rows hashed into
    a ~N_QUERIES-sized slice (disjoint from the corpus)."""
    from pyspark.sql import functions as F

    d = _corpus_dir()
    if os.path.exists(os.path.join(d, "_DONE")):
        return
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2001))
                .cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            ).cast("float")
            for j in range(DIM)
        ]
    )
    base = (
        spark.range(ROWS + N_QUERIES)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    )
    base.filter(F.col("vec_id") < N_QUERIES).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "queries"))
    base.filter(F.col("vec_id") >= N_QUERIES).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "corpus"))
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")


def worker(cpus: int) -> None:
    from taco_toolbox_spark.session import get_spark
    from taco_toolbox_spark.similarity.join import cosine_topk_join_blocked

    spark = get_spark(
        "join_scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    materialize(spark)
    d = _corpus_dir()
    q = spark.read.parquet(os.path.join(d, "queries"))
    c = spark.read.parquet(os.path.join(d, "corpus"))
    out = cosine_topk_join_blocked(q, c, k=10)
    secs, telem = [], []
    for _ in range(REPEATS):
        cpu0 = _cpu()
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 3)
        secs.append(sec)
        telem.append([sec, *_busy_steal(cpu0, _cpu())])
    best = min(secs)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "rows": ROWS,
                "dim": DIM,
                "queries": N_QUERIES,
                "best_sec": best,
                "rows_per_sec": round(ROWS / best, 1),
                "repeats_sec_busy_steal": telem,
            }
        )
    )
    spark.stop()


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    levels = [
        int(x)
        for x in os.environ.get("JOIN_BENCH_LEVELS", "8,32").split(",")
    ]
    rounds = int(os.environ.get("JOIN_BENCH_ROUNDS", "2"))
    best: dict[int, dict] = {}
    for rnd in range(rounds):  # interleaved: both levels see the same storms
        for lv in levels:
            res = run_level(lv)
            if lv not in best or res["best_sec"] < best[lv]["best_sec"]:
                best[lv] = res
            print(f"round {rnd} local[{lv}]: {res}", file=sys.stderr, flush=True)
    lo, hi = min(levels), max(levels)
    eff = (
        best[hi]["rows_per_sec"] / best[lo]["rows_per_sec"]
    ) / (hi / lo)
    line = {
        "metric": "topk_join_blocked_scaling",
        "rows": ROWS,
        "dim": DIM,
        "queries": N_QUERIES,
        "levels": {str(lv): best[lv] for lv in levels},
        "efficiency": round(eff, 3),
        "pair": f"{lo}->{hi}",
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
