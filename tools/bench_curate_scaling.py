"""Two-parallelism scaling evidence for the CURATION pipeline.

Supplementary to bench_scaling.py (the north-rule gate on the validation
engine): the same end-to-end curation job — quality gate, deterministic
sample, exact dedup, minhash+components near dedup, token-budget shard
packing (jobs/curate.py) — on the same pre-materialized synthetic doc
corpus at local[N] and local[4N], fresh JVM each, reporting docs/sec at
both plus efficiency = (tput_4N / tput_N) / 4.

Same methodology discipline as bench_scaling.py: interleaved rounds so
both levels sample the same host-contention distribution, per-run
machine busy/steal cores from /proc/stat, best-of compared, corpus
generated once (deterministic: word choice and duplicate planting are
pure column expressions of the doc id, seeded — no rand()).

Env: CURATE_DOCS (default 100000 — below ~50k the pipeline's fixed
per-action scheduling overhead dominates and thread count stops
mattering), BENCH_ROUNDS (default 2), CURATE_PAIR (default "4:16").
Writes one JSON line; paste the row into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# overridable so a CURATE_DOCS change regenerates instead of silently
# reusing a cached corpus of the old size
CORPUS = os.environ.get("CURATE_CORPUS", "/tmp/spark_graft_curate_bench")


def _cpu():
    t = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(t), t[3] + t[4], (t[7] if len(t) > 7 else 0)


def _busy_steal(a, b):
    dt = b[0] - a[0]
    n = os.cpu_count() or 1
    if not dt:
        return float("nan"), float("nan")
    return round(n * (1 - (b[1] - a[1]) / dt), 1), round(n * (b[2] - a[2]) / dt, 2)


def _wait_for_quiet(probe_s: float = 6.0, max_wait_s: float = 900.0) -> bool:
    """Sample host steal BEFORE launching a run: a curate run costs ~1-10
    minutes, so discovering the storm post-hoc wastes the whole run.
    Probe cheaply, sleep through storms (they are episodic, minutes-long),
    launch only into a quiet window. Returns False if the storm outlasted
    ``max_wait_s`` (caller proceeds, disclosed)."""
    deadline = time.time() + max_wait_s
    while True:
        a = _cpu()
        time.sleep(probe_s)
        _, steal = _busy_steal(a, _cpu())
        if steal < 0.5:
            return True
        if time.time() > deadline:
            return False
        print(f"pre-probe stormy (steal={steal}); waiting", file=sys.stderr)
        time.sleep(25)


GEN = """
import os, sys
sys.path.insert(0, {repo!r})
from taco_toolbox_spark.session import get_spark
import pyspark.sql.functions as F
spark = get_spark("curate_corpus")
n = {n}
# deterministic corpus with planted duplicate structure: docs whose id
# hits the 29-stride share a base id modulo 997, so their word streams
# collide (exact or near dups after the per-doc tail tokens)
ids = spark.range(n)
base = F.when(F.col("id") % 29 == 0, F.col("id") % 997).otherwise(F.col("id"))
words = F.transform(
    F.sequence(F.lit(1), (F.lit(12) + F.pmod(base, F.lit(28))).cast("int")),
    lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(base, i), F.lit(400))),
)
tail = F.when(F.col("id") % 29 == 0,
              F.concat(F.lit(" t"), F.pmod(F.col("id"), F.lit(3)))
      ).otherwise(F.lit(""))
docs = ids.select(
    F.col("id").alias("doc_id"),
    F.concat(F.concat_ws(" ", words), tail).alias("text"),
    F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(4))).alias("source"),
)
docs.write.mode("overwrite").parquet({corpus!r} + "/docs")
spark.stop()
"""

RUN = """
import os, sys, json, time
sys.path.insert(0, {repo!r})
import jobs.curate as jc
rc = jc.main([
    "--input", {corpus!r} + "/docs",
    "--output", {out!r},
    "--min-tokens", "3",
    "--jaccard-threshold", "0.5",
    "--max-shard-tokens", "50000",
])
print("RC", rc)
"""


def main():
    n_docs = int(os.environ.get("CURATE_DOCS", "100000"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    lo, hi = (int(x) for x in os.environ.get("CURATE_PAIR", "4:16").split(":"))

    if not os.path.exists(f"{CORPUS}/docs/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO, n=n_docs, corpus=CORPUS)],
            check=True, capture_output=True,
        )

    # storm discipline (same contract as bench.py): this box suffers
    # episodic host-side co-tenant storms; a run that measured >= 0.5
    # stolen cores is kept as DISCLOSED evidence but retried (bounded) —
    # the efficiency headline is computed from quiet runs when any exist
    max_tries = int(os.environ.get("CURATE_QUIET_TRIES", "3"))
    results = {lo: [], hi: []}
    stormy = {lo: [], hi: []}
    for r in range(rounds):
        for cpus in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            for attempt in range(max_tries):
                out = f"{CORPUS}/out_{cpus}_{r}_{attempt}"
                _wait_for_quiet()
                a = _cpu()
                t0 = time.time()
                p = subprocess.run(
                    [sys.executable, "-c",
                     RUN.format(repo=REPO, corpus=CORPUS, out=out)],
                    env=env, capture_output=True, text=True,
                )
                wall_total = time.time() - t0
                busy, steal = _busy_steal(a, _cpu())
                if p.returncode != 0:
                    print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                    raise SystemExit(1)
                m = json.load(open(f"{out}/manifest.json"))
                # the manifest's wall_s starts AFTER session creation — JVM
                # startup is a fixed per-process cost identical at both
                # levels, and folding it in dilutes the scaling signal
                wall = m["wall_s"]
                kept = m["funnel"]["input"]
                rec = {
                    "wall_s": wall,
                    "jvm_overhead_s": round(wall_total - wall, 1),
                    "docs_per_s": round(kept / wall, 1),
                    "busy": busy, "steal": steal,
                }
                if steal < 0.5:
                    results[cpus].append(rec)
                    break
                stormy[cpus].append(rec)
                print(f"stormy run (steal={steal}) at local[{cpus}], "
                      f"attempt {attempt + 1}/{max_tries}", file=sys.stderr)

    # headline from quiet runs; fall back (flagged) if a level never got one
    poisoned = any(not results[c] for c in (lo, hi))
    pool = {c: results[c] or stormy[c] for c in (lo, hi)}
    best = {c: max(r["docs_per_s"] for r in pool[c]) for c in pool}
    eff = round(best[hi] / best[lo] / (hi / lo), 3)
    line = {
        "metric": "curate_pipeline_scaling", "docs": n_docs,
        "pair": f"{lo}:{hi}", "docs_per_s": best,
        "efficiency": eff, "runs": results,
    }
    if poisoned:
        line["poisoned"] = True
    if stormy[lo] or stormy[hi]:
        line["stormy_runs"] = stormy
    print(json.dumps(line))


if __name__ == "__main__":
    main()
