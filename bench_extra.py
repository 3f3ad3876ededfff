"""Per-query isolation profiler (guide §1.4) — NOT the frozen bench.py.

For each named query: time (a) dataframe build (Python + any driver
actions inside the builder), (b) plan explain (analysis/optimization),
(c) first noop-sink execution (includes codegen/JIT for this plan),
(d) second noop-sink execution on a FRESHLY REBUILT dataframe (new
expression ids — what a warm session pays). Writes plans to
plans/r06/<query>_<tag>.txt when PLAN_TAG is set.

Usage:
  python bench_extra.py q1 q2 ...          # profile named queries
  PLAN_TAG=before python bench_extra.py q  # also dump formatted plans
  REPEATS=3 python bench_extra.py q        # extra exec repeats
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().replace("\x00", "<NUL>").replace("\x1f", "<US>")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    tag = os.environ.get("PLAN_TAG", "")
    repeats = int(os.environ.get("REPEATS", "2"))

    from taco_toolbox_spark.session import get_spark

    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * int(cpus),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for t in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    out = {}
    for name in names:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        plan = explain_str(df)
        t_plan = time.time() - t0
        n_exchange = plan.count("Exchange")
        n_python = sum(
            plan.count(x)
            for x in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        )
        execs = []
        for i in range(repeats):
            if i > 0:
                df = fn(spark, sf_dir)  # fresh expression ids, warm JVM
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            execs.append(round(time.time() - t0, 3))
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "execs": execs,
            "exchanges": n_exchange,
            "python_nodes": n_python,
        }
        print(f"{name}: {json.dumps(out[name])}", file=sys.stderr, flush=True)
        if tag:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(plan)
    print(json.dumps(out, indent=1))
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()
