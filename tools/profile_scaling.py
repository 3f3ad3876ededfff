"""Profile the validation bench's timed section with Spark event logs.

Usage: python tools/profile_scaling.py <cpus> [n_convs] [reps]
Prints wall time per action plus, from the event log, per-stage
(task count, sum task time, max task time, CPU, GC, shuffle, spill) so the
non-scaling component of the N->4N efficiency gap is visible.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = sys.argv[1] if len(sys.argv) > 1 else "16"
N_CONVS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
LOGDIR = f"/tmp/sparklogs_{CPUS}_{int(time.time())}"
os.makedirs(LOGDIR, exist_ok=True)

from taco_toolbox_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "profile",
    master=f"local[{CPUS}]",
    shuffle_partitions=4 * int(CPUS),
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": LOGDIR,
    },
)

corpus_dir = f"/tmp/spark_graft_bench/corpus_{N_CONVS}"
tag = f"b{N_CONVS}"

from taco_toolbox_spark.checks import transcript_checks  # noqa: E402
from taco_toolbox_spark.checks.drift import approx_global_quantiles  # noqa: E402
from taco_toolbox_spark.engine import EngineConfig, run_validation  # noqa: E402
from taco_toolbox_spark.operators.bucketing import attach_bucketed  # noqa: E402
from taco_toolbox_spark.stats import column_stats  # noqa: E402

raw = spark.read.parquet(f"{corpus_dir}/transcripts")
schema_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in raw.schema.fields)
with open(os.path.join(corpus_dir, "_BUCKETED")) as f:
    marked = f.read().strip()
N_BUCKETS = int(marked) if marked.isdigit() else 64
df = attach_bucketed(
    spark, f"transcripts_{tag}", f"{corpus_dir}/bucketed_transcripts",
    schema_ddl, ["conv_id"], N_BUCKETS, ["conv_id", "turn_idx"],
)
ref = attach_bucketed(
    spark, f"transcripts_baseline_{tag}", f"{corpus_dir}/bucketed_transcripts_baseline",
    schema_ddl, ["conv_id"], N_BUCKETS, ["conv_id", "turn_idx"],
)
n_turns = df.count()
baseline_q = approx_global_quantiles(ref, "length(text)", (0.1, 0.25, 0.5, 0.75, 0.9))
checks = transcript_checks(reference=ref, drift_baseline=baseline_q, colocated=True)

t0 = time.time()
res = run_validation(df, checks, EngineConfig(persist_violations=True))
stats_df = column_stats(df)
plan_sec = time.time() - t0

timings = []
for rep in range(REPS):
    res.violations.persist()
    t0 = time.time()
    spark.sparkContext.setJobGroup(f"battery_r{rep}", "battery")
    s = res.summary()
    t1 = time.time()
    spark.sparkContext.setJobGroup(f"stats_r{rep}", "stats")
    stats_df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    res.violations.unpersist()
    timings.append(
        {"rep": rep, "battery": round(t1 - t0, 2), "stats": round(t2 - t1, 2),
         "total": round(t2 - t0, 2)}
    )
    print(f"rep {rep}: {timings[-1]}  tput={n_turns/(t2-t0):,.0f} turns/s",
          file=sys.stderr, flush=True)

spark.stop()

# ---- parse event log (v2 dir, zstd-compressed events file) ----
import pyarrow as pa  # noqa: E402

stages, jobs = {}, {}


def _iter_lines():
    for path in glob.glob(f"{LOGDIR}/**/events_*", recursive=True) + glob.glob(
        f"{LOGDIR}/app-*"
    ):
        if path.endswith(".zstd"):
            with pa.CompressedInputStream(pa.OSFile(path), "zstd") as f:
                yield from f.read().decode().splitlines()
        else:
            with open(path) as f:
                yield from f


for line in _iter_lines():
    try:
        ev = json.loads(line)
    except json.JSONDecodeError:
        continue
    et = ev.get("Event")
    if et == "SparkListenerJobStart":
        grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
        jobs[ev["Job ID"]] = (grp, ev.get("Stage IDs", []))
    elif et == "SparkListenerTaskEnd":
        sid = ev["Stage ID"]
        m = ev.get("Task Metrics") or {}
        s = stages.setdefault(
            sid,
            dict(n=0, run=0, mx=0, gc=0, cpu=0, shr=0.0, shw=0.0, spill=0.0, inp=0.0),
        )
        rt = m.get("Executor Run Time", 0)
        s["n"] += 1
        s["run"] += rt
        s["mx"] = max(s["mx"], rt)
        s["gc"] += m.get("JVM GC Time", 0)
        s["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
        sr = m.get("Shuffle Read Metrics") or {}
        s["shr"] += (sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)) / 1e6
        s["shw"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0) / 1e6
        s["spill"] += m.get("Disk Bytes Spilled", 0) / 1e6
        s["inp"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0) / 1e6
    elif et == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        st = stages.setdefault(si["Stage ID"], {})
        st["name"] = si["Stage Name"].split("\n")[0][:40]
        st["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3

s2g = {sid: g for _, (g, sids) in jobs.items() for sid in sids}
print(f"\n== cpus={CPUS} n_turns={n_turns:,} plan_build={plan_sec:.2f}s ==")
for t in timings:
    print(t)
print(
    f"{'st':>3} {'group':<12} {'n':>4} {'wall':>7} {'sumrun':>8} {'max':>6} "
    f"{'cpu':>7} {'gc':>6} {'inMB':>6} {'shR':>5} {'shW':>5} {'spill':>5} name"
)
for sid in sorted(stages):
    s = stages[sid]
    if not s.get("n"):
        continue
    print(
        f"{sid:>3} {s2g.get(sid, '?')[:12]:<12} {s['n']:>4} {s.get('wall', 0):>7.1f} "
        f"{s['run'] / 1e3:>8.1f} {s['mx'] / 1e3:>6.1f} {s['cpu'] / 1e3:>7.1f} "
        f"{s['gc'] / 1e3:>6.1f} {s['inp']:>6.0f} {s['shr']:>5.0f} {s['shw']:>5.0f} "
        f"{s['spill']:>5.0f} {s.get('name', '?')}"
    )
