"""Profile the validation bench's timed section with Spark event logs.

Usage: python tools/profile_scaling.py <cpus> [n_convs]
Prints wall time per action plus, from the event log, per-stage
(task count, sum task time, max task time, GC, shuffle, spill) so the
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
LOGDIR = f"/tmp/sparklogs_{CPUS}_{int(time.time())}"
os.makedirs(LOGDIR, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

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
df = attach_bucketed(
    spark, f"transcripts_{tag}", f"{corpus_dir}/bucketed_transcripts",
    schema_ddl, ["conv_id"], 64, ["conv_id", "turn_idx"],
)
ref = attach_bucketed(
    spark, f"transcripts_baseline_{tag}", f"{corpus_dir}/bucketed_transcripts_baseline",
    schema_ddl, ["conv_id"], 64, ["conv_id", "turn_idx"],
)
n_turns = df.count()
baseline_q = approx_global_quantiles(ref, "length(text)", (0.1, 0.25, 0.5, 0.75, 0.9))
checks = transcript_checks(reference=ref, drift_baseline=baseline_q)

t0 = time.time()
res = run_validation(df, checks, EngineConfig(persist_violations=True))
stats_df = column_stats(df)
plan_sec = time.time() - t0

timings = []
for rep in range(2):
    res.violations.persist()
    t0 = time.time()
    spark.sparkContext.setJobGroup(f"violations_r{rep}", "violations")
    n_viol = res.violations.count()
    t1 = time.time()
    spark.sparkContext.setJobGroup(f"verdicts_r{rep}", "verdicts")
    verd = res.verdicts.agg(F.sum(F.when(~F.col("passed"), 1).otherwise(0))).first()[0]
    t2 = time.time()
    spark.sparkContext.setJobGroup(f"stats_r{rep}", "stats")
    stats_df.write.format("noop").mode("overwrite").save()
    t3 = time.time()
    res.violations.unpersist()
    timings.append(
        {
            "rep": rep,
            "violations": round(t1 - t0, 2),
            "verdicts": round(t2 - t1, 2),
            "stats": round(t3 - t2, 2),
            "total": round(t3 - t0, 2),
        }
    )
    print(f"rep {rep}: {timings[-1]}  tput={n_turns/(t3-t0):,.0f} turns/s",
          file=sys.stderr, flush=True)

spark.stop()

# ---- parse event log ----
stages = {}  # stage_id -> metrics
jobs = {}  # job_id -> (group, stage_ids)
for path in glob.glob(f"{LOGDIR}/*"):
    with open(path) as f:
        for line in f:
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
                    {
                        "n": 0, "run_ms": 0, "max_ms": 0, "gc_ms": 0,
                        "cpu_ms": 0, "shuf_read_mb": 0.0, "shuf_write_mb": 0.0,
                        "spill_mb": 0.0, "input_mb": 0.0, "deser_ms": 0,
                        "ser_ms": 0, "py_ms": 0,
                    },
                )
                rt = m.get("Executor Run Time", 0)
                s["n"] += 1
                s["run_ms"] += rt
                s["max_ms"] = max(s["max_ms"], rt)
                s["gc_ms"] += m.get("JVM GC Time", 0)
                s["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                s["deser_ms"] += m.get("Executor Deserialize Time", 0)
                s["ser_ms"] += m.get("Result Serialization Time", 0)
                s["shuf_read_mb"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) / 1e6 + (m.get("Shuffle Read Metrics") or {}).get(
                    "Local Bytes Read", 0
                ) / 1e6
                s["shuf_write_mb"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                ) / 1e6
                s["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
                s["input_mb"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                ) / 1e6
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update(
                    name=si["Stage Name"].split("\n")[0][:60],
                    wall_ms=(si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                )

stage_to_group = {}
for jid, (grp, sids) in jobs.items():
    for sid in sids:
        stage_to_group[sid] = grp

print(f"\n== cpus={CPUS} n_turns={n_turns:,} plan_build={plan_sec:.2f}s ==")
for t in timings:
    print(t)
print(
    f"\n{'stage':>5} {'group':<16} {'n':>4} {'wall_s':>7} {'sum_run_s':>9} "
    f"{'max_s':>6} {'cpu_s':>7} {'gc_s':>5} {'in_mb':>7} {'sh_r':>6} "
    f"{'sh_w':>6} {'spill':>6}  name"
)
for sid in sorted(stages):
    s = stages[sid]
    if "n" not in s:
        continue
    print(
        f"{sid:>5} {stage_to_group.get(sid, '?')[:16]:<16} {s['n']:>4} "
        f"{s.get('wall_ms', 0)/1e3:>7.2f} {s['run_ms']/1e3:>9.2f} "
        f"{s['max_ms']/1e3:>6.2f} {s['cpu_ms']/1e3:>7.2f} "
        f"{s['gc_ms']/1e3:>5.1f} {s['input_mb']:>7.0f} "
        f"{s['shuf_read_mb']:>6.0f} {s['shuf_write_mb']:>6.0f} "
        f"{s['spill_mb']:>6.0f}  {s.get('name','?')}"
    )
