"""spark-submit entry point for STREAMING validation — the live twin of
jobs/validate.py:

    spark-submit --py-files taco_toolbox_spark.zip jobs/stream_validate.py \
        --input  /data/transcripts \
        --output /runs/stream-2026-08-20 \
        [--suite suite.json] [--no-battery] \
        [--window "1 day"] [--watermark "2 days"] \
        [--max-files-per-trigger 8]

Drains everything currently in --input through availableNow micro-batches
and stops; a LATER invocation with the same --output resumes every sink
from its streaming checkpoint — new files only, exactly-once, with the
stateful battery's per-conversation state surviving the restart (the
batch CLI's manifest-resume analog, run_durable_battery's contract). A
long-running deployment simply drops the availableNow semantics by
tailing the same invocation (the sinks and checkpoints are identical).

What runs:
  * the stateful per-conversation battery (monotone / uniqueness /
    contiguity) -> <output>/battery/          [unless --no-battery]
  * with --suite: every entry the suite->stream bridge can realize
    (cat/cond/corr/quantile drift vs the document's inline baselines;
    rate / runlength / periodic stateful emitters) -> <output>/<check_id>/
    Entries without a streaming realization are listed on stdout and in
    <output>/stream_manifest.json — LOUDLY, so an operator sees exactly
    which rules still need the batch run; this CLI complements
    jobs/validate.py, it does not replace it. A suite `sequence` grammar
    and a `gap` bound on --ts-col are WIRED INTO the battery (mined
    grammar replaces the built-in role constants; the gap bound rides
    the monotone state) and recorded under manifest `battery_wired`;
    the sequence closing-value rule stays batch-only (an unbounded
    stream never proves a sequence over). Suite `transition_drift`
    entries run as a TWO-STAGE drain: the stateful pair emitter lands
    (from, to, completing-row ts) rows in <output>/_pairs/<id>, then a
    second exactly-once query scores those through the conditional-TV
    machinery against the entry's baseline with <end> rows stripped —
    the streamed statistic is P(to | from) over observed transitions,
    the emitter's documented boundary honesty.

Windowed drift sinks are parquet+append: a window's row lands once the
watermark closes it, so on a drained historical corpus the final
still-open window(s) stay pending until more data arrives — the honest
streaming semantics, stated here rather than papered over.

<output>/stream_manifest.json records per-sink CUMULATIVE row counts
(the sink's full content as of this invocation — on a resumed run that
includes prior drains) plus the skipped list (written through the JVM Hadoop
FileSystem, so it lands next to the sinks on any scheme).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sink(df, out_dir: str, ck_dir: str, mode: str):
    """Start one exactly-once parquet sink with availableNow drain."""
    return (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(description="streaming validation driver")
    p.add_argument("--input", required=True, help="transcript parquet dir")
    p.add_argument("--output", required=True, help="sinks + checkpoints root")
    p.add_argument("--suite", help="constraint-suite JSON (bridge members)")
    p.add_argument(
        "--no-battery",
        action="store_true",
        help="skip the stateful per-conversation battery sink",
    )
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--window", default="1 day")
    p.add_argument("--watermark", default="2 days")
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    args = p.parse_args(argv)
    if args.max_files_per_trigger < 1:
        raise SystemExit(
            f"--max-files-per-trigger must be >= 1, "
            f"got {args.max_files_per_trigger}"
        )
    if args.no_battery and not args.suite:
        raise SystemExit(
            "--no-battery without --suite leaves nothing to run"
        )
    spec = None
    if args.suite:
        try:
            with open(args.suite) as f:
                spec = json.load(f)
        except (OSError, ValueError) as e:
            raise SystemExit(f"--suite {args.suite!r}: {e}") from None

    from taco_toolbox_spark.checkpoint import write_text_hadoop
    from taco_toolbox_spark.session import get_spark
    from taco_toolbox_spark.streaming.validate_stream import (
        stream_checks_from_suite,
        transcript_violations_stateful,
    )

    spark = get_spark("stream_validate")
    try:
        static = spark.read.parquet(args.input)
        skipped: list[str] = []
        queries = []

        def stream():
            return (
                spark.readStream.schema(static.schema)
                .option("maxFilesPerTrigger", args.max_files_per_trigger)
                .parquet(args.input)
            )

        ck_root = os.path.join(args.output, "_checkpoints")
        eng = (spec or {}).get("engine", {}) or {}
        # a suite's sequence grammar and ts gap bound ride the battery's
        # existing state for free: the mined grammar replaces the
        # built-in role constants, the gap bound reuses the monotone
        # pass's (last_turn, last_ts). The sequence `last` (closing-
        # value) rule stays batch-only — an unbounded stream never
        # proves a sequence over. Battery sink rows keep the battery's
        # own check ids (role_transitions / ts_gap); battery_wired in
        # the manifest records which suite entries they enforce.
        battery_kwargs: dict = {}
        battery_wired: list[str] = []
        if spec is not None and not args.no_battery:
            g_col = eng.get("group_col", "conv_id")
            o_col = eng.get("order_col", "turn_idx")
            for entry in spec.get("checks", []):
                # entries the always-on battery already enforces are
                # CLASSIFIED as wired, not skipped: ts monotonicity on
                # --ts-col, (group, order) uniqueness, order contiguity
                if (
                    entry.get("type") == "monotone"
                    and entry.get("col") == args.ts_col
                ) or (
                    entry.get("type") == "uniqueness"
                    and set(entry.get("keys", [])) == {g_col, o_col}
                ) or (
                    entry.get("type") == "contiguity"
                    and entry.get("col") == o_col
                ):
                    battery_wired.append(entry["id"])
                elif (
                    entry.get("type") == "sequence"
                    and "role_col" not in battery_kwargs
                ):
                    battery_kwargs.update(
                        role_col=entry["col"],
                        allowed_pairs={
                            tuple(p) for p in entry.get("allowed", [])
                        },
                        first_values=set(entry.get("first", [])),
                    )
                    battery_wired.append(entry["id"])
                elif (
                    entry.get("type") == "gap"
                    and entry.get("max_step") is not None
                    and entry.get("min_step") is None
                    and entry.get("col") == args.ts_col
                    and "max_gap_s" not in battery_kwargs
                ):
                    battery_kwargs["max_gap_s"] = float(entry["max_step"])
                    battery_wired.append(entry["id"])
        if not args.no_battery:
            out = transcript_violations_stateful(
                stream(),
                group_col=eng.get("group_col", "conv_id"),
                order_col=eng.get("order_col", "turn_idx"),
                ts_col=args.ts_col,
                output_mode="append",
                **battery_kwargs,
            )
            queries.append(
                ("battery", _sink(
                    out,
                    os.path.join(args.output, "battery"),
                    os.path.join(ck_root, "battery"),
                    "append",
                ))
            )
        if spec is not None:
            from taco_toolbox_spark.suite import SuiteError

            try:
                built, skipped = stream_checks_from_suite(
                    stream(),
                    spec,
                    ts_col=args.ts_col,
                    window=args.window,
                    watermark=args.watermark,
                    emitter_output_mode="append",
                )
            except (SuiteError, ValueError) as e:
                raise SystemExit(f"--suite {args.suite!r}: {e}") from None
            for cid in built:
                # validate every id BEFORE any suite sink starts, so a
                # bad one cannot strand half-started queries
                if cid == "battery" or not all(
                    c.isalnum() or c in "._-" for c in cid
                ):
                    raise SystemExit(
                        f"--suite {args.suite!r}: check id {cid!r} cannot "
                        "name a sink directory (reserved word or non-"
                        "[alnum._-] characters)"
                    )
            for cid, df in sorted(built.items()):
                queries.append(
                    (cid, _sink(
                        df,
                        os.path.join(args.output, cid),
                        os.path.join(ck_root, cid),
                        "append",
                    ))
                )
        for _, q in queries:
            q.awaitTermination()

        # ---- stage 2: transition TV over the drained pair streams -----
        # A transition entry needs a lag over each sequence, which no
        # single watermarked aggregation can express — but the stateful
        # pair EMITTER can, so the CLI realizes transition TV in two
        # exactly-once stages: stage 1 (above, queued below as _pairs
        # sinks) drains LIVE (from_state, to_state, completing-row ts)
        # rows; stage 2 streams THOSE through the conditional-TV
        # machinery (cond = from_state, cat = to_state) against the
        # entry's baseline matrix with the <end> rows stripped — an
        # unbounded stream never proves a sequence over, so the streamed
        # statistic is P(to | from) over OBSERVED transitions (the same
        # honesty contract as the emitter and the grammar's `last`).
        stage2 = []
        if spec is not None:
            from taco_toolbox_spark.checks.drift import END_TOKEN
            from taco_toolbox_spark.streaming.validate_stream import (
                stream_conditional_tv,
                stream_transition_pairs,
            )

            eng_g = eng.get("group_col", "conv_id")
            eng_o = eng.get("order_col", "turn_idx")
            trans = [
                e for e in spec.get("checks", [])
                if e.get("type") == "transition_drift"
                and e.get("baseline_counts")
                and all(
                    ch.isalnum() or ch in "._-" for ch in e.get("id", "")
                )
            ]
            pair_qs = []
            for e in trans:
                cid = e["id"]
                pairs = stream_transition_pairs(
                    stream(),
                    seq_col=e.get("seq") or eng_g,
                    order_col=list(e.get("order") or (eng_o,)),
                    state_col=e["state"],
                    output_mode="append",
                    ts_col=args.ts_col,
                )
                pair_qs.append((cid, _sink(
                    pairs,
                    os.path.join(args.output, "_pairs", cid),
                    os.path.join(ck_root, f"_pairs_{cid}"),
                    "append",
                )))
            for _, q in pair_qs:
                q.awaitTermination()
            for e in trans:
                cid = e["id"]
                base = {
                    k: {c: int(n) for c, n in inner.items()
                        if c != END_TOKEN}
                    for k, inner in e["baseline_counts"].items()
                    if k != END_TOKEN
                }
                base = {k: v for k, v in base.items() if v}
                seq_name = e.get("seq") or eng_g
                pair_schema = (
                    f"{seq_name} string, from_state string, "
                    f"to_state string, {args.ts_col} timestamp"
                )
                pair_stream = (
                    spark.readStream.schema(pair_schema)
                    .option(
                        "maxFilesPerTrigger", args.max_files_per_trigger
                    )
                    .parquet(os.path.join(args.output, "_pairs", cid))
                )
                tv = stream_conditional_tv(
                    pair_stream,
                    "from_state",
                    "to_state",
                    base,
                    ts_col=args.ts_col,
                    window=args.window,
                    watermark=args.watermark,
                    threshold=float(e.get("threshold", 0.25)),
                    check_id=cid,
                )
                stage2.append((cid, _sink(
                    tv,
                    os.path.join(args.output, cid),
                    os.path.join(ck_root, cid),
                    "append",
                )))
            for _, q in stage2:
                q.awaitTermination()
            queries += stage2

        from pyspark.errors import AnalysisException

        counts = {}
        for cid, _ in queries:
            path = os.path.join(args.output, cid)
            try:
                counts[cid] = spark.read.parquet(path).count()
            except AnalysisException:
                counts[cid] = 0  # sink exists but no window closed yet
        staged2 = {cid for cid, _ in stage2}
        skipped = [
            e
            for e in skipped
            if e.split(" ")[0] not in set(battery_wired) | staged2
        ]
        for s in skipped:
            print(f"skipped (no streaming realization here): {s}")
        manifest = {
            "input": args.input,
            "sinks": counts,
            "skipped": skipped,
            "battery_wired": battery_wired,
            "window": args.window,
            "watermark": args.watermark,
        }
        write_text_hadoop(
            spark,
            os.path.join(args.output, "stream_manifest.json"),
            json.dumps(manifest, indent=2, sort_keys=True) + "\n",
        )
        print(
            "stream validation drained: "
            + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        )
        return 0
    finally:
        if stop_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
