"""Synthesize a draft constraint suite from a blessed corpus:

    spark-submit --py-files taco_toolbox_spark.zip jobs/suggest.py \
        --input /data/blessed_corpus --output suite.json

The profiler-to-expectations workflow (taco_toolbox_spark.suite.
suggest_suite): the draft encodes the rules the corpus ALREADY satisfies
— observed vocabularies, tight observed ranges, null-free columns,
key uniqueness, order contiguity, timestamp monotonicity with the
observed max adjacent gap, functional dependencies, sequence grammars,
max-calibrated run-length bounds (plus a trailing-rate bound when
--rate-seconds names the window), and the partition-health members with
tol/k calibrated so the source corpus itself passes. A human reviews
and widens before committing the file next to the data;
`jobs/validate.py --suite suite.json` then runs it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="blessed corpus parquet dir")
    p.add_argument("--output", required=True, help="suite JSON path to write")
    p.add_argument("--partition-col", default="part")
    p.add_argument("--group-col", default="conv_id")
    p.add_argument("--order-col", default="turn_idx")
    p.add_argument(
        "--vocab-max",
        type=int,
        default=20,
        help="max distinct values for a synthesized vocab rule",
    )
    p.add_argument(
        "--no-health",
        action="store_true",
        help="skip the calibrated volume/cardinality entries",
    )
    p.add_argument(
        "--embed-history",
        action="store_true",
        help="inline per-partition calibration data (volume/cardinality "
        "history, completeness baseline_frac) so the health trio can "
        "stream and batch runs judge against the blessed band",
    )
    p.add_argument(
        "--rate-seconds",
        type=int,
        metavar="W",
        help="also mine a trailing-rate bound over this window width "
        "(max_events = the highest observed trailing count; a mined "
        "window width would be speculative, so the caller names it)",
    )
    args = p.parse_args(argv)
    if args.vocab_max < 1:
        raise SystemExit(f"--vocab-max must be >= 1, got {args.vocab_max}")

    from taco_toolbox_spark.engine import EngineConfig
    from taco_toolbox_spark.session import get_spark
    from taco_toolbox_spark.suite import suggest_suite

    spark = get_spark("suggest")
    df = spark.read.parquet(args.input)
    cfg = EngineConfig(
        partition_col=args.partition_col,
        group_col=args.group_col,
        order_col=args.order_col,
        key_cols=(args.group_col, args.order_col),
    )
    try:
        spec = suggest_suite(
            df,
            cfg,
            vocab_max=args.vocab_max,
            health=not args.no_health,
            rate_seconds=args.rate_seconds,
            embed_history=args.embed_history,
        )
    except ValueError as e:
        raise SystemExit(str(e))
    with open(args.output, "w") as f:
        json.dump(spec, f, indent=2, sort_keys=False)
        f.write("\n")
    kinds: dict[str, int] = {}
    for c in spec["checks"]:
        kinds[c["type"]] = kinds.get(c["type"], 0) + 1
    print(
        f"wrote {args.output}: {len(spec['checks'])} checks "
        + json.dumps(kinds, sort_keys=True)
    )
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
