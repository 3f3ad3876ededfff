"""spark-submit entry point for rewrite certification.

    spark-submit --py-files taco_toolbox_spark.zip jobs/certify.py \
        --before /data/transcripts_v1 \
        --after  /data/transcripts_v2 \
        --content-cols conv_id,turn_idx,role,text \
        [--group-cols part] [--hash xxhash64|md5] [--seed 0] \
        [--output /runs/certify/2026-08-19]

The operational half of operators/digest.py: after a consolidation,
re-shard, engine migration, or resume-after-crash rewrite, prove the new
corpus holds the SAME content multiset as the blessed one — one pass over
each side, a digest-cardinality reconcile join, zero row comparison.

With --before-manifest MANIFEST.json (a validation run's manifest written
under --record-digests) the blessed side isn't scanned AT ALL: the
rewrite is certified against the per-partition digests stored in the
manifest, whose recorded content columns / hash family / seed are
authoritative.

Writes (when --output is given, both through the JVM Hadoop filesystem so
hdfs:///s3a:// outputs work like local ones):
    <output>/mismatches/   per-group digest diffs (empty = certified)
    <output>/witnesses/    with --drilldown on mismatch: the exact rows
                           present on only one side (flagged groups only)
    <output>/summary.json  {status, n_mismatches, params}

Exit code 0 = certified equal, 1 = mismatches found (the CI-gate shape:
a promotion pipeline chains `... && promote`). Reference analog: the
validator's row-count/schema consistency gates
(tortilla/datamodel.py:212-254) strengthened to content equality.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_text(spark, path: str, text: str) -> None:
    """Write a small text file through the JVM Hadoop FileSystem, so a
    non-local --output (hdfs://, s3a://) gets the summary next to the
    parquet instead of on the driver's local disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    side = p.add_mutually_exclusive_group(required=True)
    side.add_argument("--before", help="blessed corpus path")
    side.add_argument(
        "--before-manifest",
        help="manifest.json from a validation run that used "
        "--record-digests: certify against the STORED per-partition "
        "digests without rescanning the blessed corpus (content columns, "
        "hash family, and seed come from the manifest; grain is the "
        "partition column)",
    )
    p.add_argument("--after", required=True, help="rewritten corpus path")
    p.add_argument(
        "--content-cols",
        default=None,
        help="comma-separated columns whose multiset must be preserved "
        "(required with --before; with --before-manifest the manifest's "
        "recorded columns are authoritative and this must match or be "
        "omitted)",
    )
    p.add_argument(
        "--group-cols",
        default=None,
        help="comma-separated digest grain (default: one global digest); "
        "group at the partition grain to localize WHERE a rewrite broke",
    )
    p.add_argument("--hash", choices=["xxhash64", "md5"], default="xxhash64")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--output",
        default=None,
        help="where to write mismatches/ + summary.json (omit to only "
        "print and set the exit code)",
    )
    p.add_argument(
        "--max-show",
        type=int,
        default=20,
        help="mismatched groups to print (the frame itself is complete)",
    )
    p.add_argument(
        "--drilldown",
        action="store_true",
        help="on mismatch, also write <output>/witnesses/ — the exact "
        "rows (with multiplicity) present on only one side, restricted "
        "to the flagged groups; requires --output and --group-cols",
    )
    args = p.parse_args(argv)
    content_cols = (
        [c for c in args.content_cols.split(",") if c]
        if args.content_cols
        else None
    )
    group_cols = (
        [c for c in args.group_cols.split(",") if c]
        if args.group_cols
        else None
    )
    hash_fn, seed = args.hash, args.seed
    manifest = None
    if args.before_manifest:
        if args.drilldown:
            raise SystemExit(
                "--drilldown needs the blessed ROWS to diff against; "
                "manifest mode holds only digests — pass --before"
            )
        if not os.path.exists(args.before_manifest):
            raise SystemExit(f"no manifest at {args.before_manifest}")
        from taco_toolbox_spark.checkpoint import CheckpointManifest

        manifest = CheckpointManifest.load(args.before_manifest)
        params = manifest.doc.get("digest_params") or {}
        if not params:
            raise SystemExit(
                f"{args.before_manifest} holds no digest state; re-run "
                "validation with --record-digests (or pass --before)"
            )
        if content_cols and content_cols != params["content_cols"]:
            raise SystemExit(
                f"--content-cols {content_cols} conflicts with the "
                f"manifest's recorded {params['content_cols']}"
            )
        content_cols = params["content_cols"]
        hash_fn, seed = params["hash_fn"], params["seed"]
        group_cols = ["part"]
    elif not content_cols:
        raise SystemExit("--content-cols is required with --before")
    if args.drilldown and not (args.output and group_cols):
        raise SystemExit("--drilldown requires --output and --group-cols")

    from taco_toolbox_spark.operators.digest import certify_rewrite
    from taco_toolbox_spark.session import get_spark

    spark = get_spark("certify")
    try:
        after = spark.read.parquet(args.after)
        sides = [("--after", after)]
        if manifest is None:
            before = spark.read.parquet(args.before)
            sides.append(("--before", before))
        for label, df in sides:
            missing = [
                c
                for c in content_cols + (group_cols or [])
                if c not in df.columns
            ]
            if missing:
                raise SystemExit(f"{label} is missing columns {missing}")

        if manifest is not None:
            from pyspark.sql import functions as F

            from taco_toolbox_spark.checkpoint import (
                digest_frame_from_manifest,
            )
            from taco_toolbox_spark.operators.digest import (
                content_digest,
                digest_mismatches,
            )

            stored = digest_frame_from_manifest(spark, manifest)
            fresh = content_digest(
                after.withColumn("part", F.col("part").cast("string")),
                content_cols,
                ["part"],
                hash_fn=hash_fn,
                seed=seed,
            )
            mm = digest_mismatches(stored, fresh, ["part"])
        else:
            mm = certify_rewrite(
                before,
                after,
                content_cols,
                group_cols,
                hash_fn=hash_fn,
                seed=seed,
            )
        # the mismatch frame is digest-cardinality-sized but COMPUTING it
        # scans both corpora — persist so the count and the write don't
        # each pay the two full passes
        mm = mm.persist()
        try:
            n = mm.count()
            if n:
                mm.show(args.max_show, truncate=False)
            status = "certified" if n == 0 else "mismatch"
            print(
                f"{status}: {n} differing group(s) across "
                f"{len(content_cols)} content column(s)"
                + (f" at grain {group_cols}" if group_cols else " (global)")
            )
            if args.output:
                mm.write.mode("overwrite").parquet(
                    os.path.join(args.output, "mismatches")
                )
                if args.drilldown and n:
                    from taco_toolbox_spark.operators.digest import (
                        digest_drilldown,
                    )

                    digest_drilldown(
                        before, after, content_cols, group_cols, mm
                    ).write.mode("overwrite").parquet(
                        os.path.join(args.output, "witnesses")
                    )
                _write_text(
                    spark,
                    os.path.join(args.output, "summary.json"),
                    json.dumps(
                        {
                            "status": status,
                            "n_mismatches": n,
                            "before": args.before or args.before_manifest,
                            "before_is_manifest": manifest is not None,
                            "after": args.after,
                            "content_cols": content_cols,
                            "group_cols": group_cols,
                            "hash": hash_fn,
                            "seed": seed,
                        },
                        indent=2,
                    ),
                )
        finally:
            mm.unpersist()
        return 0 if n == 0 else 1
    finally:
        if stop_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
