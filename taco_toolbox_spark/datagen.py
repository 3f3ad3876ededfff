"""Deterministic synthetic transcript corpus with seeded violation injection.

Analog of the reference's golden-fixture generator
(/root/reference/tests/fixtures/regenerate.py, np.random.seed(42)): we know
exactly which rows were corrupted, so tests can assert the engine's
violation-row set and per-partition pass/fail matrix.

Unlike the reference (driver-side numpy), generation here is a pure Spark
plan: every value is a deterministic column expression over ``xxhash64(seed,
...)`` of the row coordinates — no Python RNG, no per-row Python, no
collect. The same code path generates 10^4 rows for pytest or 10^12 rows on
a 1000-executor cluster (spark.range parallelizes; sequence+explode fans
out turns; nothing is driver-resident).

Violations (each kind tagged in the manifest, overall rate ~= 8/denominator):
  dup_turn      extra exact-copy row → uniqueness of (conv_id, turn_idx)
  gap_turn      turn_idx shifted +1000 → contiguity / ordering
  bad_role      role -> 'narrator' → role vocabulary
  bad_tool      tool -> 'hammer' (on tool turns) → tool vocabulary
  tool_on_chat  tool set on a non-tool turn → role/tool referential rule
  null_text     text -> NULL → non-null constraint
  mutated_text  text suffixed → per-turn text equality vs clean reference
  ts_regress    ts - 1h → per-conversation monotone ts
  bad_conv      conv_id malformed (conv-level) → id-format check
  drift         one designated partition gets longer texts → drift check
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import TOOL_VOCAB

#: word vocabulary for synthetic text payloads
VOCAB = (
    "data query spark table join filter agg window merge batch row column "
    "scan hash sort stream value key part index"
).split()

EPOCH_START = 1735689600  # 2025-01-01T00:00:00Z
DAYS_SPAN = 90
DRIFT_DATE = "2025-01-15"

ROW_KINDS = (
    "dup_turn",
    "gap_turn",
    "bad_role",
    "bad_tool",
    "tool_on_chat",
    "null_text",
    "mutated_text",
    "ts_regress",
)


@dataclass
class TranscriptCorpus:
    """clean = reference copy; corrupted = engine input; manifest = truth."""

    clean: DataFrame
    corrupted: DataFrame
    manifest: DataFrame  # (part, conv_id, turn_idx, kind)
    drifted_parts: list[str] = field(default_factory=list)


def _hx(seed: int, tag: str, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _word(seed: int, tag: str, *cols) -> F.Column:
    idx = (F.pmod(_hx(seed, tag, *cols), F.lit(len(VOCAB))) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(w) for w in VOCAB]), idx)


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    violation_denom: int = 1000,
    hot_conv_every: int = 200,
    hot_len: int = 400,
    inject_drift: bool = True,
) -> TranscriptCorpus:
    """Build the corpus. ``violation_denom`` sets per-kind rate 1/denom
    (8 kinds → ~0.8% total at denom=1000; use denom=8000 for the 0.1%
    BASELINE rate). ``hot_conv_every`` injects heavy-tail conversations
    (hot_len turns) to exercise skew/salting."""

    # ---- conversation level -------------------------------------------
    convs = spark.range(n_convs).withColumnRenamed("id", "cid")
    h_conv = _hx(seed, "conv", F.col("cid"))
    conv_id_clean = F.concat(
        F.lit("conv_"), F.substring(F.lower(F.lpad(F.hex(h_conv), 16, "0")), 1, 8)
    )
    start_sec = F.lit(EPOCH_START) + F.pmod(
        _hx(seed, "start", F.col("cid")), F.lit(DAYS_SPAN * 86400)
    )
    n_turns = (F.lit(3) + F.pmod(_hx(seed, "len", F.col("cid")), F.lit(10))).cast("int")
    if hot_conv_every:
        n_turns = F.when(
            F.pmod(F.col("cid"), F.lit(hot_conv_every)) == 0, F.lit(hot_len)
        ).otherwise(n_turns)
    bad_conv = F.pmod(_hx(seed, "viol_conv", F.col("cid")), F.lit(violation_denom)) == 0
    conv_id = F.when(
        bad_conv, F.concat(F.lit("CONV!"), F.col("cid").cast("string"))
    ).otherwise(conv_id_clean)

    convs = convs.select(
        F.col("cid"),
        conv_id.alias("conv_id"),
        conv_id_clean.alias("conv_id_clean"),
        bad_conv.alias("f_bad_conv"),
        start_sec.alias("start_sec"),
        n_turns.alias("n_turns"),
        F.date_format(F.timestamp_seconds(start_sec), "yyyy-MM-dd").alias("part"),
    )

    # ---- turn level ----------------------------------------------------
    turns = convs.select(
        "*", F.explode(F.expr("sequence(0, n_turns - 1)")).alias("turn_idx")
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    th = _hx(seed, "turn", F.col("cid"), F.col("turn_idx"))
    role_clean = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(th, 10) <= 3, F.lit("user"))
        .when(F.pmod(th, 10) <= 7, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    tool_clean = F.when(
        role_clean == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOL_VOCAB]),
            (F.pmod(_hx(seed, "tool", F.col("cid"), F.col("turn_idx")), 4) + 1).cast(
                "int"
            ),
        ),
    )
    n_words = 6
    words = [
        _word(seed, f"w{i}", F.col("cid"), F.col("turn_idx")) for i in range(n_words)
    ]
    drift_words = words + [
        _word(seed, f"dw{i}", F.col("cid"), F.col("turn_idx")) for i in range(n_words)
    ]
    base_text = F.concat_ws(" ", *words)
    if inject_drift:
        text_clean = F.when(
            F.col("part") == DRIFT_DATE, F.concat_ws(" ", *drift_words)
        ).otherwise(base_text)
    else:
        text_clean = base_text
    ts_sec_clean = (
        F.col("start_sec") + F.col("turn_idx") * 37 + F.pmod(th, 23)
    )

    def flag(kind: str) -> F.Column:
        return (
            F.pmod(
                _hx(seed, "viol_" + kind, F.col("cid"), F.col("turn_idx")),
                F.lit(violation_denom),
            )
            == 0
        )

    flags = {k: flag(k) for k in ROW_KINDS}
    # bad_tool only meaningful on tool turns; tool_on_chat only off them
    flags["bad_tool"] = flags["bad_tool"] & (role_clean == "tool")
    flags["tool_on_chat"] = flags["tool_on_chat"] & (role_clean != "tool")
    # ts regression needs a predecessor to regress against
    flags["ts_regress"] = flags["ts_regress"] & (F.col("turn_idx") > 0)
    # gap: shifting the last turn leaves max()+1000 but also keeps count
    flags["gap_turn"] = flags["gap_turn"] & (F.col("turn_idx") > 0)

    base = turns.select(
        "cid",
        "conv_id",
        "conv_id_clean",
        "part",
        "f_bad_conv",
        F.col("turn_idx").alias("turn_idx_clean"),
        role_clean.alias("role_clean"),
        text_clean.alias("text_clean"),
        tool_clean.alias("tool_clean"),
        F.timestamp_seconds(ts_sec_clean).alias("ts_clean"),
        *[flags[k].alias(f"f_{k}") for k in ROW_KINDS],
    )

    # ---- corrupted view --------------------------------------------------
    turn_idx_c = F.when(
        F.col("f_gap_turn"), F.col("turn_idx_clean") + 1000
    ).otherwise(F.col("turn_idx_clean"))
    role_c = F.when(F.col("f_bad_role"), F.lit("narrator")).otherwise(
        F.col("role_clean")
    )
    tool_c = (
        F.when(F.col("f_bad_tool"), F.lit("hammer"))
        .when(F.col("f_tool_on_chat"), F.lit("search"))
        .otherwise(F.col("tool_clean"))
    )
    text_c = F.when(F.col("f_null_text"), F.lit(None).cast("string")).otherwise(
        F.when(
            F.col("f_mutated_text"), F.concat(F.col("text_clean"), F.lit(" [CORRUPT]"))
        ).otherwise(F.col("text_clean"))
    )
    ts_c = F.when(
        F.col("f_ts_regress"), F.col("ts_clean") - F.expr("INTERVAL 1 HOUR")
    ).otherwise(F.col("ts_clean"))

    corrupted_cols = [
        F.col("conv_id"),
        turn_idx_c.cast("int").alias("turn_idx"),
        role_c.alias("role"),
        text_c.alias("text"),
        tool_c.alias("tool"),
        ts_c.alias("ts"),
        F.col("part"),
    ]
    corrupted_base = base.select(*corrupted_cols)
    dup_rows = base.filter(F.col("f_dup_turn")).select(*corrupted_cols)
    corrupted = corrupted_base.unionAll(dup_rows)

    clean = base.select(
        F.col("conv_id_clean").alias("conv_id"),
        F.col("turn_idx_clean").alias("turn_idx"),
        F.col("role_clean").alias("role"),
        F.col("text_clean").alias("text"),
        F.col("tool_clean").alias("tool"),
        F.col("ts_clean").alias("ts"),
        F.col("part"),
    )

    # ---- manifest (observed coordinates of each injected violation) -----
    manifests = []
    # manifests record OBSERVED coordinates (what the engine reports): a row
    # hit by gap_turn carries the shifted turn_idx for every kind tagged on it
    observed_idx = F.when(
        F.col("f_gap_turn"), F.col("turn_idx_clean") + 1000
    ).otherwise(F.col("turn_idx_clean"))
    for kind in ROW_KINDS:
        manifests.append(
            base.filter(F.col(f"f_{kind}")).select(
                F.col("part"),
                F.col("conv_id"),
                observed_idx.cast("int").alias("turn_idx"),
                F.lit(kind).alias("kind"),
            )
        )
    manifests.append(
        base.filter(F.col("f_bad_conv")).select(
            "part",
            "conv_id",
            F.col("turn_idx_clean").cast("int").alias("turn_idx"),
            F.lit("bad_conv").alias("kind"),
        )
    )
    manifest = manifests[0]
    for m in manifests[1:]:
        manifest = manifest.unionAll(m)

    return TranscriptCorpus(
        clean=clean,
        corrupted=corrupted,
        manifest=manifest,
        drifted_parts=[DRIFT_DATE] if inject_drift else [],
    )


def write_corpus(corpus: TranscriptCorpus, out_dir: str) -> None:
    """Materialize the corpus partitioned by ``part`` (the verdict
    granularity; on Iceberg this would be days(ts) partitioning).

    Repartition by part first so each partition directory holds ONE file
    instead of one per task (90 parts x 32 tasks of tiny files murders scan
    parallelism with listing + task overhead — the small-file problem)."""
    corpus.corrupted.repartition("part").write.mode("overwrite").partitionBy(
        "part"
    ).parquet(f"{out_dir}/transcripts")
    corpus.clean.repartition("part").write.mode("overwrite").partitionBy(
        "part"
    ).parquet(f"{out_dir}/transcripts_baseline")
    corpus.manifest.write.mode("overwrite").parquet(f"{out_dir}/violation_manifest")
