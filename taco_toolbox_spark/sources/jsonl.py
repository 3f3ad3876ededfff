"""JSONL ingestion with corrupt-record quarantine — the raw front door.

Transcript corpora arrive as JSONL logs before they are parquet. Reading
them with Spark's default PERMISSIVE mode silently nulls every field of a
malformed line — the validation engine would then report plausible-looking
``text_not_null`` violations for what are really parse failures, burying
the actual problem. This reader splits the stream instead:

  good        — lines that parsed, aligned to the expected schema
                (missing fields null, extras dropped, types cast — the
                P4/V4 align contract from schema.align_to_schema)
  quarantine  — the raw text of every line that failed to parse, with a
                stable line hash for dedup/reporting

Scale shape: one parse pass, no shuffle — the JSON parser runs inside the
scan (JacksonParser per task), the frame is cached (a Spark requirement
for referencing the corrupt column — see inline note), and the
good/quarantine split is two filters over that one materialization.
Malformed-line quarantining mirrors Databricks' badRecordsPath, expressed
portably via ``columnNameOfCorruptRecord``.

Reference: the reference validates its JSON collection reads field-by-field
(tacotoolbox validators on metadata dicts); here malformed input is data,
not an exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TRANSCRIPT_SCHEMA, align_to_schema

_CORRUPT = "_corrupt_record"


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRANSCRIPT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` against ``schema``; return (good, quarantine).

    good: schema-aligned rows for every parseable line. quarantine:
    (raw, line_hash) for every malformed line. A line that parses but
    misses fields is GOOD with nulls — that is the validation engine's
    job to flag, with check granularity; only unparseable text is
    quarantined."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark refuses filters that touch only the corrupt column on an
        # uncached raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
        # would otherwise prune every data column and never populate it);
        # caching is the documented contract. One materialized pass feeds
        # both splits; callers ingesting more than memory should write
        # `good` out per directory batch.
        .cache()
    )
    good = align_to_schema(
        raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT), schema
    )
    quarantine = (
        raw.filter(F.col(_CORRUPT).isNotNull())
        .select(
            F.col(_CORRUPT).alias("raw"),
            F.xxhash64(_CORRUPT).alias("line_hash"),
        )
    )
    return good, quarantine
