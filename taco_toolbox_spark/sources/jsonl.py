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

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TRANSCRIPT_SCHEMA, align_to_schema

_CORRUPT = "_corrupt_record"


class IngestResult(NamedTuple):
    """Split of a quarantined JSONL read. ``release()`` unpersists the
    shared cached parse — call it once both splits are consumed, or each
    directory batch of a long ingestion leaks one cached dataset into the
    executor storage pool."""

    good: DataFrame
    quarantine: DataFrame
    release: Callable[[], None]


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRANSCRIPT_SCHEMA,
) -> IngestResult:
    """Read JSONL at ``path`` against ``schema``; return
    (good, quarantine, release).

    good: schema-aligned rows for every line that is well-formed JSON.
    quarantine: (raw, line_hash) for every syntactically malformed line.
    Atomic fields are READ AS STRINGS and cast by ``align_to_schema``, so
    a parseable line with a type mismatch (a stringified int, "abc" where
    a number belongs) stays GOOD — the bad value casts to NULL and the
    validation engine flags it with check granularity; enforcing the
    typed schema at parse time would instead dump every such line into
    quarantine as if it were unparseable. Non-atomic fields (if the
    schema has any) keep their typed parse, so their type mismatches do
    quarantine — the lenient-string trick has no lossless equivalent for
    nested values."""
    lenient = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType()
                if isinstance(f.dataType, T.AtomicType)
                else f.dataType,
            )
            for f in schema.fields
        ]
        + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(lenient)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark refuses filters that touch only the corrupt column on an
        # uncached raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
        # would otherwise prune every data column and never populate it);
        # caching is the documented contract, released via release().
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
    return IngestResult(good, quarantine, lambda: raw.unpersist())
