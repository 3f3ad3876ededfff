"""taco_toolbox_spark — a from-scratch PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of
tacofoundation/taco-toolbox (reference at /root/reference, read-only),
re-expressed idiomatically for Spark.

Not a port: the reference is single-process PyArrow; this engine declares
every check/stat as a Catalyst logical plan over DataFrames so that
predicate pushdown, column pruning, partial aggregation, AQE and
whole-stage codegen apply, and it is designed for 10^12-row inputs on
multi-executor clusters (salted skew handling, mergeable sketches,
checkpoint-resumable runs).

Entry points:
  - session.get_spark()                 — tuned SparkSession factory
  - datagen.generate_transcripts(...)   — deterministic synthetic corpus
  - engine.run_validation(df, checks)   — verdicts + violations + stats
  - checks.transcript_checks(...)       — the default constraint battery
"""

__version__ = "0.1.0"
