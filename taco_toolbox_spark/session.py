"""SparkSession factory tuned for the validation engine.

Settings mirror the reference's performance-relevant configuration targets
(zstd parquet with statistics, ~128 MB target partitions — see
/root/reference/tacotoolbox/_constants.py:79-106 and tacocat.py:32-46) and
the Spark-side scale levers: AQE with skew-join splitting, UTC session
timezone (oracle comparability), Arrow-backed pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "taco_toolbox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster these settings are supplied via spark-submit; every
    conf here is safe cluster-side too.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        # The engine's core stance: malformed values are DATA (violation
        # rows), never exceptions. Spark 4 defaults ANSI on, where a bad
        # cast (align_to_schema's type conformance, the JSONL lenient
        # path, range checks on casted columns) throws CAST_INVALID_INPUT
        # and kills the job on the first bad value — the tested semantics
        # (every pytest + oracle run) are cast-to-NULL. Pin ansi off so
        # production sessions match the tested contract; callers that
        # want ANSI arithmetic checks can override via extra_conf.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # keep partition columns as strings on read-back (stable verdict keys)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # a conv_id-bucketed table already co-locates (conv_id, turn_idx)
        # join keys; with the default (true) Spark still inserts exchanges
        # when the join keys are a superset of the bucket columns — relaxing
        # makes the text-equality join and every per-conversation window
        # exchange-free over bucketed corpora
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # Long-lived sessions compile a new generated class per query (fresh
        # expression ids defeat the codegen source cache); the JVM default
        # 240m code cache fills after ~2-3 full validation passes and HotSpot
        # silently stops JIT-compiling — measured 2-6x progressive slowdown
        # across repeats, fully reproducible, gone with headroom. Metaspace
        # likewise accumulates generated classes between GCs.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:MaxMetaspaceSize=2g",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:MaxMetaspaceSize=2g",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
