"""Input-source adapter: Iceberg when available, partitioned parquet
otherwise.

The production target (BASELINE north_rule) is Iceberg tables; this
container ships no Iceberg runtime jars, so the adapter degrades to the
parquet directory layout with the same semantics the engine relies on:
  - load(): table scan with partition pruning
  - snapshot_id(): lineage pin for the checkpoint manifest (Iceberg
    snapshot id; for parquet, a deterministic hash of the file listing —
    resuming a run can verify it validates the same data version)
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not available in this environment
    import pyiceberg  # noqa: F401

    HAVE_ICEBERG = True
except ImportError:
    HAVE_ICEBERG = False


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is wired into the session."""
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None)) and (
            "iceberg" in spark.conf.get("spark.sql.catalog.spark_catalog", "")
        )
    except Exception:
        return False


def load_table(spark: SparkSession, location: str) -> DataFrame:
    """Load an input table: `iceberg:<name>` via the catalog, else a
    parquet path."""
    if location.startswith("iceberg:"):
        name = location.split(":", 1)[1]
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg runtime is not on the classpath in this environment; "
                "pass a parquet path instead (same engine semantics)"
            )
        return spark.read.format("iceberg").load(name)
    return spark.read.parquet(location)


def snapshot_id(spark: SparkSession, location: str) -> str:
    """Lineage pin for the checkpoint manifest. Iceberg: current snapshot
    id. Parquet: xxhash-style digest of the sorted (path, size, mtime)
    listing — changes iff the data files change."""
    if location.startswith("iceberg:"):
        if not iceberg_available(spark):
            raise NotImplementedError("Iceberg runtime not available")
        name = location.split(":", 1)[1]
        row = spark.sql(
            f"SELECT snapshot_id FROM {name}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row[0]) if row else "none"
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(location)):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            h.update(f"{os.path.relpath(p, location)}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]
