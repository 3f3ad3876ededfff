"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_object_dtype(s):
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns {sc} vs {oc}")
        return problems
    # The driver hashes raw pandas values WITHOUT dtype coercion: a DuckDB
    # HUGEINT sum arrives as float64/object while Spark gives int64, and the
    # exact hash fails even when every value is equal. Flag kind mismatches.
    for c in sc:
        ks, ko = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        if ks != ko:
            problems.append(
                f"col {c}: dtype kind {spark_pdf[c].dtype} vs "
                f"{oracle_pdf[c].dtype} (driver hash would fail — add casts)"
            )
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                eq = np.isclose(
                    a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True
                )
                exact = bool(eq.all())
                if not exact:
                    close = np.isclose(
                        a[c].to_numpy(), b[c].to_numpy(), rtol=1e-12, equal_nan=True
                    ).all()
                    problems.append(
                        f"col {c}: {int((~eq).sum())} float diffs"
                        + (" (within 1e-12 — hash would fail!)" if close else "")
                    )
            else:
                neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                        f"{a[c][i]!r} vs {b[c][i]!r}"
                    )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from taco_toolbox_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows match "
                  f"[{time.time()-t0:.1f}s]")

    # smoke entry()
    if not only:
        e = entrymod.entry(spark)
        n = e.count()
        print(f"entry(): {n} rows, schema={e.schema.simpleString()}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
