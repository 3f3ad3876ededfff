import math

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checks import apply_row_checks, embedding_checks


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [
        (0, [0.6, 0.8]),            # norm 1.0, clean
        (1, None),                   # null
        (2, [0.6]),                  # wrong dim
        (3, [float("nan"), 0.8]),    # NaN
        (4, [float("inf"), 0.8]),    # Inf
        (5, [60.0, 80.0]),           # norm 100: out of bounds
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_checks_fire_per_kind(emb_df):
    checks = embedding_checks("embedding", 2, norm_lo=0.5, norm_hi=2.0)
    viol = apply_row_checks(emb_df, checks, ["vec_id"])
    got = {(r["vec_id"], r["check_id"]) for r in viol.collect()}
    assert (1, "emb_not_null") in got
    assert (2, "emb_dim") in got
    assert (3, "emb_finite") in got
    assert (4, "emb_finite") in got
    assert (5, "emb_norm") in got
    # clean row fires nothing; null row fails ONLY not_null (others null_ok)
    assert not any(v == 0 for v, _ in got)
    assert {c for v, c in got if v == 1} == {"emb_not_null"}
    # NaN norm fails closed on the norm check too
    assert (3, "emb_norm") in got


def test_embedding_checks_norm_exact(spark):
    checks = embedding_checks("e", 3, norm_lo=1.0, norm_hi=1.0)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.5, 0.5, 0.5])],
        "vec_id long, e array<double>",
    )
    viol = apply_row_checks(df, checks, ["vec_id"])
    got = {r["vec_id"] for r in viol.filter("check_id='emb_norm'").collect()}
    assert got == {1}  # norm sqrt(0.75) != 1


def test_embedding_checks_detail_strings(emb_df):
    checks = embedding_checks("embedding", 2)
    viol = {
        (r["vec_id"], r["check_id"]): r["detail"]
        for r in apply_row_checks(emb_df, checks, ["vec_id"]).collect()
    }
    assert viol[(2, "emb_dim")] == "dim=1 != 2"
    assert viol[(1, "emb_not_null")] == "embedding is null"


def test_embedding_checks_null_element_flagged(spark):
    checks = embedding_checks("e", 2, norm_lo=0.5, norm_hi=2.0)
    df = spark.createDataFrame(
        [(0, [None, 0.8]), (1, [0.6, 0.8])], "vec_id long, e array<double>"
    )
    viol = apply_row_checks(df, checks, ["vec_id"])
    got = {(r["vec_id"], r["check_id"]) for r in viol.collect()}
    assert (0, "emb_finite") in got
    assert not any(v == 1 for v, _ in got)
