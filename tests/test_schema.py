from pyspark.sql import types as T

from taco_toolbox_spark.schema import (
    TRANSCRIPT_SCHEMA,
    align_to_schema,
    align_union,
    compare_schema,
)


def test_compare_ok(corpus):
    d = compare_schema(
        corpus.clean.drop("part").schema, TRANSCRIPT_SCHEMA, allow_extra=False
    )
    assert d.ok, d.report()


def test_compare_missing_extra_mistyped(spark):
    obs = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),  # mistyped
            T.StructField("bonus", T.StringType()),  # extra
        ]
    )
    d = compare_schema(obs, TRANSCRIPT_SCHEMA, allow_extra=False)
    assert not d.ok
    assert "role" in d.missing and "bonus" in d.extra
    assert ("turn_idx", "int", "bigint") in d.mistyped
    assert "missing" in d.report()


def test_align_to_schema(spark):
    df = spark.createDataFrame(
        [("c1", 0)], "conv_id string, turn_idx long"
    )
    out = align_to_schema(df, TRANSCRIPT_SCHEMA)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert dict(out.dtypes)["turn_idx"] == "int"
    row = out.first()
    assert row["role"] is None and row["ts"] is None


def test_align_union(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 3.5)], "id long, b double")
    u = align_union([a, b])
    assert set(u.columns) == {"id", "a", "b"}
    assert u.count() == 2


def test_literal_frame_empty_rows_and_parameterized_types(spark):
    """ADVICE r3: empty rows must yield a typed empty frame (not a NullType
    array star-expansion error), and parameterized DDL types must parse."""
    from taco_toolbox_spark.schema import literal_frame

    empty = literal_frame(spark, [], "name string, n int")
    assert empty.count() == 0
    assert [f.simpleString() for f in empty.schema.fields] == [
        "name:string",
        "n:int",
    ]

    dec = literal_frame(
        spark,
        [("a", "1.25", [1, 2]), ("b", "2.50", [])],
        "k string, amount decimal(10,2), xs array<int>",
    )
    assert dec.schema["amount"].dataType.simpleString() == "decimal(10,2)"
    rows = {r.k: (str(r.amount), list(r.xs)) for r in dec.collect()}
    assert rows == {"a": ("1.25", [1, 2]), "b": ("2.50", [])}
