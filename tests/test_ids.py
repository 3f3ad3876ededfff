import pytest

from taco_toolbox_spark.functions.ids import (
    format_code,
    grid_bucket,
    morton_encode,
    parse_size,
    parse_size_col,
    sanitize_filename,
)
import pyspark.sql.functions as F


def _py_morton(lon, lat, bits=21):
    scale = (1 << bits) - 1
    xi = round((lon + 180.0) / 360.0 * scale)
    yi = round((lat + 90.0) / 180.0 * scale)

    def spread(v):
        out = 0
        for i in range(bits):
            out |= ((v >> i) & 1) << (2 * i)
        return out

    return spread(xi) | (spread(yi) << 1)


def test_morton_matches_python(spark):
    pts = [(-180.0, -90.0), (0.0, 0.0), (179.9, 89.9), (12.34, -56.78)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = df.select("lon", "lat", morton_encode(F.col("lon"), F.col("lat")).alias("m")).collect()
    for r in got:
        assert r["m"] == _py_morton(r["lon"], r["lat"]), (r["lon"], r["lat"])


def test_morton_locality(spark):
    # near points must be closer in Z-order than far points (statistical)
    df = spark.createDataFrame(
        [(10.0, 10.0), (10.01, 10.01), (-170.0, -80.0)], "lon double, lat double"
    )
    m = [r["m"] for r in df.select(morton_encode(F.col("lon"), F.col("lat")).alias("m")).collect()]
    assert abs(m[0] - m[1]) < abs(m[0] - m[2])


def test_grid_and_codes(spark):
    df = spark.createDataFrame([(50.5, 7.2, 42)], "lat double, lon double, g int")
    r = df.select(
        grid_bucket(F.col("lat"), F.col("lon")).alias("cell"),
        format_code("sg", F.col("g")).alias("code"),
    ).first()
    assert r["cell"] == "r0140_c0187"
    assert r["code"] == "sg0042"


def test_sanitize(spark):
    df = spark.createDataFrame([('a/b\\c:d*e?"f<g>h|i\'j',)], "s string")
    assert df.select(sanitize_filename(F.col("s")).alias("o")).first()["o"] == (
        "a_b_c_d_e_f_g_h_i_j"
    )


def test_parse_size():
    assert parse_size("4GB") == 4 * 1024**3
    assert parse_size("512 MB") == 512 * 1024**2
    assert parse_size("10k") == 10240
    assert parse_size("100") == 100
    with pytest.raises(ValueError):
        parse_size("ten gigs")


def test_parse_size_col(spark):
    df = spark.createDataFrame([("4GB",), ("512 MB",), ("100",)], "s string")
    out = [r["b"] for r in df.select(parse_size_col(F.col("s")).alias("b")).collect()]
    assert out == [4 * 1024**3, 512 * 1024**2, 100]
