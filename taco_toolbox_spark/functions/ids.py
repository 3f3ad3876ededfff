"""ID/locality scalar functions — reference parity for F1/F2/F7/F8/F12.

Morton (Z-order) encoding and grid bucketing are the reference's locality
tools (/root/reference/tacotoolbox/tortilla/extensions/
spatial_grouping.py:38-74, geoenrich.py:267-293, majortom.py:138-184);
in Spark they also serve as range-partitioning keys (repartitionByRange on
the morton code co-locates spatially nearby rows). All pure column
expressions — codegen'd, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread_bits(v: Column, bits: int) -> Column:
    """Interleave-ready bit spread: v's bits moved to even positions.
    Log-depth magic-number spread (the classic morton trick) as column
    arithmetic on longs."""
    masks = [
        (0x00000000FFFFFFFF, 32),
        (0x0000FFFF0000FFFF, 16),
        (0x00FF00FF00FF00FF, 8),
        (0x0F0F0F0F0F0F0F0F, 4),
        (0x3333333333333333, 2),
        (0x5555555555555555, 1),
    ]
    x = v.bitwiseAND(F.lit((1 << bits) - 1))
    for mask, shift in masks:
        if shift < bits:
            x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_encode(lon: Column, lat: Column, bits: int = 21) -> Column:
    """F7: normalize lon/lat to [0, 2^bits) grid and interleave —
    Z-order locality key (reference spatial_grouping.py:38-74)."""
    scale = F.lit((1 << bits) - 1)
    xi = F.round((lon + 180.0) / 360.0 * scale).cast("long")
    yi = F.round((lat + 90.0) / 180.0 * scale).cast("long")
    return _spread_bits(xi, bits).bitwiseOR(F.shiftleft(_spread_bits(yi, bits), 1))


def grid_bucket(
    lat: Column, lon: Column, cell_deg: float = 1.0
) -> Column:
    """F8: lat/lon -> grid cell label '{row}_{col}' (reference
    majortom.py:138-184 searchsorted bucketing == floor division)."""
    row = F.floor((lat + 90.0) / cell_deg).cast("int")
    col = F.floor((lon + 180.0) / cell_deg).cast("int")
    return F.format_string("r%04d_c%04d", row, col)


def format_code(prefix: str, n: Column, width: int = 4) -> Column:
    """F12: zero-padded group codes, e.g. sg0042
    (reference spatial_grouping.py:239, create.py:594)."""
    return F.format_string(f"{prefix}%0{width}d", n.cast("long"))


def sanitize_filename(col: Column) -> Column:
    """F2: filesystem-safe names (reference create.py:272-295): forbidden
    chars -> '_', collapse runs, strip edges."""
    s = F.regexp_replace(col, r"[/\\:*?\"<>|']", "_")
    s = F.regexp_replace(s, r"_+", "_")
    return F.regexp_replace(s, r"^_|_$", "")


_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(GB?|MB?|KB?|B?)\s*$", re.IGNORECASE)
_MULT = {"B": 1, "K": 1024, "KB": 1024, "M": 1024**2, "MB": 1024**2,
         "G": 1024**3, "GB": 1024**3, "": 1}


def parse_size(text: str) -> int:
    """F1: '4GB'/'512 MB'/'100' -> bytes (reference _validation.py:141-183).
    Driver-side config parsing (not a row function in the reference either)."""
    m = _SIZE_RE.match(text)
    if not m:
        raise ValueError(f"invalid size string: {text!r}")
    num, unit = m.groups()
    return int(float(num) * _MULT[unit.upper()])


def parse_size_col(col: Column) -> Column:
    """F1 as a column expression for table-valued configs."""
    num = F.regexp_extract(col, r"^\s*(\d+(?:\.\d+)?)", 1).cast("double")
    unit = F.upper(F.regexp_extract(col, r"([A-Za-z]+)\s*$", 1))
    mult = (
        F.when(unit.isin("G", "GB"), F.lit(1024**3))
        .when(unit.isin("M", "MB"), F.lit(1024**2))
        .when(unit.isin("K", "KB"), F.lit(1024))
        .otherwise(F.lit(1))
    )
    return (num * mult).cast("long")
