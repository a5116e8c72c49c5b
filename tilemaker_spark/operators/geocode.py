"""Deterministic geo-derivation for Common-Crawl-style pages.

Per the driver contract (BASELINE.json input_hint / FIXTURES.md §1), the
engine derives a point position for every page from a stable hash of its
key — pure integer Column arithmetic, so it is (a) JVM-side inside
whole-stage codegen and (b) bit-identically reproducible in ANSI SQL for
the DuckDB oracle.

20% of rows ("city center" skew knob) land in a 0.2° square hot spot to
reproduce the z5-tile skew the reference weights 1000x
(/root/reference/src/tilemaker.cpp:510-521).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative-hash constants; values stay < 2^63 for ids < ~3e9.
LON_MUL, LON_ADD, LON_MOD = 2654435761, 40503, 360_000_000
LAT_MUL, LAT_ADD, LAT_MOD = 2246822519, 12345, 170_000_000
HOT_MOD = 5  # id % 5 == 0 -> hot city-center row (20%)
HOT_LON_CENTER, HOT_LAT_CENTER = -73.98, 40.75  # the "city"
HOT_MUL_X, HOT_ADD_X = 48271, 7
HOT_MUL_Y, HOT_ADD_Y = 69621, 11
HOT_SPAN = 200_000  # 0.2 degrees at 1e-6 resolution


def derive_lon(doc_id: Column) -> Column:
    base = ((doc_id * F.lit(LON_MUL) + F.lit(LON_ADD)) % F.lit(LON_MOD)
            ) / F.lit(1_000_000.0) - F.lit(180.0)
    hot = F.lit(HOT_LON_CENTER) + (
        (doc_id * F.lit(HOT_MUL_X) + F.lit(HOT_ADD_X)) % F.lit(HOT_SPAN)
    ) / F.lit(1_000_000.0) - F.lit(0.1)
    return F.when(doc_id % HOT_MOD == 0, hot).otherwise(base)


def derive_lat(doc_id: Column) -> Column:
    base = ((doc_id * F.lit(LAT_MUL) + F.lit(LAT_ADD)) % F.lit(LAT_MOD)
            ) / F.lit(1_000_000.0) - F.lit(85.0)
    hot = F.lit(HOT_LAT_CENTER) + (
        (doc_id * F.lit(HOT_MUL_Y) + F.lit(HOT_ADD_Y)) % F.lit(HOT_SPAN)
    ) / F.lit(1_000_000.0) - F.lit(0.1)
    return F.when(doc_id % HOT_MOD == 0, hot).otherwise(base)


def geocode_pages(pages: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """pages + (lon, lat) columns. Payload columns pass through untouched
    (per-row invariant: byte-identical text per url)."""
    did = F.col(id_col)
    return pages.withColumn("lon", derive_lon(did)).withColumn("lat", derive_lat(did))


# --- ANSI-SQL twins (DuckDB oracle), kept textually tiny and in lockstep
# with the Column versions above.

def sql_lon(id_expr: str = "doc_id") -> str:
    return (
        f"CASE WHEN {id_expr} % {HOT_MOD} = 0 THEN "
        f"{HOT_LON_CENTER} + (({id_expr} * {HOT_MUL_X} + {HOT_ADD_X}) % {HOT_SPAN}) / 1000000.0 - 0.1 "
        f"ELSE (({id_expr} * {LON_MUL} + {LON_ADD}) % {LON_MOD}) / 1000000.0 - 180.0 END"
    )


def sql_lat(id_expr: str = "doc_id") -> str:
    return (
        f"CASE WHEN {id_expr} % {HOT_MOD} = 0 THEN "
        f"{HOT_LAT_CENTER} + (({id_expr} * {HOT_MUL_Y} + {HOT_ADD_Y}) % {HOT_SPAN}) / 1000000.0 - 0.1 "
        f"ELSE (({id_expr} * {LAT_MUL} + {LAT_ADD}) % {LAT_MOD}) / 1000000.0 - 85.0 END"
    )


def sql_tile_x(lon_expr: str, z: int) -> str:
    """Integer tile x in SQL — same floor math as coords.lon2tilex_col."""
    return f"CAST(floor(({lon_expr} + 180.0) / 360.0 * {1 << z}) AS BIGINT)"


def sql_tile_y(lat_expr: str, z: int) -> str:
    """Integer tile y via Mercator latp — degrees(ln(tan(radians(lat+90)/2)))."""
    latp = (f"degrees(ln(tan(radians(least(greatest({lat_expr}, -85.06), 85.06) "
            f"+ 90.0) / 2.0)))")
    return f"CAST(floor((180.0 - {latp}) / 360.0 * {1 << z}) AS BIGINT)"
