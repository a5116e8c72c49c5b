"""Real binary .shp/.dbf reader (S3) — a hand-rolled writer builds a
tiny shapefile (point + polyline + polygon-with-hole) and the reader
must reproduce geometry, winding normalization, and DBF attributes."""

import struct

import numpy as np
import pytest

from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.sources import read_shapefile


def _shp_record(recno: int, content: bytes) -> bytes:
    return struct.pack(">ii", recno, len(content) // 2) + content


def _point(x, y) -> bytes:
    return struct.pack("<idd", 1, x, y)


def _poly(stype, rings) -> bytes:
    pts = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings])
    xs, ys = pts[:, 0], pts[:, 1]
    parts = []
    off = 0
    for r in rings:
        parts.append(off)
        off += len(r)
    out = struct.pack("<idddd", stype, xs.min(), ys.min(), xs.max(), ys.max())
    out += struct.pack("<ii", len(rings), off)
    out += struct.pack(f"<{len(parts)}i", *parts)
    out += pts.astype("<f8").tobytes()
    return out


def _write_shp(path, records):
    body = b"".join(_shp_record(i + 1, c) for i, c in enumerate(records))
    total_words = (100 + len(body)) // 2
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, 5)  # version, shape type
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + body)


def _write_dbf(path, fields, rows):
    # fields: [(name, length)] all type C
    n, rec_size = len(rows), 1 + sum(l for _, l in fields)
    header = struct.pack("<BBBBihh20x", 3, 24, 1, 1, n, 32 + 32 * len(fields) + 1,
                         rec_size)
    fds = b""
    for name, length in fields:
        fds += name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4 \
            + bytes([length]) + b"\x00" * 15
    body = b""
    for row in rows:
        body += b" "
        for (name, length), v in zip(fields, row):
            body += v.encode().ljust(length)[:length]
    with open(path, "wb") as f:
        f.write(header + fds + b"\x0D" + body + b"\x1A")


@pytest.fixture(scope="module")
def shp_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("shp")
    path = str(d / "layer.shp")
    # shapefile convention: outer ring CW, holes CCW; closed (first
    # point repeated)
    outer_cw = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]
    hole_ccw = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    line = [(10, 10), (11, 10), (12, 11)]
    records = [
        _point(5.5, 6.5),
        _poly(3, [line]),
        _poly(5, [outer_cw, hole_ccw]),
    ]
    _write_shp(path, records)
    _write_dbf(str(d / "layer.dbf"),
               [("NAME", 12), ("KIND", 8)],
               [("pt_a", "point"), ("ln_b", "line"), ("pg_c", "poly")])
    return path


def test_read_shapefile_geometries(spark, shp_path):
    out = {r.name: r for r in
           read_shapefile(spark, shp_path, "test").collect()}
    assert set(out) == {"pt_a", "ln_b", "pg_c"}
    assert out["pt_a"].geom_type == G.GEOM_POINT
    assert list(out["pt_a"].rings[0]) == [5.5, 6.5]
    assert out["ln_b"].geom_type == G.GEOM_LINE
    assert len(out["ln_b"].rings[0]) == 6
    assert out["pg_c"].geom_type == G.GEOM_POLYGON


def test_polygon_winding_normalized(spark, shp_path):
    """Shapefile CW-outer/CCW-hole arrives in engine convention:
    outer positive shoelace, hole negative, closing point dropped."""
    out = {r.name: r for r in
           read_shapefile(spark, shp_path, "test").collect()}
    rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2)
             for r in out["pg_c"].rings]
    assert len(rings) == 2
    assert G.ring_area(rings[0]) == pytest.approx(16.0)
    assert G.ring_area(rings[1]) == pytest.approx(-1.0)
    assert len(rings[0]) == 4  # closing duplicate removed


def test_dbf_attributes_and_projection(spark, shp_path):
    out = {r.name: dict(r.attrs) for r in
           read_shapefile(spark, shp_path, "test").collect()}
    assert out["pt_a"] == {"KIND": "point"}
    assert out["pg_c"] == {"KIND": "poly"}
    # explicit projection (F9): only requested columns survive
    proj = read_shapefile(spark, shp_path, "test",
                          source_columns=[]).collect()
    assert all(dict(r.attrs) == {} for r in proj)


def test_shapefile_feeds_spatial_join(spark, shp_path):
    """The binary reader's output is a drop-in spatial-join build side."""
    from pyspark.sql import functions as F
    from tilemaker_spark.operators.spatial_join import points_in_polygons
    polys = read_shapefile(spark, shp_path, "test") \
        .filter(F.col("geom_type") == G.GEOM_POLYGON)
    pts = spark.createDataFrame(
        [(1, 3.0, 3.0), (2, 1.5, 1.5), (3, 9.0, 9.0)],
        "doc_id long, lon double, lat double")
    got = {r.doc_id for r in
           points_in_polygons(pts, polys, point_id="doc_id").collect()}
    assert got == {1}  # 2 is in the hole, 3 outside
