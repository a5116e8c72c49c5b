"""External layer sources: WKT tables, GeoJSON (JSONL + collection)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark import sources
from tilemaker_spark.functions import geomnp as G


def test_wkt_point_line(spark):
    df = spark.createDataFrame(
        [("a", "POINT(1 2)", "x"), ("b", "LINESTRING(0 0, 1 1, 2 0)", "y")],
        "name string, wkt string, extra string")
    out = {r.name: r for r in
           sources.read_wkt_layer(df, "test").collect()}
    assert out["a"].geom_type == G.GEOM_POINT
    assert out["a"].rings == [[1.0, 2.0]]
    assert out["b"].geom_type == G.GEOM_LINE
    assert out["b"].rings == [[0.0, 0.0, 1.0, 1.0, 2.0, 0.0]]
    assert out["a"].attrs == {"extra": "x"}


def test_wkt_polygon_winding_and_close(spark):
    # outer clockwise-in-lonlat with duplicated closing point + hole
    wkt = ("POLYGON((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    df = spark.createDataFrame([("p", wkt)], "name string, wkt string")
    r = sources.read_wkt_layer(df, "test").first()
    rings = [np.asarray(x).reshape(-1, 2) for x in r.rings]
    assert len(rings) == 2
    assert len(rings[0]) == 4       # closing point dropped
    assert G.ring_area(rings[0]) > 0    # outer forced positive
    assert G.ring_area(rings[1]) < 0    # hole opposite


def test_wkt_multipolygon(spark):
    wkt = "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    df = spark.createDataFrame([("mp", wkt)], "name string, wkt string")
    r = sources.read_wkt_layer(df, "test").first()
    polys = G.iter_polygons([np.asarray(x).reshape(-1, 2) for x in r.rings])
    assert len(polys) == 2


def test_wkt_source_columns_projection(spark):
    df = spark.createDataFrame(
        [("a", "POINT(0 0)", "keepme", "dropme")],
        "name string, wkt string, good string, bad string")
    r = sources.read_wkt_layer(df, "test", source_columns=["good"]).first()
    assert r.attrs == {"good": "keepme"}


def test_geojson_jsonl(spark, tmp_path):
    p = tmp_path / "feats.jsonl"
    feats = [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [10.0, 20.0]},
         "properties": {"name": "pt1", "kind": "poi"}},
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]},
         "properties": {"name": "sq", "kind": "area"}},
    ]
    with open(p, "w") as f:
        for ft in feats:
            f.write(json.dumps(ft) + "\n")
    out = {r.name: r for r in
           sources.read_geojson(spark, str(p), "gj").collect()}
    assert out["pt1"].geom_type == G.GEOM_POINT
    assert out["pt1"].attrs["kind"] == "poi"
    assert out["sq"].geom_type == G.GEOM_POLYGON
    ring = np.asarray(out["sq"].rings[0]).reshape(-1, 2)
    assert len(ring) == 4


def test_geojson_feature_collection(spark, tmp_path):
    p = tmp_path / "fc.geojson"
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "MultiLineString",
                      "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]},
         "properties": {"name": "ml"}},
    ]}
    with open(p, "w") as f:
        json.dump(fc, f)
    out = sources.read_geojson(spark, str(p), "gj").collect()
    assert len(out) == 1
    assert out[0].geom_type == G.GEOM_LINE
    assert len(out[0].rings) == 2


def test_probe_bbox(spark):
    df = spark.createDataFrame(
        [("a", "LINESTRING(-3 2, 5 7)"), ("b", "POINT(10 -4)")],
        "name string, wkt string")
    layer = sources.read_wkt_layer(df, "test")
    assert sources.probe_bbox(layer) == (-3.0, -4.0, 10.0, 7.0)


def _wkb_point(x, y, bo="<"):
    import struct
    return (b"\x01" if bo == "<" else b"\x00") + \
        struct.pack(bo + "I", 1) + struct.pack(bo + "2d", x, y)


def test_wkb_layer_scan(spark):
    """WKB scan: LE/BE, ISO-Z, EWKB+SRID, polygon holes, multipolygon
    flatten — all without external geo libs."""
    import struct

    def poly(rings, bo="<", ewkb_srid=None, iso_z=False):
        t = 3 + (1000 if iso_z else 0)
        head = (b"\x01" if bo == "<" else b"\x00")
        if ewkb_srid is not None:
            head += struct.pack(bo + "I", 3 | 0x20000000)
            head += struct.pack(bo + "I", ewkb_srid)
        else:
            head += struct.pack(bo + "I", t)
        out = head + struct.pack(bo + "I", len(rings))
        for r in rings:
            out += struct.pack(bo + "I", len(r))
            for p in r:
                coords = (p[0], p[1], 7.0) if iso_z else (p[0], p[1])
                out += struct.pack(bo + f"{len(coords)}d", *coords)
        return out

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]
    mp = (b"\x01" + struct.pack("<I", 6) + struct.pack("<I", 2)
          + poly([sq]) + poly([[(10.0, 10.0), (11.0, 10.0),
                                (11.0, 11.0), (10.0, 10.0)]]))
    rows = [("pt", bytearray(_wkb_point(3.5, -2.25))),
            ("pt_be", bytearray(_wkb_point(1.0, 2.0, bo=">"))),
            ("poly_hole", bytearray(poly([sq, hole], bo=">"))),
            ("poly_srid", bytearray(poly([sq], ewkb_srid=4326))),
            ("poly_z", bytearray(poly([sq], iso_z=True))),
            ("multi", bytearray(mp))]
    df = spark.createDataFrame(rows, "name string, wkb binary")
    out = {r.name: r for r in
           sources.read_wkb_layer(df, "test").collect()}
    import numpy as np
    from tilemaker_spark.functions import geomnp as G
    assert out["pt"].geom_type == 1
    assert list(out["pt"].rings[0]) == [3.5, -2.25]
    assert list(out["pt_be"].rings[0]) == [1.0, 2.0]
    for key in ("poly_hole", "poly_srid", "poly_z"):
        r = out[key]
        assert r.geom_type == 3
        outer = np.asarray(r.rings[0], float).reshape(-1, 2)
        assert abs(abs(G.ring_area(outer)) - 16.0) < 1e-9, key
    assert len(out["poly_hole"].rings) == 2
    inner = np.asarray(out["poly_hole"].rings[1], float).reshape(-1, 2)
    assert abs(abs(G.ring_area(inner)) - 1.0) < 1e-9
    assert len(out["multi"].rings) == 2


def test_wkb_mixed_collection_keeps_first_type(spark):
    """A heterogeneous GeometryCollection keeps only members of the
    first member's geometry class (documented limitation) — later
    polygon rings must NOT be reinterpreted as point/line parts."""
    import struct

    def poly(rings):
        out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", len(rings))
        for r in rings:
            out += struct.pack("<I", len(r))
            for pxy in r:
                out += struct.pack("<2d", *pxy)
        return out

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    gc = (b"\x01" + struct.pack("<I", 7) + struct.pack("<I", 3)
          + _wkb_point(1.0, 2.0) + poly([sq]) + _wkb_point(5.0, 6.0))
    gc_poly_first = (b"\x01" + struct.pack("<I", 7) + struct.pack("<I", 2)
                     + poly([sq]) + _wkb_point(1.0, 2.0))
    df = spark.createDataFrame(
        [("mixed_pt", bytearray(gc)), ("mixed_poly", bytearray(gc_poly_first))],
        "name string, wkb binary")
    out = {r.name: r for r in sources.read_wkb_layer(df, "test").collect()}
    r = out["mixed_pt"]
    assert r.geom_type == 1
    assert [list(x) for x in r.rings] == [[1.0, 2.0], [5.0, 6.0]]
    r2 = out["mixed_poly"]
    assert r2.geom_type == 3
    assert len(r2.rings) == 1 and len(r2.rings[0]) == 8  # closing pt dropped


def test_geoparquet_roundtrip(spark, tmp_path):
    """S4f write_geoparquet is the inverse of read_wkb_layer: canonical
    layer rows -> per-partition GeoParquet files (spec `geo` footer
    metadata, WKB geometry, map attrs) -> scan back to identical
    canonical rows. Exercises Point/MultiPoint, Line/MultiLine,
    Polygon+hole, MultiPolygon regrouping by ring orientation."""
    import glob

    sq = [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0]          # CCW outer
    hole = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 1.0]        # CW hole
    tri = [10.0, 10.0, 12.0, 10.0, 11.0, 12.0]             # CCW outer
    rows = [
        ("test", "pt", 1, [[3.5, -2.25]], {"k": "v"}),
        ("test", "mpt", 1, [[0.0, 1.0], [2.0, 3.0]], {}),
        ("test", "ln", 2, [[0.0, 0.0, 1.0, 1.0, 2.0, 0.0]], {"hw": "y"}),
        ("test", "mln", 2, [[0.0, 0.0, 1.0, 1.0],
                            [2.0, 2.0, 3.0, 3.0]], {}),
        ("test", "poly", 3, [sq, hole], {"name2": "x"}),
        ("test", "mpoly", 3, [sq, hole, tri], {}),
    ]
    df = spark.createDataFrame(rows, sources.LAYER_SCHEMA)
    out_dir = str(tmp_path / "gp")
    n = sources.write_geoparquet(df.repartition(3), out_dir)
    assert n == 6

    import pyarrow.parquet as pq
    files = sorted(glob.glob(out_dir + "/*.parquet"))
    assert files, "no parquet files written"
    seen_types = set()
    for f in files:
        geo = json.loads(pq.read_schema(f).metadata[b"geo"])
        assert geo["version"] == "1.0.0"
        assert geo["primary_column"] == "geometry"
        gcol = geo["columns"]["geometry"]
        assert gcol["encoding"] == "WKB"
        b = gcol["bbox"]
        assert b[0] <= b[2] and b[1] <= b[3]
        seen_types.update(gcol["geometry_types"])
    assert seen_types == {"Point", "MultiPoint", "LineString",
                          "MultiLineString", "Polygon", "MultiPolygon"}

    back = spark.read.parquet(out_dir)
    # attrs survive as a real map<string,string> column
    am = {r.name: dict(r.attrs) for r in back.collect()}
    assert am["pt"] == {"k": "v"} and am["poly"] == {"name2": "x"}
    assert am["mpt"] == {}

    out = {r.name: r for r in sources.read_wkb_layer(
        back.select("name", "geometry"), "test",
        wkb_col="geometry").collect()}
    for layer, nm, gt, rings, _ in rows:
        r = out[nm]
        assert r.geom_type == gt, nm
        assert [list(x) for x in r.rings] == rings, nm


# -------------------- WKB encode/parse property roundtrip (kernel-only)

from hypothesis import given, settings
from hypothesis import strategies as st

_coord = st.floats(min_value=-180.0, max_value=180.0,
                   allow_nan=False, allow_infinity=False, width=64)


def _square(cx, cy, half, ccw=True):
    pts = [(cx - half, cy - half), (cx + half, cy - half),
           (cx + half, cy + half), (cx - half, cy + half)]
    if not ccw:
        pts = pts[::-1]
    return [v for p in pts for v in p]


@st.composite
def _feature(draw):
    gt = draw(st.sampled_from([1, 2, 3]))
    if gt == 1:
        n = draw(st.integers(1, 5))
        return gt, [[draw(_coord), draw(_coord)] for _ in range(n)]
    if gt == 2:
        n = draw(st.integers(1, 4))
        parts = []
        for _ in range(n):
            m = draw(st.integers(2, 6))
            parts.append([draw(_coord) for _ in range(2 * m)])
        return gt, parts
    # polygons: disjoint CCW outer squares on a coarse grid, each with
    # an optional strictly-contained CW hole — simple rings by
    # construction so _orient_rings neither dissolves nor reverses
    cells = draw(st.lists(st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
                          min_size=1, max_size=4, unique=True))
    parts = []
    for (i, j) in cells:
        parts.append(_square(i * 10.0, j * 10.0, 4.0, ccw=True))
        if draw(st.booleans()):
            parts.append(_square(i * 10.0, j * 10.0, 1.0, ccw=False))
    return gt, parts


@given(_feature())
@settings(max_examples=80, deadline=None)
def test_wkb_encode_parse_roundtrip_property(feat):
    """_parse_wkb(_encode_wkb(...)) is the identity on canonical
    flat-parts features (after the scan path's _orient_rings): float
    coordinates survive bit-exactly (pure struct packing, no
    arithmetic), Multi* regrouping preserves part order, polygon ring
    closure added by the encoder is dropped again by orientation."""
    gt, parts = feat
    wkb, _name = sources._encode_wkb(gt, parts)
    gt2, parsed = sources._parse_wkb(wkb)
    assert gt2 == gt
    back = sources._orient_rings(gt2, parsed) if gt == 3 else parsed
    assert [list(p) for p in back] == [list(p) for p in parts]


def test_geoparquet_rerun_clears_stale_parts(spark, tmp_path):
    """Overwrite semantics: a rerun into the same directory must not
    leave part files from a previous (larger) run for readers to union
    with the new data."""
    rows6 = [("test", f"pt{i}", 1, [[float(i), 0.0]], {})
             for i in range(6)]
    df6 = spark.createDataFrame(rows6, sources.LAYER_SCHEMA)
    out_dir = str(tmp_path / "gp_rerun")
    assert sources.write_geoparquet(df6, out_dir) == 6

    df1 = spark.createDataFrame(rows6[:1], sources.LAYER_SCHEMA)
    assert sources.write_geoparquet(df1, out_dir) == 1
    back = spark.read.parquet(out_dir)
    assert back.count() == 1
    assert back.first().name == "pt0"


# ------------------------------------------------------------ WARC

def test_warc_roundtrip_gzip_members_and_plain(spark, tmp_path):
    """write_warc -> read_warc returns every record byte-identical, in
    both the CC per-record-gzip-member layout and plain WARC; bodies
    containing the record terminator bytes survive (Content-Length
    parse, not delimiter scan)."""
    from tilemaker_spark.sources import read_warc, write_warc

    recs = [(f"https://h{i % 3}.example/p/{i}", "2024-01-01T00:00:00Z",
             (f"body {i} " + "x" * i).encode()
             + (b"\r\n\r\nWARC/1.0\r\n" if i % 5 == 0 else b""))
            for i in range(40)]
    for gz in (True, False):
        p = str(tmp_path / f"t{int(gz)}.warc")
        assert write_warc(p, recs, gzip_members=gz) == 40
        out = sorted((r.url, r.warc_date, r.rec_type, bytes(r.body))
                     for r in read_warc(spark, p).collect())
        assert out == sorted((u, d, "resource", b) for u, d, b in recs)


def test_warc_no_index_fallback_matches_index(spark, tmp_path):
    """Deleting the sidecar index flips read_warc to the driver
    boundary scan — identical rows, both layouts."""
    import os

    from tilemaker_spark.sources import read_warc, write_warc

    recs = [(f"https://s.example/{i}", "2024-01-01T00:00:00Z",
             f"payload {i}".encode()) for i in range(17)]
    for gz in (True, False):
        p = str(tmp_path / f"n{int(gz)}.warc")
        write_warc(p, recs, gzip_members=gz)
        with_idx = sorted(map(tuple, read_warc(spark, p).collect()))
        os.remove(p + ".idx")
        without = sorted(map(tuple, read_warc(spark, p).collect()))
        assert with_idx == without and len(with_idx) == 17


def test_warc_scan_is_partition_parallel(spark, tmp_path):
    """The offset index drives a genuinely multi-partition scan."""
    from tilemaker_spark.sources import read_warc, write_warc

    recs = [(f"https://s.example/{i}", "2024-01-01T00:00:00Z", b"b" * i)
            for i in range(64)]
    p = str(tmp_path / "p.warc")
    write_warc(p, recs)
    df = read_warc(spark, p, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 64


def test_warc_roundtrip_property_fuzz(spark, tmp_path):
    """Hypothesis fuzz: arbitrary binary bodies — including gzip
    magic bytes, CRLF runs, WARC header look-alikes, and empty
    payloads — survive the write→read roundtrip byte-identically in
    both layouts. Spark session setup is expensive, so the fuzz drives
    one parse pass over many drawn records instead of one session per
    example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tilemaker_spark.sources import read_warc, write_warc

    bodies = st.binary(min_size=0, max_size=200) | st.sampled_from([
        b"", b"\x1f\x8b\x08\x00", b"\r\n\r\n", b"WARC/1.0\r\n",
        b"Content-Length: 99\r\n\r\n", b"\x00" * 64])
    case = [0]

    @given(st.lists(bodies, min_size=1, max_size=12))
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(bs):
        case[0] += 1
        recs = [(f"https://f.example/{i}", "2024-01-01T00:00:00Z", b)
                for i, b in enumerate(bs)]
        for gz in (True, False):
            p = str(tmp_path / f"fz{case[0]}_{int(gz)}.warc")
            write_warc(p, recs, gzip_members=gz)
            out = sorted((r.url, bytes(r.body))
                         for r in read_warc(spark, p).collect())
            assert out == sorted((u, b) for u, _, b in recs)

    run()
