"""A4 line combine, A5 polygon combine, F5 attribute minzoom."""

import gzip

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import EngineConfig, LayerConfig
from tilemaker_spark.functions import mvt
from tilemaker_spark.functions.coords import lat2latp
from tilemaker_spark.operators.tile_assembly import assemble_tiles
from tilemaker_spark.operators.tiling import cover_explode


def _decode(rows):
    out = {}
    for r in rows:
        b = bytes(r.tile)
        if b[:2] == b"\x1f\x8b":
            b = gzip.decompress(b)
        out[(r.z, r.x, r.y)] = mvt.decode_tile(b)
    return out


def _line_features(spark, segments, layer="roads"):
    """segments: list of (feature_id, coords_lonlat, attrs)."""
    rows = []
    for fid, coords, attrs in segments:
        flat = []
        for lon, lat in coords:
            flat.extend([lon, lat2latp(lat)])
        rows.append((fid, layer, 2, 0, 0, attrs, [flat]))
    return spark.createDataFrame(
        rows, "feature_id long, layer string, geom_type int, min_zoom int, "
              "z_order int, attrs map<string,string>, geom array<array<double>>")


def test_line_combine_chains_segments(spark):
    """Three touching road segments with identical attrs become ONE
    feature when z < combine_below."""
    cfg = EngineConfig(basezoom=6, minzoom=6, maxzoom=6, compress="none",
                      combine_below=7, hot_tile_salt=0)
    cfg.layers["roads"] = LayerConfig(name="roads", minzoom=0, maxzoom=14)
    segs = [
        (1, [(10.0, 40.0), (10.1, 40.0)], {"class": "primary"}),
        (2, [(10.1, 40.0), (10.2, 40.05)], {"class": "primary"}),
        (3, [(10.2, 40.05), (10.3, 40.1)], {"class": "primary"}),
        (4, [(10.0, 40.2), (10.3, 40.2)], {"class": "minor"}),  # incompatible
    ]
    ft = cover_explode(_line_features(spark, segs), 6)
    dec = _decode(assemble_tiles(ft, cfg).collect())
    tile = next(iter(dec.values()))
    feats = tile["roads"]["features"]
    assert len(feats) == 2  # one chained primary + one minor
    by_attrs = {f["attrs"]["class"]: f for f in feats}
    # the chained primary is a single continuous linestring part
    assert len(by_attrs["primary"]["geom"]) == 1
    assert len(by_attrs["primary"]["geom"][0]) >= 4


def test_no_combine_above_gate(spark):
    cfg = EngineConfig(basezoom=6, minzoom=6, maxzoom=6, compress="none",
                      combine_below=0, hot_tile_salt=0)
    cfg.layers["roads"] = LayerConfig(name="roads", minzoom=0, maxzoom=14)
    segs = [
        (1, [(10.0, 40.0), (10.1, 40.0)], {"class": "primary"}),
        (2, [(10.1, 40.0), (10.2, 40.05)], {"class": "primary"}),
    ]
    ft = cover_explode(_line_features(spark, segs), 6)
    dec = _decode(assemble_tiles(ft, cfg).collect())
    tile = next(iter(dec.values()))
    assert len(tile["roads"]["features"]) == 2


def test_polygon_combine(spark):
    """Two disjoint same-attr squares merge into one multipolygon
    feature when z < combine_polygons_below."""
    cfg = EngineConfig(basezoom=6, minzoom=6, maxzoom=6, compress="none",
                      hot_tile_salt=0)
    cfg.layers["bld"] = LayerConfig(name="bld", minzoom=0, maxzoom=14,
                                    combine_polygons_below=7)

    def sq(x0, y0, d=0.05):
        ring = []
        for lon, lat in [(x0, y0), (x0 + d, y0), (x0 + d, y0 + d), (x0, y0 + d)]:
            ring.extend([lon, lat2latp(lat)])
        return [ring]

    rows = [
        (1, "bld", 3, 0, 0, {"kind": "b"}, sq(20.0, 40.0)),
        (2, "bld", 3, 0, 0, {"kind": "b"}, sq(20.5, 40.0)),
        (3, "bld", 3, 0, 0, {"kind": "other"}, sq(21.0, 40.0)),
    ]
    feats = spark.createDataFrame(
        rows, "feature_id long, layer string, geom_type int, min_zoom int, "
              "z_order int, attrs map<string,string>, geom array<array<double>>")
    ft = cover_explode(feats, 6)
    dec = _decode(assemble_tiles(ft, cfg).collect())
    tile = next(iter(dec.values()))
    fs = tile["bld"]["features"]
    assert len(fs) == 2
    combined = [f for f in fs if f["attrs"]["kind"] == "b"][0]
    assert len(combined["geom"]) == 2  # two rings (two outers)


def test_attr_minzoom_projection(spark):
    """F5: attributes with minzoom > tile z are dropped at encode."""
    cfg = EngineConfig(basezoom=8, minzoom=6, maxzoom=8, compress="none",
                      hot_tile_salt=0)
    cfg.layers["pts"] = LayerConfig(name="pts", minzoom=0, maxzoom=14)
    rows = [(1, "pts", 1, 0, 0, {"name": "x", "detail": "y"},
             {"detail": 8}, [[10.0, lat2latp(40.0)]])]
    feats = spark.createDataFrame(
        rows, "feature_id long, layer string, geom_type int, min_zoom int, "
              "z_order int, attrs map<string,string>, "
              "attr_minzoom map<string,int>, geom array<array<double>>")
    from tilemaker_spark.operators.tiling import ancestor_rollup
    ft = ancestor_rollup(cover_explode(feats, 8), 6, 8)
    dec = _decode(assemble_tiles(ft, cfg).collect())
    for (z, x, y), tile in dec.items():
        attrs = tile["pts"]["features"][0]["attrs"]
        if z < 8:
            assert attrs == {"name": "x"}, f"z{z} should drop 'detail'"
        else:
            assert attrs == {"name": "x", "detail": "y"}


def test_mvt_winding_spec_normalized():
    """All emitted polygon rings follow MVT v2 §4.3.3.3: exterior
    positive area, interior negative (surveyor's formula, y-down tile
    coords) — regardless of the caller's ring convention (round-2
    advice: combined vs un-combined features previously disagreed)."""
    from tilemaker_spark.functions import mvt

    def area(r):
        return sum(r[i][0] * r[(i + 1) % len(r)][1]
                   - r[(i + 1) % len(r)][0] * r[i][1]
                   for i in range(len(r))) / 2.0

    outer_neg = [(0, 0), (0, 100), (100, 100), (100, 0)]   # negative area
    hole_pos = [(25, 25), (75, 25), (75, 75), (25, 75)]    # positive area
    enc = mvt.encode_polygon_geometry([outer_neg, hole_pos])
    # decode via a minimal layer roundtrip
    lb = mvt.LayerBuilder("t")
    lb.add_feature(mvt.GEOM_POLYGON, enc)
    dec = mvt.decode_tile(mvt.encode_tile([lb]))
    rings = dec["t"]["features"][0]["geom"]
    assert area(rings[0]) > 0 and area(rings[1]) < 0
    # opposite input convention (union_many output) -> same result
    enc2 = mvt.encode_polygon_geometry([outer_neg[::-1], hole_pos[::-1]])
    lb2 = mvt.LayerBuilder("t")
    lb2.add_feature(mvt.GEOM_POLYGON, enc2)
    dec2 = mvt.decode_tile(mvt.encode_tile([lb2]))
    rings2 = dec2["t"]["features"][0]["geom"]
    assert area(rings2[0]) > 0 and area(rings2[1]) < 0
    # start vertex preserved by reversal (golden stability)
    assert rings[0][0] == (0, 0) and rings[1][0] == (25, 25)
