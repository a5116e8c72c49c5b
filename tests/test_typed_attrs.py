"""Typed MVT attributes (F2), tag reject-lists (F1), z-order key (O3)."""

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import EngineConfig, LayerConfig
from tilemaker_spark.functions import mvt
from tilemaker_spark.functions.coords import lat2latp, zorder_key_col
from tilemaker_spark.operators.profile import tag_filter
from tilemaker_spark.operators.tile_assembly import assemble_tiles
from tilemaker_spark.operators.tiling import cover_explode


def test_typed_attrs_roundtrip(spark):
    cfg = EngineConfig(basezoom=8, minzoom=8, maxzoom=8, compress="none",
                      hot_tile_salt=0)
    cfg.layers["pts"] = LayerConfig(name="pts")
    rows = [(1, "pts", 1, 0, 0, {"name": "x"}, {"height": 12.5},
             {"lit": True}, [[10.0, lat2latp(40.0)]])]
    feats = spark.createDataFrame(
        rows, "feature_id long, layer string, geom_type int, min_zoom int, "
              "z_order int, attrs map<string,string>, "
              "attrs_num map<string,double>, attrs_bool map<string,boolean>, "
              "geom array<array<double>>")
    tiles = assemble_tiles(cover_explode(feats, 8), cfg).collect()
    assert len(tiles) == 1
    dec = mvt.decode_tile(bytes(tiles[0].tile))
    attrs = dec["pts"]["features"][0]["attrs"]
    assert attrs["name"] == "x"
    assert attrs["height"] == pytest.approx(12.5)
    assert attrs["lit"] is True


def test_tag_filter_accept_and_reject(spark):
    df = spark.createDataFrame(
        [(1, {"highway": "primary"}),
         (2, {"building": "yes"}),
         (3, {"highway": "minor", "name": "x"}),
         (4, {"created_by": "bot"})],
        "id long, tags map<string,string>")
    # accept-list: k, k=v
    acc = df.filter(tag_filter(F.col("tags"), ["highway=primary", "building"]))
    assert {r.id for r in acc.collect()} == {1, 2}
    # negation entry: ~name admits rows WITHOUT the key
    neg = df.filter(tag_filter(F.col("tags"), ["~name"]))
    assert {r.id for r in neg.collect()} == {1, 2, 4}
    # reject-list: drop rows matching any entry
    rej = df.filter(tag_filter(F.col("tags"), ["created_by"], reject=True))
    assert {r.id for r in rej.collect()} == {1, 2, 3}


def test_zorder_key_properties(spark):
    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y"))
    rows = df.withColumn("k", zorder_key_col(F.col("x"), F.col("y"), bits=3)) \
        .collect()
    keys = {(r.x, r.y): r.k for r in rows}
    assert len(set(keys.values())) == 64        # bijective on the grid
    assert keys[(0, 0)] == 0
    assert keys[(1, 0)] == 1                    # x -> even bits
    assert keys[(0, 1)] == 2                    # y -> odd bits
    assert keys[(7, 7)] == 63
    # locality: a 2x2 block is a contiguous key run
    block = sorted(keys[(x, y)] for x in (2, 3) for y in (2, 3))
    assert block == list(range(block[0], block[0] + 4))
