"""End-to-end pipeline tests (M1 slice + lines/polygons + invariants)."""

import gzip
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import default_config
from tilemaker_spark.fixtures import make_nodes_ways, make_pages
from tilemaker_spark.functions import mvt
from tilemaker_spark.operators.geocode import geocode_pages
from tilemaker_spark.operators.profile import features_from_pages, features_from_ways
from tilemaker_spark.operators.tiling import ancestor_rollup, cover_explode
from tilemaker_spark.plans.pipeline import TilePipeline

N_PAGES = 2000


@pytest.fixture(scope="module")
def pages(spark):
    return make_pages(spark, N_PAGES).cache()


def test_geocode_bounds(pages):
    geo = geocode_pages(pages)
    row = geo.agg(F.min("lon"), F.max("lon"), F.min("lat"), F.max("lat")).first()
    assert row[0] >= -180.0 and row[1] <= 180.0
    assert row[2] >= -85.0 and row[3] <= 85.1


def test_geocode_hot_spot(pages):
    geo = geocode_pages(pages)
    # hot square: lon in [-74.08, -73.88], lat in [40.65, 40.85]
    hot = geo.filter((F.col("lon").between(-74.09, -73.87))
                     & (F.col("lat").between(40.64, 40.86))).count()
    # 20% of rows land in the city square
    assert abs(hot - N_PAGES // 5) < N_PAGES * 0.02


def test_features_schema_and_invariant(pages):
    feats = features_from_pages(pages)
    assert set(["feature_id", "layer", "geom_type", "min_zoom", "z_order",
                "attrs", "geom", "url", "text"]) <= set(feats.columns)
    # per-row invariant: text passes through byte-identical, no dup/drop
    orig = pages.select("url", F.sha2("text", 256).alias("h"))
    out = feats.select("url", F.sha2("text", 256).alias("h"))
    assert orig.exceptAll(out).count() == 0
    assert out.exceptAll(orig).count() == 0


def test_point_cover_matches_column_math(pages, spark):
    feats = features_from_pages(pages).drop("url", "text")
    ft = cover_explode(feats, 14)
    # independent check: tile ids recomputed from lon/lat in SQL
    geo = geocode_pages(pages)
    expect = geo.select(
        F.col("doc_id").alias("feature_id"),
        F.floor((F.col("lon") + 180.0) / 360.0 * (1 << 14)).cast("long").alias("ex"),
        F.floor((180.0 - F.degrees(F.log(F.tan(F.radians(
            F.least(F.greatest(F.col("lat"), F.lit(-85.06)), F.lit(85.06))
            + F.lit(90.0)) / 2.0)))) / 360.0 * (1 << 14)).cast("long").alias("ey"),
    )
    j = ft.join(expect, "feature_id")
    assert j.filter((F.col("x") != F.col("ex")) | (F.col("y") != F.col("ey"))).count() == 0


def test_rollup_parents(spark, pages):
    feats = features_from_pages(pages).drop("url", "text").limit(50)
    ft = cover_explode(feats, 14)
    rolled = ancestor_rollup(ft, 0, 14)
    zs = [r[0] for r in rolled.select("z").distinct().collect()]
    assert sorted(zs) == list(range(0, 15))
    # at z0 everything is tile (0,0)
    z0 = rolled.filter("z = 0").select("x", "y").distinct().collect()
    assert len(z0) == 1 and z0[0][0] == 0 and z0[0][1] == 0


def test_way_features(spark):
    nodes, ways = make_nodes_ways(spark)
    feats = features_from_ways(nodes, ways)
    by_layer = dict(feats.groupBy("layer").count().collect())
    assert by_layer.get("roads", 0) > 0
    assert by_layer.get("buildings", 0) > 0
    assert by_layer.get("water", 0) > 0
    # broken-ref way must be dropped (reference skips ways w/ missing nodes)
    assert feats.filter(F.col("attrs")["class"] == "broken").count() == 0


def test_e2e_pipeline_points_and_ways(spark, pages, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("run"))
    nodes, ways = make_nodes_ways(spark)
    cfg = default_config()
    cfg.maxzoom = 14
    pipe = TilePipeline(spark, cfg, workdir=workdir)
    tiles = pipe.run(pages, nodes, ways)
    n = tiles.count()
    assert n > 0
    row = tiles.first()
    assert row.tile is not None and len(row.tile) > 0
    # decode a z14 tile and verify it contains valid layers
    t14 = tiles.filter("z = 14 and n_features > 0").first()
    decoded = mvt.decode_tile(gzip.decompress(bytes(t14.tile)))
    assert len(decoded) > 0
    for lname, layer in decoded.items():
        assert layer["extent"] == 4096
        for f in layer["features"]:
            for part in f["geom"]:
                for (px, py) in part:
                    assert -25 <= px <= 4121  # within extent + 0.5% margin

    # resume: second run must reuse checkpoints (no recompute)
    pipe2 = TilePipeline(spark, cfg, workdir=workdir)
    tiles2 = pipe2.run(pages, nodes, ways)
    assert tiles2.count() == n
    assert pipe2.metrics["stages"]["features"].get("resumed") is True


def test_roads_are_lines_in_tiles(spark, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("run_roads"))
    nodes, ways = make_nodes_ways(spark)
    feats = features_from_ways(nodes, ways)
    cfg = default_config()
    from tilemaker_spark.operators.tile_assembly import assemble_tiles
    from tilemaker_spark.operators.tiling import zoom_gates

    ft = cover_explode(feats, 14)
    ft = ancestor_rollup(ft, 10, 14)
    ft = zoom_gates(ft, {n: (lc.minzoom, lc.maxzoom) for n, lc in cfg.layers.items()})
    tiles = assemble_tiles(ft, cfg)
    got = tiles.filter("z = 14").collect()
    assert len(got) > 0
    found_line = found_poly = False
    for r in got:
        decoded = mvt.decode_tile(gzip.decompress(bytes(r.tile)))
        for lname, layer in decoded.items():
            for f in layer["features"]:
                if f["type"] == mvt.GEOM_LINESTRING:
                    found_line = True
                if f["type"] == mvt.GEOM_POLYGON:
                    found_poly = True
    assert found_line and found_poly


def test_bbox_tile_filter(spark, pages):
    """F6: out-of-box tiles are pruned; in-box tiles survive untouched;
    world bbox is a no-op."""
    from tilemaker_spark.operators.tiling import bbox_tile_filter
    feats = features_from_pages(pages).drop("url", "text")
    ft = cover_explode(feats, 10)
    ft = ancestor_rollup(ft, 0, 10)
    bbox = (-75.0, 39.8, -73.0, 41.5)  # around the hot city
    kept = bbox_tile_filter(ft, bbox)
    # world bbox: identical row count (no-op path)
    assert bbox_tile_filter(ft, (-180.0, -85.06, 180.0, 85.06)).count() \
        == ft.count()
    # every surviving tile's envelope intersects the bbox (checked via
    # independent scalar math), and at least the hot-city tiles survive
    from tilemaker_spark.functions.coords import lat2latp_np
    latp_lo = float(lat2latp_np(np.array([39.8]))[0])
    latp_hi = float(lat2latp_np(np.array([41.5]))[0])
    rows = kept.select("z", "x", "y").distinct().collect()
    assert rows
    for r in rows:
        n = 1 << r.z
        xmin = max(0, int(np.floor((-75.0 + 180.0) / 360.0 * n)))
        xmax = min(n - 1, int(np.floor((-73.0 + 180.0) / 360.0 * n)))
        ymin = max(0, int(np.floor((180.0 - latp_hi) / 360.0 * n)))
        ymax = min(n - 1, int(np.floor((180.0 - latp_lo) / 360.0 * n)))
        assert xmin <= r.x <= xmax and ymin <= r.y <= ymax, (r, xmin, xmax)
    # hot-city z10 tile is inside the box and must survive
    assert kept.filter((F.col("z") == 10)).count() > 0
    # pruning really removed something (world has far more tiles)
    assert kept.count() < ft.count()
