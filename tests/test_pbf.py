"""OSM PBF scan (S1/S2) against the reference's monaco.pbf fixture.

The fixture is REAL OpenStreetMap data (test/monaco.pbf in the
reference repo — used read-only as input data, not code)."""

import os

import pytest
from pyspark.sql import functions as F

from tilemaker_spark import sources_pbf

MONACO = "/root/reference/test/monaco.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MONACO), reason="monaco fixture unavailable")


def test_header_probe():
    info = sources_pbf.read_pbf_header(MONACO)
    assert "DenseNodes" in info["features"]
    x0, y0, x1, y1 = info["bbox"]
    assert 7.3 < x0 < 7.5 and 7.3 < x1 < 7.5
    assert 43.6 < min(y0, y1) < 43.8


@pytest.fixture(scope="module")
def tables(spark):
    nodes, ways, relations = sources_pbf.read_pbf_tables(spark, MONACO)
    return (nodes.cache(), ways.cache(), relations.cache())


def test_entity_counts(tables):
    nodes, ways, relations = tables
    n, w, r = nodes.count(), ways.count(), relations.count()
    assert n > 10000      # monaco has ~30k nodes
    assert w > 1000
    assert r > 100


def test_node_coordinates_in_bbox(tables):
    nodes, _, _ = tables
    row = nodes.agg(F.min("lon"), F.max("lon"),
                    F.min("lat"), F.max("lat")).first()
    assert 7.3 < row[0] and row[1] < 7.6
    assert 43.5 < row[2] and row[3] < 43.9


def test_tags_decoded(tables):
    nodes, ways, _ = tables
    named = ways.filter(F.map_contains_key("tags", "highway")).count()
    assert named > 100
    amenities = nodes.filter(F.map_contains_key("tags", "amenity")).count()
    assert amenities > 10


def test_way_refs_resolve(tables):
    """J1 integrity: the vast majority of way refs exist in nodes."""
    nodes, ways, _ = tables
    refs = ways.select(F.explode("refs").alias("ref")).distinct()
    n_refs = refs.count()
    resolved = refs.join(nodes.select(F.col("id").alias("ref")), "ref",
                         "left_semi").count()
    assert resolved / n_refs > 0.99


def test_relations_have_members(tables):
    _, _, relations = tables
    mp = relations.filter(
        F.element_at("tags", "type") == "multipolygon")
    assert mp.count() > 10
    r = mp.first()
    assert len(r.members) >= 1
    assert r.members[0].mtype in ("node", "way", "relation")


def test_monaco_end_to_end_tiles(spark, tables):
    """The real-data flagship: monaco.pbf -> ways profile -> MVT tiles."""
    from tilemaker_spark.config import default_config
    from tilemaker_spark.operators.profile import features_from_ways
    from tilemaker_spark.operators.tile_assembly import assemble_tiles
    from tilemaker_spark.operators.tiling import ancestor_rollup, cover_explode

    nodes, ways, _ = tables
    cfg = default_config()
    cfg.basezoom = 14
    cfg.compress = "none"
    feats = features_from_ways(nodes, ways)
    assert feats.count() > 500
    ft = cover_explode(feats, 14)
    ft = ancestor_rollup(ft, 10, 14)
    ft = ft.filter(F.col("z") >= F.col("min_zoom"))
    tiles = assemble_tiles(ft, cfg)
    rows = tiles.collect()
    # Monaco spans only ~3x3 tiles at z14 (plus one per zoom 10-13)
    assert len(rows) >= 10
    # Monaco z14 tiles are around x=8530, y=5974
    z14 = [r for r in rows if r.z == 14]
    assert any(8525 < r.x < 8535 and 5970 < r.y < 5980 for r in z14)
    from tilemaker_spark.functions import mvt
    biggest = max(z14, key=lambda r: r.n_bytes)
    dec = mvt.decode_tile(bytes(biggest.tile))
    assert "roads" in dec or "buildings" in dec or "water" in dec
