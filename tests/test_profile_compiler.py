"""Declarative profile compiler (the Lua-script analog)."""

import os

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.operators.profile import assemble_way_geoms
from tilemaker_spark.operators.profile_compiler import (
    EXAMPLE_PROFILE,
    compile_node_profile,
    compile_way_profile,
)


@pytest.fixture(scope="module")
def fixture_feats(spark):
    from tilemaker_spark.fixtures import make_nodes_ways
    nodes, ways = make_nodes_ways(spark)
    assembled = assemble_way_geoms(nodes, ways)
    return nodes, assembled


def test_way_rules_match_and_emit(spark, fixture_feats):
    nodes, assembled = fixture_feats
    feats = compile_way_profile(EXAMPLE_PROFILE)(assembled)
    by_layer = {r["layer"]: r["n"] for r in
                feats.groupBy("layer").agg(F.count("*").alias("n")).collect()}
    assert by_layer.get("roads", 0) > 5
    assert by_layer.get("buildings", 0) > 5
    assert by_layer.get("water", 0) > 0
    r = feats.filter(F.col("layer") == "roads").first()
    assert r.attrs["class"] in ("primary", "minor")
    assert r.geom_type == 2
    assert r.attr_minzoom == {"name": 12}


def test_min_zoom_map(spark, fixture_feats):
    _, assembled = fixture_feats
    feats = compile_way_profile(EXAMPLE_PROFILE)(assembled)
    zooms = {r.attrs["class"]: r.min_zoom
             for r in feats.filter(F.col("layer") == "roads").collect()}
    assert zooms.get("primary") == 7
    assert zooms.get("minor") == 12  # default


def test_node_rules(spark, fixture_feats):
    nodes, _ = fixture_feats
    feats = compile_node_profile(EXAMPLE_PROFILE)(nodes)
    rows = feats.collect()
    assert len(rows) > 10  # the fixture sprinkles amenity=cafe POIs
    assert all(r.layer == "poi" and r.geom_type == 1 for r in rows)
    assert all(r.attrs["kind"] == "cafe" for r in rows)


def test_negation_and_list_match(spark):
    rules = [
        {"match": {"highway": "*", "access": "!private"}, "geometry": "line",
         "emit": {"layer": "public_roads", "attrs": {}}},
    ]
    rows = [
        (1, [1, 2], {"highway": "a"}),
        (2, [1, 2], {"highway": "a", "access": "private"}),
        (3, [1, 2], {"highway": "a", "access": "yes"}),
    ]
    assembled = spark.createDataFrame(
        [(i, refs, tags, [0.0, 0.0, 1.0, 1.0]) for i, refs, tags in rows],
        "id long, refs array<long>, tags map<string,string>, "
        "coords array<double>")
    feats = compile_way_profile(rules)(assembled)
    assert {r.feature_id for r in feats.collect()} == {1, 3}


@pytest.mark.skipif(not os.path.exists("/root/reference/test/monaco.pbf"),
                    reason="monaco fixture unavailable")
def test_monaco_with_declarative_profile(spark):
    """Real-data: monaco.pbf through the declarative profile -> layers
    with per-class min zoom (the switch-from-reference user path)."""
    from tilemaker_spark import sources_pbf
    nodes, ways, _ = sources_pbf.read_pbf_tables(
        spark, "/root/reference/test/monaco.pbf")
    assembled = assemble_way_geoms(nodes, ways)
    feats = compile_way_profile(EXAMPLE_PROFILE)(assembled)
    layers = {r["layer"] for r in feats.select("layer").distinct().collect()}
    assert {"roads", "buildings"} <= layers
    pois = compile_node_profile(EXAMPLE_PROFILE)(nodes)
    assert pois.count() > 10


def test_layer_as_centroid_emitter(spark):
    """LayerAsCentroid: a closed building way emits ONE point feature at
    its centroid (and polylabel stays inside a concave ring)."""
    from tilemaker_spark.functions.coords import lat2latp
    from tilemaker_spark.functions import geomnp as G
    from tilemaker_spark.operators.profile_compiler import compile_way_profile
    import numpy as np

    # assembled-way rows: square building + concave L landuse
    sq = []
    for lon, lat in [(10.0, 40.0), (10.2, 40.0), (10.2, 40.2),
                     (10.0, 40.2), (10.0, 40.0)]:
        sq.extend([lon, lat2latp(lat)])
    L = []
    for lon, lat in [(20.0, 40.0), (20.3, 40.0), (20.3, 40.1),
                     (20.1, 40.1), (20.1, 40.3), (20.0, 40.3),
                     (20.0, 40.0)]:
        L.extend([lon, lat2latp(lat)])
    rows = [
        (1, {"building": "yes", "name": "sq"}, [1, 2, 3, 4, 1], sq),
        (2, {"landuse": "forest"}, [5, 6, 7, 8, 9, 10, 5], L),
    ]
    assembled = spark.createDataFrame(
        rows, "id long, tags map<string,string>, refs array<long>, "
              "coords array<double>")
    rules = [
        {"match": {"building": "*"}, "geometry": "centroid",
         "emit": {"layer": "building_labels", "min_zoom": 12,
                  "attrs": {"name": "$name"}}},
        {"match": {"landuse": "*"}, "geometry": "centroid",
         "algorithm": "polylabel",
         "emit": {"layer": "landuse_labels", "attrs": {}}},
    ]
    feats = {r.feature_id: r for r in
             compile_way_profile(rules)(assembled).collect()}
    b = feats[1]
    assert b.layer == "building_labels" and b.geom_type == 1
    cx, cy = b.geom[0]
    assert cx == pytest.approx(10.1, abs=1e-9)
    assert cy == pytest.approx(lat2latp(40.1), abs=1e-3)
    assert b.attrs["name"] == "sq"
    # polylabel point must be INSIDE the concave L (bbox center is not)
    lx, ly = feats[2].geom[0]
    ring = np.asarray(L, dtype=np.float64).reshape(-1, 2)
    assert G.point_in_ring(lx, ly, ring[:-1])


def test_relation_profile_rules(spark):
    """Declarative relation_function: multipolygon relations routed by
    tag rules into layers, with a centroid-label rule alongside."""
    from tilemaker_spark.fixtures import make_relations
    from tilemaker_spark.operators.profile_compiler import (
        compile_relation_profile)
    from tilemaker_spark.operators.relations import (
        RELATION_ID_OFFSET, accepted_relations, assemble_multipolygons)

    relations, rel_ways, rel_nodes = make_relations(spark)
    mp = assemble_multipolygons(accepted_relations(relations),
                                rel_ways, rel_nodes)
    rules = [
        {"match": {"natural": "water"}, "geometry": "polygon",
         "emit": {"layer": "water", "attrs": {"name": "$name"}}},
        {"match": {"natural": "!water"}, "geometry": "polygon",
         "emit": {"layer": "landcover", "attrs": {}}},
        {"match": {"natural": "water"}, "geometry": "centroid",
         "emit": {"layer": "water_labels", "min_zoom": 10,
                  "attrs": {"name": "$name"}}},
    ]
    feats = compile_relation_profile(rules)(mp).collect()
    by_layer = {}
    for f in feats:
        by_layer.setdefault(f.layer, []).append(f)
    assert "water" in by_layer and "landcover" in by_layer
    assert all(f.geom_type == 3 for f in by_layer["water"])
    assert all(f.feature_id >= RELATION_ID_OFFSET for f in feats)
    # centroid labels: one point per water relation, inside bbox of geom
    labels = by_layer["water_labels"]
    assert labels and all(f.geom_type == 1 for f in labels)
    assert len(labels) == len(by_layer["water"])
    for lab in labels:
        assert len(lab.geom) == 1 and len(lab.geom[0]) == 2
