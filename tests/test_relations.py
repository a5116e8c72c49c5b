"""Relation assembly (J2/J7/J8) against the FIXTURES.md §3 cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.fixtures import make_relations
from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.operators.relations import (
    accepted_relations,
    assemble_multipolygons,
    bounce_down_tag,
    entity_relations,
    features_from_relations,
    find_in_relation,
)


@pytest.fixture(scope="module")
def rel_data(spark):
    return make_relations(spark)


@pytest.fixture(scope="module")
def assembled(spark, rel_data):
    relations, rel_ways, rel_nodes = rel_data
    mp = assemble_multipolygons(relations, rel_ways, rel_nodes)
    return {r.rel_id: r for r in mp.collect()}


def _polys(row):
    parts = [np.asarray(p, dtype=np.float64).reshape(-1, 2)
             for p in row.geom]
    return G.iter_polygons(parts)


def test_single_closed_outer(assembled):
    polys = _polys(assembled[400001])
    assert len(polys) == 1
    outer, inners = polys[0]
    assert len(inners) == 0
    assert len(outer) == 4  # rectangle, open representation


def test_split_reversed_outer_stitches(assembled):
    """Outer split into 3 open ways (one reversed) must close."""
    polys = _polys(assembled[400002])
    assert len(polys) == 1
    outer, inners = polys[0]
    assert len(outer) >= 4
    assert not inners
    # the stitched ring covers the expected lon span
    assert outer[:, 0].min() == pytest.approx(11.0)
    assert outer[:, 0].max() == pytest.approx(11.1)


def test_outer_with_two_holes(assembled):
    polys = _polys(assembled[400003])
    assert len(polys) == 1
    outer, inners = polys[0]
    assert len(inners) == 2
    # holes wound opposite to outer
    import numpy as _np
    assert G.ring_area(outer) > 0
    for h in inners:
        assert G.ring_area(h) < 0


def test_two_disjoint_outers_one_hole_each(assembled):
    polys = _polys(assembled[400004])
    assert len(polys) == 2
    for outer, inners in polys:
        assert len(inners) == 1
        # each hole lies inside its own outer
        h = inners[0]
        assert G.point_in_ring(float(h[0, 0]), float(h[0, 1]), outer)


def test_label_node_member_ignored(assembled):
    # island_e reuses lake_a's outer way; node member contributes no ring
    polys = _polys(assembled[400005])
    assert len(polys) == 1
    assert not polys[0][1]


def test_membership_lookup(spark, rel_data):
    relations, rel_ways, rel_nodes = rel_data
    er = entity_relations(relations)
    rows = er.filter((F.col("mtype") == "way") & (F.col("ref") == 300001)) \
        .select("rel_id").collect()
    assert sorted(r.rel_id for r in rows) == [400001, 400005]

    fir = find_in_relation(rel_ways, relations, entity_id="id")
    row = {r.id: r.parent_relations for r in fir.collect()}
    assert {p.rel_id for p in row[300001]} == {400001, 400005}
    assert row[300008][0].rel_id == 400004


def test_bounce_down_tag(spark, rel_data):
    relations, _, _ = rel_data
    b = bounce_down_tag(relations, "natural")
    got = {r.ref: r.bounced_natural for r in b.collect()}
    assert got[300001] == "water"    # lake_a member
    assert 300005 not in got         # forest_c parent has no 'natural' tag
    assert got[300008] == "wood"     # wood_d member


def test_features_from_relations(spark, rel_data):
    relations, rel_ways, rel_nodes = rel_data
    feats = features_from_relations(relations, rel_ways, rel_nodes)
    from tilemaker_spark.operators.relations import RELATION_ID_OFFSET
    rows = {r.feature_id - RELATION_ID_OFFSET: r for r in feats.collect()}
    # feature ids are offset into the relation namespace so a way with the
    # same numeric id can never collide in a layer's dedup key
    assert all(r.feature_id >= RELATION_ID_OFFSET for r in rows.values())
    assert rows[400001].layer == "water"
    assert rows[400003].layer == "landcover"
    assert all(r.geom_type == 3 for r in rows.values())


def test_accept_predicate(spark, rel_data):
    relations, _, _ = rel_data
    assert accepted_relations(relations).count() == relations.count()
    none = accepted_relations(
        relations, F.element_at("tags", "type") == "route")
    assert none.count() == 0
