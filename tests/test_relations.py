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


def test_nested_relation_flatten(spark):
    """Superroute hierarchy: top(rel) -> mid(rel) -> way; the grandchild
    way inherits the top relation's tag through the flattened closure."""
    from tilemaker_spark.operators.relations import (
        bounce_down_tag, flatten_relation_members)
    rels = spark.createDataFrame(
        [
            # top superroute: tagged, members = one relation
            (9001, [{"mtype": "relation", "ref": 9002, "role": ""}],
             {"type": "superroute", "name": "TopRoute"}),
            # mid route: untagged name, members = one way + one node
            (9002, [{"mtype": "way", "ref": 777, "role": "forward"},
                    {"mtype": "node", "ref": 42, "role": "stop"}],
             {"type": "route"}),
            # unrelated flat relation
            (9003, [{"mtype": "way", "ref": 888, "role": ""}],
             {"type": "route", "name": "FlatRoute"}),
        ],
        "id long, members array<struct<mtype:string,ref:long,role:string>>, "
        "tags map<string,string>")
    flat = flatten_relation_members(rels)
    rows = {(r.rel_id, r.mtype, r.ref): r for r in flat.collect()}
    # ancestor 9001 now reaches way 777 and node 42 with leaf roles
    assert (9001, "way", 777) in rows
    assert rows[(9001, "way", 777)].role == "forward"
    assert (9001, "node", 42) in rows
    # direct memberships intact
    assert (9002, "way", 777) in rows
    assert (9003, "way", 888) in rows
    # no relation-type members survive
    assert all(k[1] != "relation" for k in rows)

    b = bounce_down_tag(rels, "name")
    got = {r.ref: r.bounced_name for r in b.collect()}
    assert got[777] == "TopRoute"   # inherited from the grandparent
    assert got[888] == "FlatRoute"


def test_nested_relation_cycle_terminates(spark):
    """A membership cycle (invalid but occurs in the wild) must not hang:
    the depth bound cuts it."""
    from tilemaker_spark.operators.relations import flatten_relation_members
    rels = spark.createDataFrame(
        [
            (1, [{"mtype": "relation", "ref": 2, "role": ""},
                 {"mtype": "way", "ref": 10, "role": ""}], {"name": "a"}),
            (2, [{"mtype": "relation", "ref": 1, "role": ""},
                 {"mtype": "way", "ref": 20, "role": ""}], {"name": "b"}),
        ],
        "id long, members array<struct<mtype:string,ref:long,role:string>>, "
        "tags map<string,string>")
    flat = flatten_relation_members(rels, max_depth=4)
    rows = {(r.rel_id, r.ref) for r in flat.filter("mtype = 'way'").collect()}
    assert (1, 10) in rows and (1, 20) in rows
    assert (2, 10) in rows and (2, 20) in rows


def test_route_relation_merged_lines(spark):
    """relation_function for routes: member ways chain into one line;
    disconnected members stay separate parts."""
    from tilemaker_spark.functions.coords import lat2latp
    from tilemaker_spark.operators.relations import (
        RELATION_ID_OFFSET, features_from_route_relations)

    def way(wid, pts, refs):
        return (wid, refs, {})

    nodes_rows = []
    nid = 1
    coords = {}
    for lon, lat in [(0.0, 40.0), (0.1, 40.0), (0.2, 40.05),
                     (0.3, 40.1), (1.0, 41.0), (1.1, 41.0)]:
        nodes_rows.append((nid, lat, lon, {}))
        coords[nid] = (lon, lat)
        nid += 1
    nodes = spark.createDataFrame(
        nodes_rows, "id long, lat double, lon double, tags map<string,string>")
    ways = spark.createDataFrame(
        [
            (100, [1, 2], {}),       # chainable
            (101, [2, 3], {}),       # chainable (shares node 2)
            (102, [3, 4], {}),       # chainable (shares node 3)
            (103, [5, 6], {}),       # disconnected spur
        ], "id long, refs array<long>, tags map<string,string>")
    rels = spark.createDataFrame(
        [(7000,
          [{"mtype": "way", "ref": w, "role": ""} for w in (100, 101, 102, 103)],
          {"type": "route", "route": "hiking", "ref": "E1", "name": "Trail"})],
        "id long, members array<struct<mtype:string,ref:long,role:string>>, "
        "tags map<string,string>")

    feats = features_from_route_relations(rels, ways, nodes).collect()
    assert len(feats) == 1
    f = feats[0]
    assert f.feature_id == 7000 + RELATION_ID_OFFSET
    assert f.layer == "routes" and f.geom_type == 2
    assert f.attrs["route"] == "hiking" and f.attrs["ref"] == "E1"
    parts = [list(p) for p in f.geom]
    # three chainable ways merged into ONE part + the spur = 2 parts
    assert len(parts) == 2
    lens = sorted(len(p) // 2 for p in parts)
    assert lens == [2, 4]  # spur has 2 points, chained line has 4
