"""Relation handling: membership joins, multipolygon assembly, tag
bounce-down.

Reference semantics:
  * J2 relation->way resolution (src/pbf_processor.cpp:294-312)
  * J7 multipolygon ring-stitch (src/osm_store.cpp:64-226): chain member
    ways sharing endpoints into closed rings, assign inner rings to the
    outer that contains them
  * J8 relation-membership lookup (NextRelation/FindInRelation,
    src/osm_lua_processing.cpp:958-975; store include/osm_store.h:97-204)
  * relation_postscan_function tag bounce-down (docs/RELATIONS.md:84-109,
    src/osm_lua_processing.cpp:1005-1017)

Spark shape: membership is a pre-joined DataFrame (the mutable
RelationStore becomes an equi-join); assembly is a per-relation
vectorized UDF over collect_list'ed member geometries — relations are
independent, so the stitch parallelizes embarrassingly after one
shuffle on relation id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.operators.profile import assemble_way_geoms

# Relation-derived features live in a distinct feature-id namespace:
# OSM way ids and relation ids are separate sequences, so a way and a
# relation with the same numeric id can land in the same layer+tile and
# must not dedup/collide (the reference keys OutputObjects by typed
# object ids — src/output_object.h OutputObjectID carries the entity
# type). 2^42 clears the max OSM id (~2^33) with headroom.
RELATION_ID_OFFSET = 1 << 42


# ------------------------------------------------------- membership (J8)

def entity_relations(relations: DataFrame) -> DataFrame:
    """The NextRelation/FindInRelation lookup table:
    (mtype, ref, role, rel_id, rel_tags) — one row per membership."""
    return relations.select(
        F.col("id").alias("rel_id"), F.col("tags").alias("rel_tags"),
        F.explode("members").alias("m")
    ).select("rel_id", "rel_tags", "m.mtype", "m.ref", "m.role")


def find_in_relation(entities: DataFrame, relations: DataFrame,
                     entity_id: str = "id",
                     mtype: str = "way") -> DataFrame:
    """For each entity, the list of parent relations + roles (J8)."""
    er = entity_relations(relations).filter(F.col("mtype") == mtype)
    joined = entities.join(
        er, entities[entity_id] == er.ref, "left")
    # collect_list skips NULL elements but keeps a struct OF nulls —
    # gate on the join key so no-parent entities get [] rather than a
    # phantom [Row(null, null, null)]
    parent = F.when(F.col("rel_id").isNotNull(),
                    F.struct("rel_id", "role", "rel_tags"))
    return (joined.groupBy(entity_id)
            .agg(F.collect_list(parent).alias("parent_relations")))


def flatten_relation_members(relations: DataFrame,
                             max_depth: int = 8) -> DataFrame:
    """Transitive membership closure: relation-type members are replaced
    by their descendants' way/node members, so ancestor relations
    (superroute-style hierarchies, reference docs/RELATIONS.md:84-109,
    src/pbf_processor.cpp:261-345 RELATION members) reach their
    grandchild ways.

    Iterate-to-fixpoint join, bounded by ``max_depth`` (OSM nesting is
    almost always <= 3); each round joins only the remaining
    relation-type frontier — rows, not whole tables, shrink the work.
    Returns (rel_id, rel_tags, mtype, ref, role) with the ANCESTOR's
    id/tags and the leaf member's (mtype, ref); role comes from the leaf
    edge (the reference exposes the child's role to postscan).
    """
    er = entity_relations(relations)
    child = er.select(F.col("rel_id").alias("ref"),
                      F.col("mtype").alias("c_mtype"),
                      F.col("ref").alias("c_ref"),
                      F.col("role").alias("c_role"))
    out = er.filter(F.col("mtype") != "relation")
    frontier = er.filter(F.col("mtype") == "relation")
    for _ in range(max_depth):
        if frontier.isEmpty():
            break
        stepped = (frontier.join(child, "ref", "inner")
                   .select("rel_id", "rel_tags",
                           F.col("c_mtype").alias("mtype"),
                           F.col("c_ref").alias("ref"),
                           F.col("c_role").alias("role")))
        out = out.unionByName(stepped.filter(F.col("mtype") != "relation"))
        frontier = stepped.filter(F.col("mtype") == "relation")
    return out.dropDuplicates(["rel_id", "mtype", "ref", "role"])


def bounce_down_tag(relations: DataFrame, tag: str,
                    flatten: bool = True) -> DataFrame:
    """relation_postscan tag bounce-down: way members inherit ``tag``
    from any ancestor relation that has it (nested hierarchies flattened
    first, so a superroute's name reaches grandchild ways). Ties across
    multiple tagged ancestors resolve to min(value) (deterministic).
    Returns (ref, bounced_value) for ways."""
    er = (flatten_relation_members(relations) if flatten
          else entity_relations(relations))
    er = er.filter(F.col("mtype") == "way")
    val = F.try_element_at("rel_tags", F.lit(tag))
    return (er.filter(val.isNotNull())
            .groupBy("ref")
            .agg(F.min(val).alias(f"bounced_{tag}")))


# ------------------------------------------------- accept pre-pass (scan)

def accepted_relations(relations: DataFrame, predicate=None) -> DataFrame:
    """relation_scan_function + Accept(): keep relations the profile
    accepts. Default: type=multipolygon (the reference always scans MPs,
    src/osm_lua_processing.cpp:985-1002)."""
    if predicate is None:
        predicate = F.try_element_at("tags", F.lit("type")) == "multipolygon"
    return relations.filter(predicate)


# ---------------------------------------------- multipolygon stitch (J7)

def _make_stitch_udf():
    """Per relation: stitch member ways into closed rings, orient, and
    assign inners to their containing outer. Output parts list:
    [outer1, hole1a, hole1b, outer2, ...] as flat [x,y,...] arrays,
    outers wound positive-area, holes negative (iter_polygons convention).
    """

    @pandas_udf("array<array<double>>")
    def _stitch_udf(outers: pd.Series, inners: pd.Series) -> pd.Series:
        return _stitch_series(outers, inners)

    return _stitch_udf


def _stitch_series(outers: pd.Series, inners: pd.Series) -> pd.Series:
    out = []
    for o_ways, i_ways in zip(outers, inners):
        o_ways = [] if o_ways is None else list(o_ways)
        i_ways = [] if i_ways is None else list(i_ways)
        o_rings = G.stitch_rings(
            [np.asarray(w, dtype=np.float64).reshape(-1, 2) for w in o_ways])
        i_rings = G.stitch_rings(
            [np.asarray(w, dtype=np.float64).reshape(-1, 2) for w in i_ways])
        polys = []
        for r in o_rings:
            if G.ring_area(r) < 0:
                r = r[::-1]
            polys.append((r, []))
        for hole in i_rings:
            if G.ring_area(hole) > 0:
                hole = hole[::-1]
            # assign to the outer containing the hole's first vertex
            for outer, holes in polys:
                if G.point_in_ring(float(hole[0, 0]), float(hole[0, 1]),
                                   outer):
                    holes.append(hole)
                    break
        parts = []
        for outer, holes in polys:
            parts.append(outer.reshape(-1).tolist())
            parts.extend(h.reshape(-1).tolist() for h in holes)
        out.append(parts)
    return pd.Series(out)


def net_signed_area(geom_col):
    """Column: sum of signed latp-space shoelace areas over a feature's
    ring parts (outers positive, holes negative per the stitch
    convention) — the SQL-checkable scalar witness for the J2/J7 ring
    stitch. UDF defined lazily (module import must not need a session)."""

    @pandas_udf("double")
    def _net(geom: pd.Series) -> pd.Series:
        return pd.Series([
            float(sum(G.ring_area(np.asarray(p, dtype=np.float64)
                                  .reshape(-1, 2)) for p in parts))
            for parts in geom])

    return _net(geom_col)


def assemble_multipolygons(relations: DataFrame, ways: DataFrame,
                           nodes: DataFrame) -> DataFrame:
    """J2 + J7: (rel_id, tags, geom) with geom the stitched multipolygon
    ring list in (lon, latp).

    Plan: explode members -> equi-join way coords (assemble_way_geoms'
    J1 output) -> groupBy relation collecting outer/inner way coords ->
    per-relation stitch UDF. Relations with no closed outer produce an
    empty geom and are dropped.
    """
    way_coords = assemble_way_geoms(nodes, ways).select(
        F.col("id").alias("ref"), "coords")
    mems = entity_relations(relations).filter(F.col("mtype") == "way")
    joined = mems.join(way_coords, "ref", "inner")
    role = F.when(F.col("role") == "inner", "inner").otherwise("outer")
    grouped = (joined.withColumn("_r", role)
               .groupBy("rel_id")
               .agg(F.collect_list(F.when(F.col("_r") == "outer",
                                          F.col("coords"))).alias("outers"),
                    F.collect_list(F.when(F.col("_r") == "inner",
                                          F.col("coords"))).alias("inners")))
    rel_tags = relations.select(F.col("id").alias("rel_id"), "tags")
    assembled = (grouped
                 .withColumn("geom", _make_stitch_udf()("outers", "inners"))
                 .filter(F.size("geom") > 0)
                 .join(rel_tags, "rel_id")
                 .select("rel_id", "tags", "geom"))
    return assembled


def assemble_route_lines(relations: DataFrame, ways: DataFrame,
                         nodes: DataFrame) -> DataFrame:
    """relation_function for NON-multipolygon relations (routes):
    member way geometries endpoint-chained into as few linestrings as
    possible (reference relation way-merge semantics — the Lua
    relation_function emits the relation as one line object).

    Returns (rel_id, tags, geom) with geom a list of flat [x,y,...]
    line parts in (lon, latp). Same plan shape as multipolygon
    assembly: member explode -> way-coords equi-join -> groupBy
    relation -> per-relation numpy merge (embarrassingly parallel)."""
    way_coords = assemble_way_geoms(nodes, ways).select(
        F.col("id").alias("ref"), "coords")
    mems = entity_relations(relations).filter(F.col("mtype") == "way")
    joined = mems.join(way_coords, "ref", "inner")
    grouped = (joined.groupBy("rel_id")
               .agg(F.collect_list("coords").alias("member_coords")))

    @pandas_udf("array<array<double>>")
    def merge_members(coords_lists: pd.Series) -> pd.Series:
        out = []
        for ways_flat in coords_lists:
            runs = [np.asarray(w, dtype=np.float64).reshape(-1, 2)
                    for w in ways_flat]
            merged = G.merge_lines([r for r in runs if len(r) >= 2])
            out.append([np.asarray(m).reshape(-1).tolist() for m in merged])
        return pd.Series(out)

    rel_tags = relations.select(F.col("id").alias("rel_id"), "tags")
    return (grouped
            .withColumn("geom", merge_members("member_coords"))
            .filter(F.size("geom") > 0)
            .join(rel_tags, "rel_id")
            .select("rel_id", "tags", "geom"))


def features_from_route_relations(relations: DataFrame, ways: DataFrame,
                                  nodes: DataFrame,
                                  route_types=("route",)) -> DataFrame:
    """Route-relation profile: accepted type=route relations emit one
    LINE feature ('routes' layer) with ref/route attrs — the
    relation_function surface for non-multipolygon relations."""
    acc = accepted_relations(
        relations,
        F.try_element_at("tags", F.lit("type")).isin(list(route_types)))
    lines = assemble_route_lines(acc, ways, nodes)
    tags = F.col("tags")
    return lines.select(
        (F.col("rel_id") + F.lit(RELATION_ID_OFFSET)).alias("feature_id"),
        F.lit("routes").alias("layer"),
        F.lit(2).alias("geom_type"),
        F.lit(0).alias("min_zoom"),
        F.lit(0).alias("z_order"),
        F.map_from_arrays(
            F.array(F.lit("route"), F.lit("ref"), F.lit("name")),
            F.array(F.coalesce(F.try_element_at(tags, F.lit("route")), F.lit("")),
                    F.coalesce(F.try_element_at(tags, F.lit("ref")), F.lit("")),
                    F.coalesce(F.try_element_at(tags, F.lit("name")), F.lit(""))))
        .alias("attrs"),
        F.col("geom"),
    )


def features_from_relations(relations: DataFrame, ways: DataFrame,
                            nodes: DataFrame) -> DataFrame:
    """The relations profile (relation_function analog): accepted
    multipolygons emit polygon features — natural=water -> 'water',
    else -> 'landcover'. Schema matches operators.profile.FEATURE_SCHEMA."""
    acc = accepted_relations(relations)
    mp = assemble_multipolygons(acc, ways, nodes)
    tags = F.col("tags")
    is_water = F.try_element_at(tags, F.lit("natural")) == "water"
    return mp.select(
        (F.col("rel_id") + F.lit(RELATION_ID_OFFSET)).alias("feature_id"),
        F.when(is_water, "water").otherwise("landcover").alias("layer"),
        F.lit(3).alias("geom_type"),
        F.lit(0).alias("min_zoom"),
        F.lit(0).alias("z_order"),
        tags.alias("attrs"),
        F.col("geom"),
    )
