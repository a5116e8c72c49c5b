"""Declarative profile compiler — the engine's user-programmability
surface, replacing the reference's Lua script
(node_function/way_function, src/osm_lua_processing.cpp:237-286;
emitters :571-802).

A profile is plain data (JSON-able): a list of rules, each with a tag
`match` predicate and an `emit` spec. The compiler turns rules into
Column expressions, so user logic runs JVM-side under whole-stage
codegen — the Spark-first answer to "the Lua script is the UDF
surface". One input row can match several rules (1→n emit, like
multiple Layer() calls per object).

Rule schema::

    {
      "match":   {"highway": "*",          # key present (any value)
                  "area": "!yes",          # key absent-or-not-equal
                  "natural": ["water", "bay"]},   # value in list
      "geometry": "point" | "line" | "polygon",   # which inputs apply
      "emit": {
        "layer": "roads",
        "min_zoom": 9,                      # int, or
        "min_zoom_map": {"tag": "highway",  # per-value map + default
                         "map": {"primary": 4}, "default": 9},
        "z_order_tag": "layer",             # numeric tag -> z_order
        "attrs": {"class": "$highway",      # $key -> tag value
                  "name": "$name",
                  "kind": "road"},          # literal otherwise
        "attr_minzoom": {"name": 12}
      }
    }

Closed ways are polygons when the rule's geometry is 'polygon'
(area semantics, Layer(name, true)); ``"geometry": "centroid"`` is the
LayerAsCentroid emitter (reference src/osm_lua_processing.cpp:707-751):
a closed way emits ONE point feature at its shoelace centroid, or the
pole of inaccessibility with ``"algorithm": "polylabel"``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tilemaker_spark.functions import geomnp as G

_GEOM_CODE = {"point": 1, "line": 2, "polygon": 3, "centroid": 1}


def _centroid_udf(algo: str):
    """LayerAsCentroid geometry: ring flat-coords -> [[cx, cy]] point."""

    @pandas_udf("array<array<double>>")
    def cent(rings: pd.Series) -> pd.Series:
        out = []
        for flat in rings:
            a = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
            if algo == "polylabel":
                cx, cy = G.polylabel_xy([a])
            else:
                cx, cy = G.centroid_xy([a], G.GEOM_POLYGON)
            out.append([[float(cx), float(cy)]])
        return pd.Series(out)

    return cent


def _match_predicate(match: dict, tags: Column) -> Column:
    """Compile a match spec into one boolean Column (AND of entries)."""
    cond = F.lit(True)
    for key, want in (match or {}).items():
        val = F.try_element_at(tags, F.lit(key))
        if want == "*":
            c = val.isNotNull()
        elif isinstance(want, list):
            c = val.isin([str(w) for w in want])
        elif isinstance(want, str) and want.startswith("!"):
            c = val.isNull() | (val != want[1:])
        else:
            c = val == str(want)
        cond = cond & c
    return cond


def _emit_min_zoom(emit: dict, tags: Column) -> Column:
    if "min_zoom_map" in emit:
        spec = emit["min_zoom_map"]
        val = F.try_element_at(tags, F.lit(spec["tag"]))
        out = F.lit(int(spec.get("default", 0)))
        for k, z in spec.get("map", {}).items():
            out = F.when(val == k, F.lit(int(z))).otherwise(out)
        return out.cast("int")
    return F.lit(int(emit.get("min_zoom", 0))).cast("int")


def _emit_attrs(emit: dict, tags: Column) -> Column:
    keys, vals = [], []
    for out_key, spec in emit.get("attrs", {}).items():
        keys.append(F.lit(out_key))
        if isinstance(spec, str) and spec.startswith("$"):
            vals.append(F.coalesce(F.try_element_at(tags, F.lit(spec[1:])), F.lit("")))
        else:
            vals.append(F.lit(str(spec)))
    if not keys:
        return F.expr("map()").cast("map<string,string>")
    return F.map_from_arrays(F.array(*keys), F.array(*vals))


def _emit_attr_minzoom(emit: dict) -> Column:
    amz = emit.get("attr_minzoom") or {}
    if not amz:
        return F.expr("map()").cast("map<string,int>")
    keys = [F.lit(k) for k in amz]
    vals = [F.lit(int(v)) for v in amz.values()]
    return F.map_from_arrays(F.array(*keys), F.array(*vals))


def _emit_z_order(emit: dict, tags: Column) -> Column:
    if "z_order_tag" in emit:
        return F.coalesce(
            F.try_element_at(tags, F.lit(emit["z_order_tag"])).cast("int"), F.lit(0))
    return F.lit(int(emit.get("z_order", 0))).cast("int")


def compile_way_profile(rules: list):
    """Compile rules into a function (assembled_ways -> features).

    assembled_ways: output of ``profile.assemble_way_geoms`` —
    (id, tags, refs, coords flat [lon,latp,...]).
    Each matching rule emits one feature row (union over rules).
    """

    def apply(assembled: DataFrame) -> DataFrame:
        tags = F.col("tags")
        is_closed = (F.element_at("refs", 1) == F.element_at("refs", -1)) \
            & (F.size("refs") >= 4)
        ring_coords = F.slice(F.col("coords"), 1, F.size("coords") - 2)
        outs = []
        for rule in rules:
            geom_kind = rule.get("geometry", "line")
            gcode = _GEOM_CODE[geom_kind]
            pred = _match_predicate(rule.get("match"), tags)
            if geom_kind == "polygon":
                pred = pred & is_closed
                geom = F.array(ring_coords)
            elif geom_kind == "centroid":
                # LayerAsCentroid: closed way -> one labeled point
                pred = pred & is_closed
                geom = _centroid_udf(rule.get("algorithm", "centroid"))(
                    ring_coords)
            elif geom_kind == "line":
                pred = pred & ~is_closed
                geom = F.array(F.col("coords"))
            else:
                geom = F.array(F.slice(F.col("coords"), 1, 2))
            emit = rule["emit"]
            outs.append(assembled.filter(pred).select(
                F.col("id").alias("feature_id"),
                F.lit(emit["layer"]).alias("layer"),
                F.lit(gcode).alias("geom_type"),
                _emit_min_zoom(emit, tags).alias("min_zoom"),
                _emit_z_order(emit, tags).alias("z_order"),
                _emit_attrs(emit, tags).alias("attrs"),
                _emit_attr_minzoom(emit).alias("attr_minzoom"),
                geom.alias("geom")))
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result

    return apply


def compile_node_profile(rules: list):
    """Compile rules for node inputs: (id, lat, lon, tags) -> features.
    Rules with geometry != 'point' are ignored for nodes."""
    from tilemaker_spark.functions.coords import lat2latp_col

    def apply(nodes: DataFrame) -> DataFrame:
        tags = F.col("tags")
        geom = F.array(F.array(F.col("lon"), lat2latp_col(F.col("lat"))))
        outs = []
        for rule in rules:
            if rule.get("geometry", "point") != "point":
                continue
            emit = rule["emit"]
            outs.append(nodes.filter(
                _match_predicate(rule.get("match"), tags)).select(
                F.col("id").alias("feature_id"),
                F.lit(emit["layer"]).alias("layer"),
                F.lit(1).alias("geom_type"),
                _emit_min_zoom(emit, tags).alias("min_zoom"),
                _emit_z_order(emit, tags).alias("z_order"),
                _emit_attrs(emit, tags).alias("attrs"),
                _emit_attr_minzoom(emit).alias("attr_minzoom"),
                geom.alias("geom")))
        if not outs:
            raise ValueError("no point rules in profile")
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result

    return apply


def compile_relation_profile(rules: list):
    """Compile rules for assembled multipolygon relations
    (relation_function surface, declaratively): input is
    ``relations.assemble_multipolygons`` output (rel_id, tags, geom).
    Rules with geometry != 'polygon'/'centroid' are ignored. Feature ids
    land in the relation namespace (RELATION_ID_OFFSET)."""
    from tilemaker_spark.operators.relations import RELATION_ID_OFFSET

    def apply(assembled: DataFrame) -> DataFrame:
        tags = F.col("tags")
        outs = []
        for rule in rules:
            geom_kind = rule.get("geometry", "polygon")
            if geom_kind not in ("polygon", "centroid"):
                continue
            emit = rule["emit"]
            if geom_kind == "centroid":
                # centroid of the first (outer) ring
                geom = _centroid_udf(rule.get("algorithm", "centroid"))(
                    F.col("geom").getItem(0))
                gcode = 1
            else:
                geom = F.col("geom")
                gcode = 3
            outs.append(assembled.filter(
                _match_predicate(rule.get("match"), tags)).select(
                (F.col("rel_id") + F.lit(RELATION_ID_OFFSET))
                .alias("feature_id"),
                F.lit(emit["layer"]).alias("layer"),
                F.lit(gcode).alias("geom_type"),
                _emit_min_zoom(emit, tags).alias("min_zoom"),
                _emit_z_order(emit, tags).alias("z_order"),
                _emit_attrs(emit, tags).alias("attrs"),
                _emit_attr_minzoom(emit).alias("attr_minzoom"),
                geom.alias("geom")))
        if not outs:
            raise ValueError("no polygon/centroid rules in profile")
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result

    return apply


# The reference's example profile (resources/process-example.lua:38-94)
# re-expressed declaratively — used by tests and the monaco e2e.
EXAMPLE_PROFILE = [
    {"match": {"highway": "*"}, "geometry": "line",
     "emit": {"layer": "roads",
              "min_zoom_map": {"tag": "highway",
                               "map": {"motorway": 4, "trunk": 4,
                                       "primary": 7, "secondary": 9},
                               "default": 12},
              "attrs": {"class": "$highway", "name": "$name"},
              "attr_minzoom": {"name": 12}}},
    {"match": {"building": "*"}, "geometry": "polygon",
     "emit": {"layer": "buildings", "min_zoom": 9,
              "attrs": {}}},
    {"match": {"natural": ["water", "bay"]}, "geometry": "polygon",
     "emit": {"layer": "water", "min_zoom": 0,
              "attrs": {"name": "$name"}}},
    {"match": {"amenity": "*"}, "geometry": "point",
     "emit": {"layer": "poi", "min_zoom": 12,
              "attrs": {"kind": "$amenity", "name": "$name"}}},
]
