"""Tag-processing profile — the engine's analog of the reference's Lua
script (node_function/way_function, /root/reference/src/osm_lua_processing.cpp:237-286).

A profile turns source rows into the canonical ``features`` DataFrame:

    features(feature_id:long, layer:string, geom_type:int, min_zoom:int,
             z_order:int, attrs:map<string,string>,
             geom:array<array<double>>)

geom is a list of flat [x0,y0,x1,y1,...] parts in **(lon, latp)** —
projected coordinates, same convention as the reference's internal
storage (src/pbf_processor.cpp:50 applies lat2latp at read time).
geom_type: 1=point 2=line 3=polygon; for polygons parts are rings
(outers/holes distinguished by winding, see geomnp.iter_polygons).

Everything here is Column-expression based (JVM-side); only way-geometry
assembly needs a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilemaker_spark.functions.coords import lat2latp_col
from tilemaker_spark.operators.geocode import geocode_pages

FEATURE_SCHEMA = ("feature_id long, layer string, geom_type int, min_zoom int, "
                  "z_order int, attrs map<string,string>, geom array<array<double>>")


# --------------------------------------------------- tag predicates (F1/F2)

def tag_filter(tags_col, keys=None, reject=False):
    """significant_tags accept/reject semantics
    (reference src/significant_tags.cpp:5-88): keys is a list of
    'k', 'k=v' or '~k' entries; accept-list admits a row if any entry
    matches; reject-list drops rows whose ONLY tags are rejected ones."""
    if not keys:
        return F.lit(True)
    conds = []
    for k in keys:
        if "=" in k:
            kk, vv = k.split("=", 1)
            conds.append(F.try_element_at(tags_col, F.lit(kk)) == vv)
        elif k.startswith("~"):
            conds.append(~F.map_contains_key(tags_col, k[1:]))
        else:
            conds.append(F.map_contains_key(tags_col, k))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return ~out if reject else out


# ----------------------------------------------------------- pages profile

def features_from_pages(pages: DataFrame, geocode: bool = True) -> DataFrame:
    """The web-pages profile: every page emits one point feature in layer
    'pages' (analog of node_function emitting Layer("pages")).

    Attrs: lang, host; min_zoom scales with a cheap per-page quality
    proxy (longer text -> visible earlier); z_order = text length.
    Pure Column exprs -> whole-stage codegen end to end.
    """
    df = geocode_pages(pages) if geocode else pages
    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1)
    text_len = F.length(F.col("text"))
    min_zoom = F.when(text_len > 300, F.lit(0)) \
        .when(text_len > 150, F.lit(6)) \
        .otherwise(F.lit(10))
    latp = lat2latp_col(F.col("lat"))
    return df.select(
        F.col("doc_id").alias("feature_id"),
        F.lit("pages").alias("layer"),
        F.lit(1).alias("geom_type"),
        min_zoom.cast("int").alias("min_zoom"),
        text_len.cast("int").alias("z_order"),
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("host")),
            F.array(F.col("lang"), host)).alias("attrs"),
        F.array(F.array(F.col("lon"), latp)).alias("geom"),
        F.col("url"), F.col("text"),  # payload passthrough (invariant check)
    )


# ------------------------------------------------------------ way profile

def assemble_way_geoms(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """J1 — the flagship equi-join: resolve each way's node refs to
    coordinates, order-preserving (reference src/pbf_processor.cpp:128-146).

    posexplode(refs) ⋈ nodes on id, then collect re-sorted by position.
    Ways referencing any missing node are dropped (reference skips them,
    src/pbf_processor.cpp:136-141). Output: ways + coords flat
    [lon,latp,...] array.

    LocationsOnWays fast path (src/pbf_processor.cpp:115-118,524): ways
    carrying inline lats/lons columns (osmium add-locations-to-ways)
    skip the node join entirely — coords come from a pure Column zip,
    no shuffle.
    """
    if "lats" in ways.columns and "lons" in ways.columns:
        with_loc = ways.filter(F.col("lats").isNotNull()
                               & (F.size("lats") > 0))
        without = ways.filter(F.col("lats").isNull()
                              | (F.size("lats") == 0)) \
            .drop("lats", "lons")
        latp = F.transform("lats", lambda v: lat2latp_col(v))
        coords = F.flatten(F.zip_with("lons", latp,
                                      lambda lo, la: F.array(lo, la)))
        direct = with_loc.select("id", "tags", "refs",
                                 coords.alias("coords"))
        return direct.unionByName(assemble_way_geoms(nodes, without))
    exploded = ways.select("id", "tags", F.col("refs"),
                           F.posexplode("refs").alias("pos", "ref"))
    node_pos = nodes.select(F.col("id").alias("ref"),
                            F.col("lon").alias("n_lon"),
                            lat2latp_col(F.col("lat")).alias("n_latp"))
    joined = exploded.join(node_pos, "ref", "left")
    agg = joined.groupBy("id").agg(
        F.first("tags").alias("tags"),
        F.first("refs").alias("refs"),
        F.sort_array(F.collect_list(F.struct("pos", "n_lon", "n_latp"))).alias("pts"),
        F.max(F.col("n_lon").isNull().cast("int")).alias("has_missing"),
    )
    coords = F.flatten(F.transform("pts", lambda p: F.array(p.n_lon, p.n_latp)))
    return (agg.filter(F.col("has_missing") == 0)
            .select("id", "tags", "refs", coords.alias("coords")))


def features_from_ways(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """The OSM-ways profile (way_function analog): highway -> 'roads'
    lines; building=yes -> 'buildings' polygons; natural=water ->
    'water' polygons. Closed-ring detection = first ref == last ref.
    """
    assembled = assemble_way_geoms(nodes, ways)
    tags = F.col("tags")
    is_closed = F.element_at("refs", 1) == F.element_at("refs", -1)
    is_road = F.map_contains_key(tags, "highway")
    is_building = F.try_element_at(tags, F.lit("building")).isNotNull()
    is_water = F.try_element_at(tags, F.lit("natural")) == "water"

    # drop the duplicated closing point for polygon rings: the engine's
    # ring convention is open (first point not repeated)
    ring_coords = F.slice(F.col("coords"), 1, F.size("coords") - 2)

    roads = assembled.filter(is_road & ~is_closed).select(
        F.col("id").alias("feature_id"),
        F.lit("roads").alias("layer"),
        F.lit(2).alias("geom_type"),
        F.when(F.try_element_at(tags, F.lit("highway")) == "primary", 4).otherwise(9)
         .cast("int").alias("min_zoom"),
        F.lit(0).alias("z_order"),
        F.map_from_arrays(F.array(F.lit("class"), F.lit("name")),
                          F.array(F.try_element_at(tags, F.lit("highway")),
                                  F.coalesce(F.try_element_at(tags, F.lit("name")), F.lit("")))
                          ).alias("attrs"),
        F.array(F.col("coords")).alias("geom"),
    )
    polys = assembled.filter(is_closed & (is_building | is_water)).select(
        F.col("id").alias("feature_id"),
        F.when(is_water, "water").otherwise("buildings").alias("layer"),
        F.lit(3).alias("geom_type"),
        F.when(is_water, 0).otherwise(9).cast("int").alias("min_zoom"),
        F.lit(0).alias("z_order"),
        tags.alias("attrs"),
        F.array(ring_coords).alias("geom"),
    )
    return roads.unionByName(polys)
