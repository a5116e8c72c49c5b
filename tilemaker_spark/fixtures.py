"""Deterministic synthetic fixtures (FIXTURES.md §1-§5).

Every generator is a pure function of (seed=42, row index) — no wall
clock, no RNG state leakage — so reruns are byte-stable. Spark-side
generators use ``spark.range`` + Column exprs (distributed, no driver
materialization) so the same code scales to bench sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
LANGS = ["en", "de", "fr", "es", "ja"]


# ------------------------------------------------------------- pages

def make_pages(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """FIXTURES.md §1 pages table, built distributed from spark.range.

    text is a deterministic function of the row index (md5-derived words);
    html wraps text; the byte-identity of text per url is the pipeline's
    per-row invariant.
    """
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    text = F.concat_ws(
        " ",
        F.md5(F.col("doc_id").cast("string")),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#1"))),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#2"))),
    )
    return (
        df.withColumn("url", F.concat(F.lit("https://site"),
                                      (F.col("doc_id") % 1000).cast("string"),
                                      F.lit(".example/p/"),
                                      F.col("doc_id").cast("string")))
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(secs=F.col("doc_id").cast("double")))
        .withColumn("text", text)
        .withColumn("html", F.encode(F.concat(F.lit("<html><body>"), text,
                                              F.lit("</body></html>")), "utf-8"))
        .withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                                         (F.col("doc_id") % 5 + 1).cast("int")))
        .select("doc_id", "url", "warc_ts", "html", "text", "lang")
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape the driver's documents.parquet into the mandated pages
    schema (url, warc_ts, html, text, lang) + doc_id. text passes through
    byte-identical."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.withColumn("url", F.concat(F.lit("https://site"),
                                        (F.col("doc_id") % 1000).cast("string"),
                                        F.lit(".example/p/"),
                                        F.col("doc_id").cast("string")))
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(secs=F.col("doc_id").cast("double")))
        .withColumn("html", F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                                              F.lit("</body></html>")), "utf-8"))
        .select("doc_id", "url", "warc_ts", "html", "text", "lang")
    )


# --------------------------------------------------------- nodes / ways

def make_nodes_ways(spark: SparkSession, grid_w: int = 60, grid_h: int = 40,
                    origin_lon: float = -0.2, origin_lat: float = 51.3,
                    spacing: float = 0.001):
    """FIXTURES.md §2: a grid of nodes + polyline/rectangle ways.

    nodes(id, lat, lon, tags) / ways(id, refs, tags). Mirrors the PBF
    entity model (reference include/coordinates.h:20,72-75;
    src/pbf_processor.cpp:100-146). ~1% of ways reference a missing node
    (integrity handling, src/pbf_processor.cpp:136-141).
    """
    rng = np.random.default_rng(SEED)
    n_nodes = grid_w * grid_h
    ids = np.arange(n_nodes, dtype=np.int64) + 1
    gy, gx = np.divmod(np.arange(n_nodes), grid_w)
    lons = origin_lon + gx * spacing
    lats = origin_lat + gy * spacing
    nodes_pd = pd.DataFrame({
        "id": ids, "lat": lats, "lon": lons,
        "tags": [{} for _ in range(n_nodes)],
    })
    # sprinkle POI tags on some nodes
    poi = rng.choice(n_nodes, size=n_nodes // 50, replace=False)
    for i in poi:
        nodes_pd.at[i, "tags"] = {"amenity": "cafe", "name": f"poi{int(ids[i])}"}

    ways = []
    wid = 100000
    # (a) open polylines along grid rows: highway ways
    for row in range(0, grid_h, 3):
        start = row * grid_w
        length = int(rng.integers(5, 50))
        refs = [int(ids[start + c]) for c in range(min(length, grid_w))]
        wid += 1
        tag = "primary" if row % 2 == 0 else "minor"
        ways.append((wid, refs, {"highway": tag, "name": f"road{wid}"}))
    # (b) closed rectangles: buildings / water (area semantics)
    for k in range(40):
        x0 = int(rng.integers(0, grid_w - 4))
        y0 = int(rng.integers(0, grid_h - 4))
        w = int(rng.integers(1, 4))
        h = int(rng.integers(1, 4))
        c = [y0 * grid_w + x0, y0 * grid_w + x0 + w,
             (y0 + h) * grid_w + x0 + w, (y0 + h) * grid_w + x0]
        refs = [int(ids[i]) for i in c] + [int(ids[c[0]])]
        wid += 1
        tags = {"building": "yes"} if k % 3 else {"natural": "water"}
        ways.append((wid, refs, tags))
    # (c) ~1% broken ref
    wid += 1
    ways.append((wid, [int(ids[0]), 99999999], {"highway": "broken"}))

    ways_pd = pd.DataFrame(ways, columns=["id", "refs", "tags"])
    nodes = spark.createDataFrame(
        nodes_pd, schema="id long, lat double, lon double, tags map<string,string>")
    ways_df = spark.createDataFrame(
        ways_pd, schema="id long, refs array<long>, tags map<string,string>")
    return nodes, ways_df


def make_relations(spark: SparkSession, ways_df: DataFrame | None = None):
    """FIXTURES.md §3 multipolygon relations + their member ways.

    Returns (relations, rel_ways): rel_ways are standalone ways (node-free,
    inline coords as refs into rel_nodes) built to exercise the ring-stitch
    branches of the reference (src/osm_store.cpp:64-226): closed outer,
    split+reversed outer, holes, two disjoint outers.
    """
    # nodes for relation geometry, ids 200000+
    pts = {}

    def nid(lon, lat):
        key = (round(lon, 6), round(lat, 6))
        if key not in pts:
            pts[key] = 200000 + len(pts)
        return pts[key]

    def way(way_id, coords, closed=False):
        refs = [nid(x, y) for x, y in coords]
        if closed:
            refs.append(refs[0])
        return (way_id, refs, {})

    ways = []
    rels = []
    # (a) one closed outer way
    ways.append(way(300001, [(10.0, 10.0), (10.1, 10.0), (10.1, 10.1), (10.0, 10.1)], closed=True))
    rels.append((400001, [("way", 300001, "outer")], {"type": "multipolygon", "natural": "water", "name": "lake_a"}))
    # (b) outer split into 3 open ways, middle reversed
    ways.append(way(300002, [(11.0, 10.0), (11.1, 10.0), (11.1, 10.1)]))
    ways.append(way(300003, [(11.0, 10.1), (11.1, 10.1)]))  # reversed span
    ways.append(way(300004, [(11.0, 10.0), (11.0, 10.1)]))
    rels.append((400002, [("way", 300002, "outer"), ("way", 300003, "outer"),
                          ("way", 300004, "outer")],
                 {"type": "multipolygon", "natural": "water", "name": "lake_b"}))
    # (c) outer + 2 inner holes
    ways.append(way(300005, [(12.0, 10.0), (12.3, 10.0), (12.3, 10.3), (12.0, 10.3)], closed=True))
    ways.append(way(300006, [(12.05, 10.05), (12.1, 10.05), (12.1, 10.1), (12.05, 10.1)], closed=True))
    ways.append(way(300007, [(12.15, 10.15), (12.2, 10.15), (12.2, 10.2), (12.15, 10.2)], closed=True))
    rels.append((400003, [("way", 300005, "outer"), ("way", 300006, "inner"),
                          ("way", 300007, "inner")],
                 {"type": "multipolygon", "landuse": "forest", "name": "forest_c"}))
    # (d) two disjoint outers, one hole each
    ways.append(way(300008, [(13.0, 10.0), (13.1, 10.0), (13.1, 10.1), (13.0, 10.1)], closed=True))
    ways.append(way(300009, [(13.02, 10.02), (13.04, 10.02), (13.04, 10.04), (13.02, 10.04)], closed=True))
    ways.append(way(300010, [(13.5, 10.0), (13.6, 10.0), (13.6, 10.1), (13.5, 10.1)], closed=True))
    ways.append(way(300011, [(13.52, 10.02), (13.54, 10.02), (13.54, 10.04), (13.52, 10.04)], closed=True))
    rels.append((400004, [("way", 300008, "outer"), ("way", 300009, "inner"),
                          ("way", 300010, "outer"), ("way", 300011, "inner")],
                 {"type": "multipolygon", "natural": "wood", "name": "wood_d"}))
    # (e) label-role node member
    rels.append((400005, [("way", 300001, "outer"), ("node", nid(10.05, 10.05), "label")],
                 {"type": "multipolygon", "place": "island", "name": "island_e"}))

    rel_nodes_pd = pd.DataFrame(
        [(v, k[1], k[0], {}) for k, v in pts.items()],
        columns=["id", "lat", "lon", "tags"])
    ways_pd = pd.DataFrame(ways, columns=["id", "refs", "tags"])
    rels_pd = pd.DataFrame(
        [(rid, [{"mtype": m[0], "ref": m[1], "role": m[2]} for m in members], tags)
         for rid, members, tags in rels],
        columns=["id", "members", "tags"])

    rel_nodes = spark.createDataFrame(
        rel_nodes_pd, schema="id long, lat double, lon double, tags map<string,string>")
    rel_ways = spark.createDataFrame(
        ways_pd, schema="id long, refs array<long>, tags map<string,string>")
    relations = spark.createDataFrame(
        rels_pd,
        schema=("id long, members array<struct<mtype:string, ref:long, role:string>>, "
                "tags map<string,string>"))
    return relations, rel_ways, rel_nodes


# ------------------------------------------------------ layer polygons

def make_layer_polygons(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §4: checkerboard 'country' squares + an L-shape + a
    polygon with a hole — the spatial-join build side (reference
    ShpMemTiles.StoreGeometry inputs, src/shp_mem_tiles.cpp:129-228).

    Schema: layer_polygons(layer, name, rings:array<array<double>>,
    x0, y0, x1, y1, attrs, minzoom) where rings are flat [x,y,x,y...]
    (outer first, holes after) in (lon, lat); (x0..y1) is the bbox,
    letting DuckDB-range oracles check axis-aligned cases.
    """
    rows = []
    # 10x10 checkerboard of 1-degree squares named C00..C99 around (0,40)
    for i in range(10):
        for j in range(10):
            x0, y0 = -5.0 + i, 38.0 + j
            ring = [x0, y0, x0 + 1, y0, x0 + 1, y0 + 1, x0, y0 + 1]
            rows.append(("countries", f"C{i}{j}", [ring],
                         x0, y0, x0 + 1, y0 + 1,
                         {"iso": f"C{i}{j}"}, 0))
    # L-shaped concave polygon (bbox false-positive case)
    l_ring = [20.0, 40.0, 23.0, 40.0, 23.0, 41.0, 21.0, 41.0, 21.0, 43.0, 20.0, 43.0]
    rows.append(("regions", "Lshape", [l_ring], 20.0, 40.0, 23.0, 43.0,
                 {"kind": "L"}, 0))
    # polygon with a hole
    outer = [30.0, 40.0, 33.0, 40.0, 33.0, 43.0, 30.0, 43.0]
    hole = [31.0, 41.0, 31.0, 42.0, 32.0, 42.0, 32.0, 41.0]
    rows.append(("regions", "Donut", [outer, hole], 30.0, 40.0, 33.0, 43.0,
                 {"kind": "donut"}, 0))
    pdf = pd.DataFrame(rows, columns=["layer", "name", "rings", "x0", "y0",
                                      "x1", "y1", "attrs", "minzoom"])
    return spark.createDataFrame(
        pdf,
        schema=("layer string, name string, rings array<array<double>>, "
                "x0 double, y0 double, x1 double, y1 double, "
                "attrs map<string,string>, minzoom int"))
