"""read_pages_table — the catalog-table (Iceberg-shaped) input path.

The north rule's production input is an Iceberg table of Common-Crawl
style pages; in Spark that is consumed through the session catalog
(`spark.read.table("catalog.db.pages")`), which is what these tests
exercise via temp views / parquet paths (the Iceberg runtime jar is not
in this sandbox — the option passthrough and the catalog resolution are
the engine's side of the contract).
"""
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.fixtures import pages_from_documents
from tilemaker_spark.sources import read_pages_table

SF = "/root/testdata/sf0.001"


def test_table_name_resolves_through_catalog(spark):
    pages = pages_from_documents(spark, SF)
    pages.createOrReplaceTempView("pages_tv")
    out = read_pages_table(spark, table="pages_tv")
    assert out.count() == pages.count()
    # an existing doc_id column passes through untouched
    assert (out.select(F.sum("doc_id")).first()[0]
            == pages.select(F.sum("doc_id")).first()[0])
    # per-row invariant: text byte-identical per url
    joined = out.alias("a").join(pages.alias("b"), "url")
    assert joined.filter("a.text <> b.text").count() == 0


def test_doc_id_derived_deterministically_when_absent(spark):
    pages = pages_from_documents(spark, SF).drop("doc_id")
    pages.createOrReplaceTempView("pages_noid_tv")
    out = read_pages_table(spark, table="pages_noid_tv")
    n = out.count()
    # xxhash64(url): pure projection, collision-free at this scale,
    # identical on re-read (no partition-layout dependence)
    assert out.select("doc_id").distinct().count() == n
    assert out.filter(F.col("doc_id") != F.xxhash64("url")).count() == 0
    again = read_pages_table(spark, table="pages_noid_tv")
    assert (out.select(F.sum("doc_id")).first()[0]
            == again.select(F.sum("doc_id")).first()[0])


def test_path_read_and_column_pruning(spark, tmp_path):
    p = str(tmp_path / "pages.parquet")
    pages_from_documents(spark, SF).drop("doc_id").write.parquet(p)
    out = read_pages_table(spark, path=p, columns=["url", "text"])
    assert out.columns == ["doc_id", "url", "text"]
    # the projection reaches the parquet reader: html/lang/warc_ts are
    # not in ReadSchema (url + text only — doc_id derives from url)
    plan = out._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "html" not in rs[0] and "warc_ts" not in rs[0]


def test_time_travel_options_pass_through(spark, tmp_path):
    # file sources ignore the Iceberg read options — passing them must
    # not break the sandbox path (on an Iceberg table they pin the scan)
    p = str(tmp_path / "pages2.parquet")
    pages_from_documents(spark, SF).write.parquet(p)
    out = read_pages_table(spark, path=p, snapshot_id=12345,
                           as_of_timestamp=1700000000000, branch="main")
    assert out.count() > 0


def test_exactly_one_source_required(spark):
    with pytest.raises(ValueError):
        read_pages_table(spark)
    with pytest.raises(ValueError):
        read_pages_table(spark, table="t", path="/x")


def test_pipeline_accepts_table_input(spark, tmp_path):
    """e2e smoke: catalog-table pages -> tiles (the --table CLI path)."""
    from tilemaker_spark.config import default_config
    from tilemaker_spark.plans.pipeline import TilePipeline
    pages_from_documents(spark, SF).limit(50) \
        .createOrReplaceTempView("pages_e2e_tv")
    pages = read_pages_table(spark, table="pages_e2e_tv")
    pipe = TilePipeline(spark, default_config(),
                        workdir=str(tmp_path / "wd"))
    tiles = pipe.run(pages)
    assert tiles.count() > 0


# ------------------------------------------- spatial partition layout

def test_spatial_layout_roundtrip_and_pruning(spark, tmp_path):
    from tilemaker_spark.operators.geocode import geocode_pages
    from tilemaker_spark.sources import (read_pages_spatial,
                                         write_pages_spatial)
    p = str(tmp_path / "pages_spatial")
    pages = pages_from_documents(spark, SF)
    write_pages_spatial(pages, p, level=3)

    # no bbox: full corpus back, payload intact
    full = read_pages_spatial(spark, p)
    assert full.count() == pages.count()
    joined = full.alias("a").join(pages.alias("b"), "url")
    assert joined.filter("a.text <> b.text").count() == 0

    # bbox read = exactly the rows of the INTERSECTING cells — a
    # superset of the exact-bbox rows, subset of the corpus
    bbox = (-20.0, 20.0, 60.0, 70.0)
    sub = read_pages_spatial(spark, p, bbox=bbox)
    n_sub = sub.count()
    geo = geocode_pages(pages)
    n_exact = geo.filter((F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
                         & (F.col("lat") >= bbox[1])
                         & (F.col("lat") <= bbox[3])).count()
    assert n_exact <= n_sub < pages.count()
    # every returned row's cell intersects the bbox range
    import json
    level = json.load(open(f"{p}/_spatial_layout.json"))["level"]
    from tilemaker_spark.functions.coords import lat2tiley_np, lon2tilex_np
    x0, x1 = int(lon2tilex_np(bbox[0], level)), int(lon2tilex_np(bbox[2], level))
    y0, y1 = int(lat2tiley_np(bbox[3], level)), int(lat2tiley_np(bbox[1], level))
    bad = sub.filter(~((F.col("cx").between(x0, x1))
                       & (F.col("cy").between(y0, y1)))).count()
    assert bad == 0

    # the predicate lands in PartitionFilters (directory pruning, not a
    # post-scan filter) — the scan never opens non-intersecting cells
    plan = sub._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cx" in pf[0] and "PartitionFilters: []" not in pf[0]


def test_cli_spatial_input_with_bbox(spark, tmp_path):
    """CLI: a spatial-layout input dir + --bbox does a pruned extract."""
    from tilemaker_spark.cli import main
    from tilemaker_spark.sources import write_pages_spatial
    p = str(tmp_path / "layout")
    write_pages_spatial(pages_from_documents(spark, SF), p, level=3)
    out = str(tmp_path / "out.mbtiles")
    res = main([p, "--bbox=-20,20,60,70", "--output", out,
                "--store", str(tmp_path / "store"), "--force", "--quiet"],
               spark=spark)
    assert 0 < res["tiles"]
    # a full-world run over the same layout writes strictly more tiles
    res_full = main([p, "--output", str(tmp_path / "out2.mbtiles"),
                     "--store", str(tmp_path / "store2"), "--force",
                     "--quiet"], spark=spark)
    assert res["tiles"] < res_full["tiles"]


def test_spatial_layout_splits_hot_cells(spark, tmp_path):
    """A dense cell must NOT collapse into one write task: range
    partitioning over (cx, cy, zkey) spreads it across many files."""
    import glob
    from tilemaker_spark.sources import read_pages_spatial, write_pages_spatial
    p = str(tmp_path / "hot")
    pages = pages_from_documents(spark, SF)
    # level 0 = the whole world in ONE cell — the worst-case hot cell
    write_pages_spatial(pages, p, level=0, target_partitions=8)
    files = glob.glob(f"{p}/cx=0/cy=0/*.parquet")
    assert len(files) > 1
    assert read_pages_spatial(spark, p).count() == pages.count()


# ----------------------------------- bucketed OSM node-store layout

def test_bucketed_node_resolution_matches_and_skips_exchange(spark, tmp_path):
    from tilemaker_spark.fixtures import make_nodes_ways
    from tilemaker_spark.operators.profile import assemble_way_geoms
    from tilemaker_spark.sources import (resolve_ways_bucketed,
                                         write_osm_bucketed)
    nodes, ways = make_nodes_ways(spark)
    nt, rt, wt = write_osm_bucketed(nodes, ways, str(tmp_path / "osm"),
                                    buckets=4, suffix="_t1")
    got = resolve_ways_bucketed(spark, nt, rt, wt)
    want = assemble_way_geoms(nodes, ways)
    g = {r.id: (list(r.coords), sorted(r.tags.items())) for r in got.collect()}
    w = {r.id: (list(r.coords), sorted(r.tags.items())) for r in want.collect()}
    assert g == w
    # disable broadcast so the plan shows the at-scale join strategy
    # (fixture tables are broadcast-sized; planet nodes are not)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # bucket-aligned resolution: sort-merge join with NO shuffle on
        # ref on either side
        plan = (resolve_ways_bucketed(spark, nt, rt, wt)
                ._jdf.queryExecution().executedPlan().toString())
        assert "SortMergeJoin" in plan
        assert "hashpartitioning(ref" not in plan
        # the unbucketed join DOES shuffle on ref — the assertion bites
        plan_flat = (assemble_way_geoms(nodes, ways)
                     ._jdf.queryExecution().executedPlan().toString())
        assert "hashpartitioning(ref" in plan_flat
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_spatial_write_null_coords_geocode_fallback(spark, tmp_path):
    """Rows carrying NULL lon/lat (ungeocoded pages in a table that HAS
    the columns) must be geo-derived per row, never clamped into the
    corner cell (n-1, n-1) by null-skipping greatest/least."""
    from tilemaker_spark.functions.coords import lat2tiley_np, lon2tilex_np
    from tilemaker_spark.operators.geocode import geocode_pages
    from tilemaker_spark.sources import read_pages_spatial, write_pages_spatial

    pages = pages_from_documents(spark, SF)
    geo = geocode_pages(pages)
    holed = (geo
             .withColumn("lon", F.when(F.col("doc_id") % 7 == 0,
                                       F.lit(None)).otherwise(F.col("lon")))
             .withColumn("lat", F.when(F.col("doc_id") % 7 == 0,
                                       F.lit(None)).otherwise(F.col("lat"))))
    p = str(tmp_path / "holes")
    write_pages_spatial(holed, p, level=3)

    back = read_pages_spatial(spark, p)
    assert back.count() == pages.count()
    # every previously-null row sits in its geocode-derived cell
    nulled = back.filter(F.col("doc_id") % 7 == 0).select("doc_id", "cx", "cy")
    ref = {r.doc_id: (int(lon2tilex_np(r.lon, 3)), int(lat2tiley_np(r.lat, 3)))
           for r in geo.filter(F.col("doc_id") % 7 == 0)
           .select("doc_id", "lon", "lat").collect()}
    for r in nulled.collect():
        assert (r.cx, r.cy) == ref[r.doc_id], r.doc_id
