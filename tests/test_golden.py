"""Golden regression tests (FIXTURES.md §6) — recompute and compare
against frozen hashes in tests/golden/golden.json. Regenerate
deliberately with tools/make_golden.py after a reviewed behavior change.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def _sha_rows(rows):
    import hashlib
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(repr(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def test_ways_tile_assignments(spark, golden):
    from tilemaker_spark.fixtures import make_nodes_ways
    from tilemaker_spark.operators.profile import features_from_ways
    from tilemaker_spark.operators.tiling import cover_explode
    nodes, ways = make_nodes_ways(spark)
    ft = cover_explode(features_from_ways(nodes, ways), 14)
    rows = [(r.feature_id, r.z, r.x, r.y)
            for r in ft.select("feature_id", "z", "x", "y").collect()]
    g = golden["ways_tile_assignments"]
    assert len(rows) == g["n"]
    assert _sha_rows(rows) == g["sha256"]


def test_text_hashes(spark, golden):
    from tilemaker_spark.fixtures import pages_from_documents
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    rows = [(r.url, r.h) for r in
            pages.select("url", F.sha2("text", 256).alias("h")).collect()]
    g = golden["sf0001_text_hashes"]
    assert len(rows) == g["n"]
    assert _sha_rows(rows) == g["sha256"]


@pytest.mark.skipif(not os.path.exists("/root/reference/test/monaco.pbf"),
                    reason="monaco fixture unavailable")
def test_monaco_counts(spark, golden):
    from tilemaker_spark import sources_pbf
    ents = sources_pbf.read_pbf(spark, "/root/reference/test/monaco.pbf")
    counts = {r.etype: r.n for r in
              ents.groupBy("etype").agg(F.count("*").alias("n")).collect()}
    assert counts == golden["monaco_counts"]


def test_entry_tiles(spark, golden):
    import __spark_entry__ as entrymod
    tiles = entrymod.entry(spark)
    rows = [(r.z, r.x, r.y, r.n_features) for r in tiles.collect()]
    g = golden["entry_tiles"]
    assert len(rows) == g["n"]
    assert _sha_rows(rows) == g["sha256"]
