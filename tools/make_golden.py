"""Generate the frozen golden fixtures (FIXTURES.md §6).

Run once, inspect, commit tests/golden/*.json; tests/test_golden.py
recomputes and compares — catching silent behavior changes that
run-to-run determinism tests cannot (those only compare a run to
itself).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/tests/golden"


def sha_rows(rows) -> str:
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(repr(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from tilemaker_spark.fixtures import make_nodes_ways, pages_from_documents
    from tilemaker_spark.operators.profile import features_from_ways
    from tilemaker_spark.operators.tiling import cover_explode
    from tilemaker_spark.session import get_spark

    spark = get_spark("golden")
    spark.sparkContext.setLogLevel("ERROR")
    golden = {}

    # 1. supercover/scanline tile assignments of the ways fixture at z14
    nodes, ways = make_nodes_ways(spark)
    feats = features_from_ways(nodes, ways)
    ft = cover_explode(feats, 14).select("feature_id", "z", "x", "y")
    rows = [(r.feature_id, r.z, r.x, r.y) for r in ft.collect()]
    golden["ways_tile_assignments"] = {
        "n": len(rows), "sha256": sha_rows(rows)}

    # 2. per-url text hashes at sf0.001 (payload invariant anchor)
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    hrows = [(r.url, r.h) for r in
             pages.select("url", F.sha2("text", 256).alias("h")).collect()]
    golden["sf0001_text_hashes"] = {"n": len(hrows), "sha256": sha_rows(hrows)}

    # 3. monaco.pbf entity counts (real-data scan stability)
    monaco = "/root/reference/test/monaco.pbf"
    if os.path.exists(monaco):
        from tilemaker_spark import sources_pbf
        ents = sources_pbf.read_pbf(spark, monaco)
        counts = {r.etype: r.n for r in
                  ents.groupBy("etype").agg(F.count("*").alias("n")).collect()}
        golden["monaco_counts"] = counts

    # 4. flagship entry() tile set (z, x, y, n_features) hash
    import __spark_entry__ as entrymod
    tiles = entrymod.entry(spark)
    trows = [(r.z, r.x, r.y, r.n_features) for r in tiles.collect()]
    golden["entry_tiles"] = {"n": len(trows), "sha256": sha_rows(trows)}

    with open(os.path.join(OUT, "golden.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(json.dumps(golden, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
