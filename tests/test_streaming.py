"""Incremental tileset maintenance (Structured Streaming foreachBatch)."""

import gzip
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import default_config
from tilemaker_spark.fixtures import make_pages
from tilemaker_spark.functions import mvt
from tilemaker_spark.streaming.incremental import (
    read_current_tiles,
    start_incremental,
)


@pytest.fixture()
def dirs(tmp_path):
    pages_dir = str(tmp_path / "pages_in")
    workdir = str(tmp_path / "tiles_state")
    os.makedirs(pages_dir)
    return pages_dir, workdir


def _cfg():
    cfg = default_config()
    # pages features carry min_zoom=10 for this synthetic text length
    cfg.basezoom = 10
    cfg.compress = "none"
    return cfg


def _write_batch(spark, pages_dir, lo, hi, name):
    df = make_pages(spark, hi).filter(F.col("doc_id") >= lo)
    df.coalesce(1).write.mode("overwrite").parquet(f"{pages_dir}/_stage_{name}")
    # move the parquet file in atomically (file-source semantics)
    src = [f for f in os.listdir(f"{pages_dir}/_stage_{name}")
           if f.endswith(".parquet")][0]
    shutil.move(f"{pages_dir}/_stage_{name}/{src}", f"{pages_dir}/{name}.parquet")
    shutil.rmtree(f"{pages_dir}/_stage_{name}")


def _total_features(spark, workdir):
    tiles = read_current_tiles(spark, workdir)
    if tiles is None:
        return 0, 0
    rows = tiles.collect()
    n_feat = 0
    for r in rows:
        dec = mvt.decode_tile(bytes(r.tile))
        for ld in dec.values():
            n_feat += len(ld["features"])
    return len(rows), n_feat


def test_incremental_two_batches(spark, dirs):
    pages_dir, workdir = dirs
    cfg = _cfg()
    cfg.layers["pages"].minzoom = 0

    _write_batch(spark, pages_dir, 0, 50, "batch0")
    q = start_incremental(spark, pages_dir, workdir, cfg)
    q.awaitTermination(120)
    n_tiles_1, n_feat_1 = _total_features(spark, workdir)
    assert n_tiles_1 > 0

    _write_batch(spark, pages_dir, 50, 100, "batch1")
    q = start_incremental(spark, pages_dir, workdir, cfg)
    q.awaitTermination(120)
    n_tiles_2, n_feat_2 = _total_features(spark, workdir)

    # second snapshot contains the union of both batches' features
    assert n_feat_2 > n_feat_1
    assert n_tiles_2 >= n_tiles_1


def test_exactly_once_across_restart(spark, dirs):
    """Re-starting the stream with no new files must not re-merge."""
    pages_dir, workdir = dirs
    cfg = _cfg()
    cfg.layers["pages"].minzoom = 0

    _write_batch(spark, pages_dir, 0, 40, "b0")
    q = start_incremental(spark, pages_dir, workdir, cfg)
    q.awaitTermination(120)
    _, n_feat_1 = _total_features(spark, workdir)

    q = start_incremental(spark, pages_dir, workdir, cfg)  # no new input
    q.awaitTermination(120)
    _, n_feat_2 = _total_features(spark, workdir)
    assert n_feat_2 == n_feat_1  # checkpoint prevented double-processing


def test_windowed_tile_counts_streaming(spark, tmp_path_factory):
    """Real readStream run of the watermarked windowed aggregation:
    append mode emits only watermark-finalized windows, and the result
    matches the batch run of the same transformation."""
    import os
    from tilemaker_spark.fixtures import make_pages
    from tilemaker_spark.streaming.windowed import windowed_tile_counts

    d = tmp_path_factory.mktemp("wstream")
    src = str(d / "pages")
    os.makedirs(src)
    pages = make_pages(spark, 2000)
    pages.coalesce(2).write.mode("overwrite").parquet(src)

    stream = (spark.readStream
              .schema(pages.schema)
              .parquet(src))
    agg = windowed_tile_counts(stream, zoom=6, window="10 minutes",
                               watermark="5 minutes")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.win_epoch if hasattr(r, "win_epoch") else r.win_start,
            r.x, r.y): (r.n_pages, r.min_doc)
           for r in spark.sql("SELECT * FROM win_counts").collect()}

    batch = windowed_tile_counts(pages, zoom=6, window="10 minutes")
    want = {(r.win_start, r.x, r.y): (r.n_pages, r.min_doc)
            for r in batch.collect()}
    assert got == want
    assert len(want) > 10
