"""Sink roundtrips: MBTiles, PMTiles, tile directory, merge, Hilbert."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.functions import mvt
from tilemaker_spark import sinks


def _mk_tile(n_pts: int, name: str = "pages") -> bytes:
    lb = mvt.LayerBuilder(name, extent=4096, version=2)
    pts = [(i * 10 % 4096, i * 17 % 4096) for i in range(n_pts)]
    lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry(pts),
                   attrs=[("kind", "test")])
    return mvt.encode_tile([lb])


@pytest.fixture(scope="module")
def tiles_df(spark):
    rows = [(z, x, y, _mk_tile(1 + (x + y) % 5))
            for z in (2, 3) for x in range(1 << z) for y in range(1 << z)
            if (x + y) % 3 == 0]
    return spark.createDataFrame(rows, "z int, x long, y long, tile binary")


def test_hilbert_roundtrip():
    cases = [(0, 0, 0), (1, 1, 0), (5, 17, 3), (12, 4001, 100),
             (14, 16383, 16383), (14, 0, 16383)]
    for z, x, y in cases:
        tid = sinks.zxy_to_tileid(z, x, y)
        assert sinks.tileid_to_zxy(tid) == (z, x, y)


def test_hilbert_adjacency():
    """Consecutive hilbert ids are grid-adjacent (locality property)."""
    prev = None
    ids = sorted((sinks.hilbert_d(4, x, y), x, y)
                 for x in range(16) for y in range(16))
    for d, x, y in ids:
        if prev is not None:
            px, py = prev
            assert abs(x - px) + abs(y - py) == 1
        prev = (x, y)


def test_hilbert_vectorized_matches_scalar():
    import numpy as np
    rng = np.random.default_rng(11)
    zs = rng.integers(0, 15, 2000)
    xs = np.array([rng.integers(0, 1 << z) if z else 0 for z in zs])
    ys = np.array([rng.integers(0, 1 << z) if z else 0 for z in zs])
    vec = sinks.hilbert_d_np(zs, xs, ys)
    assert all(int(v) == sinks.hilbert_d(int(z), int(x), int(y))
               for v, z, x, y in zip(vec, zs, xs, ys))


def test_mbtiles_roundtrip(spark, tiles_df, tmp_path):
    path = str(tmp_path / "t.mbtiles")
    n = sinks.write_mbtiles(tiles_df, path, {"name": "t"})
    assert n == tiles_df.count()
    back = sinks.read_mbtiles(spark, path)
    a = {(r.z, r.x, r.y): bytes(r.tile) for r in tiles_df.collect()}
    b = {(r.z, r.x, r.y): bytes(r.tile) for r in back.collect()}
    assert a == b


def test_pmtiles_roundtrip(spark, tiles_df, tmp_path):
    path = str(tmp_path / "t.pmtiles")
    n = sinks.write_pmtiles(tiles_df, path, {"name": "t"})
    assert n == tiles_df.count()
    back = sinks.read_pmtiles(spark, path)
    a = {(r.z, r.x, r.y): bytes(r.tile) for r in tiles_df.collect()}
    b = {(r.z, r.x, r.y): bytes(r.tile) for r in back.collect()}
    assert a == b


def test_pmtiles_dedup_and_clustering(spark, tmp_path):
    # identical tiles must be stored once (run-length / content dedup)
    blob = _mk_tile(3)
    rows = [(4, x, y, blob) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    path = str(tmp_path / "d.pmtiles")
    sinks.write_pmtiles(df, path)
    size = os.path.getsize(path)
    assert size < 127 + 1000 + len(blob) * 3  # far less than 16 copies
    back = sinks.read_pmtiles(spark, path)
    assert back.count() == 16
    assert all(bytes(r.tile) == blob for r in back.collect())


def test_pmtiles_write_streams_data(spark, tmp_path):
    """Driver-side buffering must be O(directory), not O(archive): the
    data section streams through a sidecar file, so Python peak memory
    during the write stays far below the total unique tile bytes."""
    import random
    import tracemalloc

    rng = random.Random(7)
    rows = [(12, i % 64, i // 64,
             bytes(rng.getrandbits(8) for _ in range(4096)))
            for i in range(2000)]  # ~8 MB of unique (incompressible) tiles
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    df = df.persist()
    df.count()  # materialize so tracemalloc sees only the writer
    path = str(tmp_path / "s.pmtiles")
    tracemalloc.start()
    n = sinks.write_pmtiles(df, path)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    df.unpersist()
    assert n == 2000
    total_data = 2000 * 4096
    assert os.path.getsize(path) > total_data  # all unique -> all stored
    assert peak < total_data // 2, f"driver buffered {peak} bytes"
    assert not os.path.exists(path + ".data.tmp")
    back = sinks.read_pmtiles(spark, path)
    assert back.count() == 2000


def test_tile_directory(spark, tiles_df, tmp_path):
    out = str(tmp_path / "tiles")
    n = sinks.write_tile_directory(tiles_df, out, {"name": "t"})
    assert n == tiles_df.count()
    r = tiles_df.first()
    p = os.path.join(out, str(r.z), str(r.x), f"{r.y}.pbf")
    assert os.path.exists(p)
    with open(p, "rb") as f:
        assert f.read() == bytes(r.tile)
    assert os.path.exists(os.path.join(out, "metadata.json"))


def test_merge_tilesets(spark):
    old = spark.createDataFrame(
        [(5, 1, 1, _mk_tile(2, "old_layer")), (5, 2, 2, _mk_tile(1, "old_layer"))],
        "z int, x long, y long, tile binary")
    new = spark.createDataFrame(
        [(5, 1, 1, _mk_tile(3, "new_layer")), (5, 3, 3, _mk_tile(4, "new_layer"))],
        "z int, x long, y long, tile binary")
    merged = sinks.merge_tilesets(old, new)
    got = {(r.z, r.x, r.y): mvt.decode_tile(bytes(r.tile))
           for r in merged.collect()}
    assert set(got) == {(5, 1, 1), (5, 2, 2), (5, 3, 3)}
    assert set(got[(5, 1, 1)]) == {"old_layer", "new_layer"}
    assert set(got[(5, 2, 2)]) == {"old_layer"}
    assert set(got[(5, 3, 3)]) == {"new_layer"}


def test_metadata(spark):
    from tilemaker_spark.config import default_config
    cfg = default_config()
    feats = spark.createDataFrame(
        [("pages", {"lang": "en", "host": "x"}), ("roads", {"class": "primary"})],
        "layer string, attrs map<string,string>")
    attrs = sinks.discover_layer_attrs(feats)
    md = sinks.tileset_metadata(cfg, attrs)
    assert md["format"] == "pbf"
    import json
    vl = {v["id"]: v for v in json.loads(md["json"])["vector_layers"]}
    assert "lang" in vl["pages"]["fields"]
    assert "class" in vl["roads"]["fields"]


def test_mbtiles_read_view_backed(spark, tiles_df, tmp_path):
    """OpenMapTiles/gdal-style archives define `tiles` as a VIEW over
    map+images (no rowid) — read_mbtiles must fall back to a
    (zoom_level, tile_column) range scan (round-2 advice)."""
    import hashlib
    import sqlite3
    path = str(tmp_path / "view.mbtiles")
    con = sqlite3.connect(path)
    con.executescript("""
        CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER,
                          tile_row INTEGER, tile_id TEXT);
        CREATE TABLE images (tile_id TEXT PRIMARY KEY, tile_data BLOB);
        CREATE VIEW tiles AS
          SELECT map.zoom_level, map.tile_column, map.tile_row,
                 images.tile_data
          FROM map JOIN images ON images.tile_id = map.tile_id;
        CREATE UNIQUE INDEX map_index
          ON map (zoom_level, tile_column, tile_row);
    """)
    expected = {}
    for r in tiles_df.collect():
        data = bytes(r.tile)
        tid = hashlib.md5(data).hexdigest()
        flipped = (1 << r.z) - 1 - r.y
        con.execute("INSERT OR IGNORE INTO images VALUES (?, ?)",
                    (tid, sqlite3.Binary(data)))
        con.execute("INSERT INTO map VALUES (?,?,?,?)",
                    (r.z, r.x, flipped, tid))
        expected[(r.z, r.x, r.y)] = data
    con.commit()
    con.close()
    back = sinks.read_mbtiles(spark, path, chunk_rows=7)
    got = {(r.z, r.x, r.y): bytes(r.tile) for r in back.collect()}
    assert got == expected


def test_pmtiles_leaf_directories(spark, tmp_path):
    """A >50k-entry archive whose root provably exceeds the 16 KiB
    budget must spill to leaf directories and read back byte-identical
    (round-2 verdict item 4; PMTiles v3 spec §3-4)."""
    import numpy as np
    rng = np.random.default_rng(7)
    n = 52_000
    seen = set()
    rows = []
    while len(rows) < n:
        x = int(rng.integers(0, 1 << 14))
        y = int(rng.integers(0, 1 << 14))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        ln = int(rng.integers(20, 60))
        rows.append((14, x, y, bytes(rng.integers(0, 256, ln,
                                                  dtype=np.uint8))))
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    path = str(tmp_path / "big.pmtiles")
    assert sinks.write_pmtiles(df, path, {"name": "big"}) == n
    import struct as _struct
    with open(path, "rb") as f:
        header = f.read(127)
    root_len, leaf_len = _struct.unpack_from("<Q", header, 16)[0], \
        _struct.unpack_from("<Q", header, 48)[0]
    assert leaf_len > 0, "root must have spilled to leaves"
    assert root_len <= 16384 - 127
    back = sinks.read_pmtiles(spark, path)
    a = {(r.z, r.x, r.y): bytes(r.tile) for r in df.collect()}
    b = {(r.z, r.x, r.y): bytes(r.tile) for r in back.collect()}
    assert a == b


def test_pmtiles_byte_stable_across_runs(spark, tiles_df, tmp_path):
    """Two writes of the same tileset produce byte-identical archives:
    every gzip member (root/leaf directories, metadata) pins mtime=0,
    matching the repo-wide byte-stable-tiles rule."""
    p1, p2 = str(tmp_path / "a.pmtiles"), str(tmp_path / "b.pmtiles")
    sinks.write_pmtiles(tiles_df, p1, {"name": "t"})
    sinks.write_pmtiles(tiles_df, p2, {"name": "t"})
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()


def test_output_bytes_invariant_to_order_partitions(spark, tiles_df, tmp_path):
    """order_partitions is the driver-memory knob for the ordered
    stream; the global Hilbert order — and so the archive bytes — must
    not depend on it."""
    p1, p2 = str(tmp_path / "op2.pmtiles"), str(tmp_path / "op64.pmtiles")
    sinks.write_pmtiles(tiles_df, p1, {"name": "t"}, order_partitions=2)
    sinks.write_pmtiles(tiles_df, p2, {"name": "t"}, order_partitions=64)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    m1, m2 = str(tmp_path / "op2.mbtiles"), str(tmp_path / "op64.mbtiles")
    n1 = sinks.write_mbtiles(tiles_df, m1, order_partitions=2)
    n2 = sinks.write_mbtiles(tiles_df, m2, order_partitions=64)
    assert n1 == n2
    t1 = sinks.read_mbtiles(spark, m1)
    t2 = sinks.read_mbtiles(spark, m2)
    rows1 = {(r.z, r.x, r.y): bytes(r.tile) for r in t1.collect()}
    rows2 = {(r.z, r.x, r.y): bytes(r.tile) for r in t2.collect()}
    assert rows1 == rows2
