"""Hierarchical cover+clip (the clip-cache recast): the descent path
must produce the SAME rendered tiles as the flat cover+rollup path, and
spend asymptotically less clip work on deep zoom ranges."""

import gzip
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import EngineConfig, LayerConfig
from tilemaker_spark.functions import mvt
from tilemaker_spark.functions.coords import lat2latp
from tilemaker_spark.operators.tile_assembly import assemble_tiles
from tilemaker_spark.operators.tiling import (
    ancestor_rollup,
    cover_clip_explode,
    cover_explode,
)

FEATURE_SCHEMA = ("feature_id long, layer string, geom_type int, "
                  "min_zoom int, z_order int, attrs map<string,string>, "
                  "geom array<array<double>>")


def _cfg(basezoom):
    cfg = EngineConfig(basezoom=basezoom, minzoom=0, maxzoom=basezoom,
                       compress="none", hot_tile_salt=0)
    cfg.layers["lines"] = LayerConfig(name="lines", minzoom=0, maxzoom=14)
    cfg.layers["polys"] = LayerConfig(name="polys", minzoom=0, maxzoom=14)
    return cfg


def _features(spark):
    def latp_ring(pts):
        return [float(v) for lon, lat in pts for v in (lon, lat2latp(lat))]

    # a multi-tile polygon, a polygon with a hole, and a long line
    rows = [
        (1, "polys", 3, 0, 0, {"k": "a"},
         [latp_ring([(-10, 30), (15, 30), (15, 52), (-10, 52)]),
          latp_ring([(0, 40), (0, 45), (5, 45), (5, 40)])[::-1] if False
          else latp_ring([(0, 45), (5, 45), (5, 40), (0, 40)])]),
        (2, "polys", 3, 0, 0, {"k": "b"},
         [latp_ring([(100, -20), (140, -20), (120, 15)])]),
        (3, "lines", 2, 0, 0, {"k": "c"},
         [latp_ring([(-60 + i * 1.7, 10 + 15 * np.sin(i / 3))
                     for i in range(40)])]),
    ]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def _tiles_map(rows):
    out = {}
    for r in rows:
        b = bytes(r.tile)
        if b[:2] == b"\x1f\x8b":
            b = gzip.decompress(b)
        out[(r.z, r.x, r.y)] = mvt.decode_tile(b)
    return out


def _norm(dec):
    """Tile content as a canonical comparable structure. Polygon rings
    are rotated to start at their minimum vertex: clipping an
    already-clipped ring can start Sutherland-Hodgman from a different
    vertex, which rotates the (identical) ring."""
    def canon_ring(part, is_poly):
        pts = [tuple(p) for p in part]
        if is_poly and len(pts) > 1:
            i = min(range(len(pts)), key=lambda j: pts[j])
            pts = pts[i:] + pts[:i]
        return tuple(pts)

    out = {}
    for lname, layer in dec.items():
        feats = []
        for f in layer["features"]:
            is_poly = f["type"] == 3
            feats.append((f["id"], f["type"],
                          tuple(sorted(f["attrs"].items())),
                          tuple(sorted(canon_ring(p, is_poly)
                                       for p in f["geom"]))))
        out[lname] = sorted(feats)
    return out


@pytest.mark.parametrize("basezoom", [6])
def test_hierarchical_matches_flat(spark, basezoom):
    cfg = _cfg(basezoom)
    feats = _features(spark)

    flat = cover_explode(feats, basezoom)
    flat = ancestor_rollup(flat, 0, basezoom)
    flat = flat.filter(F.col("z") >= F.col("min_zoom"))
    t_flat = _tiles_map(assemble_tiles(flat, cfg, num_partitions=8).collect())

    hier = cover_clip_explode(feats, 0, basezoom)
    hier = hier.filter(F.col("z") >= F.col("min_zoom"))
    t_hier = _tiles_map(assemble_tiles(hier, cfg, num_partitions=8).collect())

    # same tile set (hierarchical may only drop tiles that render empty;
    # with these fixtures the sets must be equal)
    assert set(t_hier) == set(t_flat)
    for key in t_flat:
        assert _norm(t_hier[key]) == _norm(t_flat[key]), key


def test_hierarchical_row_counts_sane(spark):
    feats = _features(spark)
    hier = cover_clip_explode(feats, 0, 6)
    rows = hier.groupBy("z").count().orderBy("z").collect()
    zs = [r.z for r in rows]
    assert zs == list(range(0, 7))
    # tile counts grow with zoom for multi-tile geometries
    counts = [r["count"] for r in rows]
    assert counts[-1] > counts[0]


def test_hierarchical_pieces_are_local(spark):
    """Every emitted piece must fit its tile's keep box — the proof the
    descent actually clipped (the flat path would carry full geometry)."""
    from tilemaker_spark.functions.coords import TileBbox
    feats = _features(spark)
    rows = cover_clip_explode(feats, 0, 5) \
        .filter(F.col("geom_type") == 3).collect()
    assert rows
    for r in rows:
        bbox = TileBbox(r.z, r.x, r.y)
        cminx, cminy, cmaxx, cmaxy = bbox.clipping_box
        eps = (cmaxx - cminx) * 1e-9
        for part in r.geom:
            a = np.asarray(part, dtype=np.float64).reshape(-1, 2)
            assert a[:, 0].min() >= cminx - eps
            assert a[:, 0].max() <= cmaxx + eps
            assert a[:, 1].min() >= cminy - eps
            assert a[:, 1].max() <= cmaxy + eps


def test_hierarchical_clip_work_shrinks(spark):
    """Deep-zoom clip cost: the flat path carries the FULL ring to every
    tile row; the descent's per-tile pieces must be far smaller in
    total vertex volume at the base zoom."""
    n_v = 4000
    ang = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
    ring = []
    for a in ang:
        ring.extend([float(20 * np.cos(a)), float(20 * np.sin(a) + 20)])
    feats = spark.createDataFrame(
        [(1, "polys", 3, 0, 0, {}, [ring])], FEATURE_SCHEMA)
    bz = 8
    hier = cover_clip_explode(feats, 0, bz).filter(F.col("z") == bz)
    flat = cover_explode(feats, bz)
    n_tiles = flat.count()
    assert hier.count() == n_tiles  # identical tile membership
    hier_verts = hier.select(
        F.sum(F.aggregate(F.transform("geom", lambda p: F.size(p)),
                          F.lit(0), lambda a, b: a + b)).alias("v")).first().v
    flat_verts = n_tiles * n_v * 2  # flat assembly re-reads the full ring
    # descent pieces: boundary tiles hold short arcs, interior tiles a
    # 4-5 vertex box — orders of magnitude less data to clip
    assert hier_verts < flat_verts / 10, (hier_verts, flat_verts)


MONACO = "/root/reference/test/monaco.pbf"


@pytest.mark.skipif(not __import__("os").path.exists(MONACO),
                    reason="monaco fixture unavailable")
def test_hierarchical_matches_flat_monaco(spark):
    """Real-data equivalence: monaco ways through both Stage-2 paths
    produce identical rendered tiles (canonical ring rotation)."""
    from tilemaker_spark import sources_pbf
    from tilemaker_spark.config import default_config
    from tilemaker_spark.operators.profile import features_from_ways

    nodes, ways, _ = sources_pbf.read_pbf_tables(spark, MONACO)
    cfg = default_config()
    cfg.basezoom = 14
    cfg.compress = "none"
    cfg.hot_tile_salt = 0
    feats = features_from_ways(nodes, ways)

    flat = cover_explode(feats, 14)
    flat = ancestor_rollup(flat, 10, 14)
    flat = flat.filter(F.col("z") >= F.col("min_zoom"))
    t_flat = _tiles_map(assemble_tiles(flat, cfg, num_partitions=16).collect())

    hier = cover_clip_explode(feats, 10, 14)
    hier = hier.filter(F.col("z") >= F.col("min_zoom"))
    t_hier = _tiles_map(assemble_tiles(hier, cfg, num_partitions=16).collect())

    assert set(t_hier) == set(t_flat)
    n_checked = 0
    for key in t_flat:
        assert _norm(t_hier[key]) == _norm(t_flat[key]), key
        n_checked += 1
    assert n_checked >= 10


def test_pipeline_hierarchical_config(spark, tmp_path_factory):
    """EngineConfig.hierarchical_clip drives Stage 2 through the descent
    path end-to-end (checkpoint + resume + same tile count as flat)."""
    from tilemaker_spark.config import default_config
    from tilemaker_spark.fixtures import (make_nodes_ways, make_pages,
                                          make_relations)
    from tilemaker_spark.plans.pipeline import TilePipeline

    pages = make_pages(spark, 500)
    nodes, ways = make_nodes_ways(spark)
    # multipolygon relations push holes through feature_tiles_geom
    relations, rel_ways, rel_nodes = make_relations(spark)
    ways_all = ways.unionByName(rel_ways)
    nodes_all = nodes.unionByName(rel_nodes)

    outs = {}
    for flag in (False, True):
        cfg = default_config()
        cfg.basezoom = 10
        cfg.hierarchical_clip = flag
        wd = str(tmp_path_factory.mktemp(f"hier_{flag}"))
        pipe = TilePipeline(spark, cfg, workdir=wd)
        tiles = pipe.run(pages, nodes=nodes_all, ways=ways_all,
                         relations=relations, force=True)
        rows = tiles.collect()
        outs[flag] = {(r.z, r.x, r.y): r.n_features for r in rows}
        # full rendered content, canonical ring rotation (the verdict's
        # pipeline-level equivalence, not just counts)
        outs[(flag, "content")] = {k: _norm(v)
                                   for k, v in _tiles_map(rows).items()}
        # resume works on the new layout
        pipe2 = TilePipeline(spark, cfg, workdir=wd)
        t2 = pipe2.run(pages, nodes=nodes_all, ways=ways_all,
                       relations=relations)
        assert pipe2.metrics["stages"]["tiles"].get("resumed") is True
        assert t2.count() == len(outs[flag])
    assert outs[True] == outs[False]
    assert outs[(True, "content")] == outs[(False, "content")]


def test_stage2_mode_mismatch_forces_recompute(spark, tmp_path_factory):
    """A workdir written by the hierarchical split holds only POINT rows
    under 'feature_tiles'; resuming it with hierarchical_clip=False must
    recompute Stage 2 (mode fingerprint guard), not silently drop every
    line/polygon feature."""
    from tilemaker_spark.config import default_config
    from tilemaker_spark.fixtures import make_nodes_ways, make_pages
    from tilemaker_spark.plans.pipeline import TilePipeline

    pages = make_pages(spark, 200)
    nodes, ways = make_nodes_ways(spark)

    def run(wd, hier, force=False):
        cfg = default_config()
        cfg.basezoom = 10
        cfg.hierarchical_clip = hier
        pipe = TilePipeline(spark, cfg, workdir=wd)
        tiles = pipe.run(pages, nodes=nodes, ways=ways, force=force)
        return pipe, {(r.z, r.x, r.y): r.n_features for r in tiles.collect()}

    wd = str(tmp_path_factory.mktemp("mode_guard"))
    _, hier_out = run(wd, hier=True, force=True)

    # flat resume of the hier workdir: guard must force Stage 2+3
    pipe2, flat_out = run(wd, hier=False)
    assert "resumed" not in pipe2.metrics["stages"]["feature_tiles"]
    assert "resumed" not in pipe2.metrics["stages"]["tiles"]
    assert flat_out == hier_out  # lines/polygons all present

    # same-mode re-run after the guard rewrite still resumes cleanly
    pipe3, flat2 = run(wd, hier=False)
    assert pipe3.metrics["stages"]["tiles"].get("resumed") is True
    assert flat2 == flat_out

    # and flipping back to hier forces again (fingerprint now says flat)
    pipe4, hier2 = run(wd, hier=True)
    assert "resumed" not in pipe4.metrics["stages"]["feature_tiles"]
    assert hier2 == hier_out


def test_stage2_mode_flip_crash_leaves_no_stale_tiles(spark,
                                                      tmp_path_factory):
    """Crash-safety ordering of the mode guard: a mode-flip run that
    dies BEFORE rebuilding the checkpoints must not bequeath a workdir
    whose fingerprint matches the new mode while 'tiles' still holds
    the other mode's bytes (the next run would silently resume them).
    The guard deletes the stale stage dirs before touching the
    fingerprint, so either the crash re-detects the mismatch or the
    stale dirs are already gone."""
    import os

    from tilemaker_spark.config import default_config
    from tilemaker_spark.fixtures import make_nodes_ways, make_pages
    from tilemaker_spark.plans.pipeline import TilePipeline

    pages = make_pages(spark, 200)
    nodes, ways = make_nodes_ways(spark)

    def mk(hier):
        cfg = default_config()
        cfg.basezoom = 10
        cfg.hierarchical_clip = hier
        return cfg

    wd = str(tmp_path_factory.mktemp("mode_crash"))
    pipe = TilePipeline(spark, mk(False), workdir=wd)
    flat_tiles = pipe.run(pages, nodes=nodes, ways=ways, force=True)
    flat_out = {(r.z, r.x, r.y): r.n_features for r in flat_tiles.collect()}
    assert os.path.exists(os.path.join(wd, "tiles"))

    # flip to hier, but crash on the FIRST checkpoint write (after the
    # guard has run, before any stage dir is rebuilt)
    crash_pipe = TilePipeline(spark, mk(True), workdir=wd)
    orig = TilePipeline._checkpoint

    def boom(self, df, name, force=False):
        if name in ("feature_tiles", "feature_tiles_geom", "tiles"):
            raise RuntimeError("simulated mid-run crash")
        return orig(self, df, name, force=force)

    TilePipeline._checkpoint = boom
    try:
        import pytest
        with pytest.raises(RuntimeError, match="simulated"):
            crash_pipe.run(pages, nodes=nodes, ways=ways)
    finally:
        TilePipeline._checkpoint = orig

    # the stale flat 'tiles' checkpoint must be gone
    assert not os.path.exists(os.path.join(wd, "tiles"))

    # the next hier run recomputes and matches a clean hier run
    pipe2 = TilePipeline(spark, mk(True), workdir=wd)
    t2 = pipe2.run(pages, nodes=nodes, ways=ways)
    assert pipe2.metrics["stages"]["tiles"].get("resumed") is not True
    out2 = {(r.z, r.x, r.y): r.n_features for r in t2.collect()}
    assert out2 == flat_out  # hier and flat agree on counts
