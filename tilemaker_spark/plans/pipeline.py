"""End-to-end pipeline orchestration with checkpoint/resume + lineage.

Dataflow (SURVEY.md §7.1), each stage materialized as a parquet
checkpoint so a killed job resumes from the last completed stage — the
sandbox analog of Iceberg snapshot checkpointing demanded by the north
rule. Stage completion is Spark's own atomic _SUCCESS marker; lineage
(row counts, per-partition sizes, wall time) is written next to each
stage as JSON.

    pages -> features -> feature_tiles -> tiles
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilemaker_spark.config import EngineConfig, default_config
from tilemaker_spark.operators.profile import features_from_pages, features_from_ways
from tilemaker_spark.operators.tile_assembly import (
    assemble_tiles,
    assemble_tiles_salted,
)
from tilemaker_spark.operators.tiling import (
    ancestor_rollup,
    apply_feature_limits,
    bbox_tile_filter,
    cover_explode,
    zoom_gates,
)


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _write_lineage(path: str, df_path: str, spark: SparkSession,
                   seconds: float) -> dict:
    """Per-partition lineage for a completed stage: file-level row counts
    straight out of parquet metadata (no extra scan of the data)."""
    import pyarrow.parquet as pq
    parts = []
    total = 0
    for name in sorted(os.listdir(df_path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(df_path, name)).metadata
        parts.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(os.path.join(df_path, name))})
        total += md.num_rows
    lineage = {"stage": os.path.basename(df_path), "rows": total,
               "partitions": len(parts), "seconds": round(seconds, 3),
               "files": parts}
    with open(path, "w") as f:
        json.dump(lineage, f, indent=1)
    return lineage


class TilePipeline:
    """Checkpoint-resumable pages -> tiles run."""

    def __init__(self, spark: SparkSession, config: EngineConfig | None = None,
                 workdir: str = "/tmp/tilemaker_spark_run"):
        self.spark = spark
        self.config = config or default_config()
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.metrics: dict = {"stages": {}}

    @staticmethod
    def _parquet_rows(path: str) -> int | None:
        try:
            import pyarrow.parquet as pq
            total = 0
            for fn in os.listdir(path):
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(path, fn)).metadata.num_rows
            return total
        except Exception:
            return None

    def _checkpoint(self, df: DataFrame, name: str, partition_cols=None,
                    force: bool = False) -> DataFrame:
        path = os.path.join(self.workdir, name)
        if force or not _stage_done(path):
            t0 = time.time()
            writer = df.write.mode("overwrite")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.parquet(path)
            dt = time.time() - t0
            if not partition_cols:
                lineage = _write_lineage(os.path.join(self.workdir, f"{name}.lineage.json"),
                                         path, self.spark, dt)
            else:
                lineage = {"stage": name, "seconds": round(dt, 3)}
            self.metrics["stages"][name] = lineage
        else:
            self.metrics["stages"][name] = {"stage": name, "resumed": True}
        return self.spark.read.parquet(path)

    def run(self, pages: DataFrame, nodes: DataFrame | None = None,
            ways: DataFrame | None = None,
            relations: DataFrame | None = None,
            layer_polygons: DataFrame | None = None,
            extra_features: DataFrame | None = None,
            force: bool = False) -> DataFrame:
        """pages [+ ways [+ relations]] [⋈ layer_polygons] -> tiles.

        layer_polygons (the indexed external layer, J3) enriches every
        page point with the containing polygon's name as an attribute —
        the north-star 'joined point-in-polygon against OSM-style layer
        polygons' step. Broadcast join: zero shuffle on the pages side.
        """
        cfg = self.config
        t_start = time.time()

        # Stage 1 — features (profile over pages [+ ways [+ relations]])
        if layer_polygons is not None:
            from tilemaker_spark.operators.geocode import geocode_pages
            from tilemaker_spark.operators.spatial_join import points_in_polygons
            geo = geocode_pages(pages)
            hits = points_in_polygons(geo, layer_polygons,
                                      point_id="doc_id") \
                .select(F.col("doc_id").alias("feature_id"),
                        F.col("name").alias("_country"))
            feats = features_from_pages(geo, geocode=False)
            # a point matches at most one disjoint polygon; left join
            # keeps pages outside every polygon (attr absent)
            feats = feats.join(hits, "feature_id", "left")
            feats = feats.withColumn(
                "attrs",
                F.when(F.col("_country").isNotNull(),
                       F.map_concat("attrs",
                                    F.create_map(F.lit("country"),
                                                 F.col("_country"))))
                .otherwise(F.col("attrs"))).drop("_country")
            feats = feats.drop("url", "text")
        else:
            feats = features_from_pages(pages).drop("url", "text")
        if nodes is not None and ways is not None:
            feats = feats.unionByName(features_from_ways(nodes, ways))
            if relations is not None:
                from tilemaker_spark.operators.relations import (
                    features_from_relations)
                feats = feats.unionByName(
                    features_from_relations(relations, ways, nodes))
        if extra_features is not None:
            # pre-built feature rows (e.g. a compiled --process profile)
            feats = feats.unionByName(extra_features, allowMissingColumns=True)
        feats = self._checkpoint(feats, "features", force=force)

        # Stage 2 — feature_tiles at basezoom + rollup + gates.
        # The hierarchical branch only matters for lines/polygons; a
        # pages-only run (no way/relation/extra sources) is point-only
        # BY CONSTRUCTION (features_from_pages emits points), so it
        # skips the empty geometry checkpoint statically — no probe
        # action, and the headline keeps the round-2 single-checkpoint
        # shape.
        has_geom_sources = (nodes is not None and ways is not None) \
            or extra_features is not None
        # Checkpoint-mode guard: the two Stage-2 layouts store DIFFERENT
        # row sets under "feature_tiles" (hier split = points only; flat
        # = full basezoom cover). Resuming a workdir written by the
        # other mode would silently drop or duplicate rows, so the mode
        # is fingerprinted in the workdir and a mismatch forces
        # recompute of the Stage-2 checkpoints. Legacy workdirs without
        # a fingerprint: a feature_tiles_geom checkpoint means the hier
        # split wrote them (flat never creates it); plain round-2 flat
        # workdirs stay resumable from either mode (the hier branch
        # filters geom_type on read).
        stage2_mode = ("hier_split" if cfg.hierarchical_clip
                       and has_geom_sources else "flat")
        mode_path = os.path.join(self.workdir, "stage2_mode.json")
        prev_mode = None
        if os.path.exists(mode_path):
            with open(mode_path) as f:
                prev_mode = json.load(f).get("mode")
        elif stage2_mode == "flat" and _stage_done(
                os.path.join(self.workdir, "feature_tiles_geom")):
            prev_mode = "hier_split"
        force_stage2 = force or (
            prev_mode is not None and prev_mode != stage2_mode)
        if prev_mode is not None and prev_mode != stage2_mode:
            # Crash-safety ordering: drop the other-mode checkpoints
            # BEFORE updating the fingerprint. If this run dies mid-way
            # the workdir is in one of two safe states — fingerprint
            # still old (next run re-detects the mismatch and
            # re-deletes) or fingerprint new with the stale dirs gone
            # (next run recomputes). Writing the fingerprint first
            # left a window where a crash bequeathed a same-mode
            # fingerprint pointing at other-mode 'tiles' bytes.
            import shutil
            for stale in ("feature_tiles", "feature_tiles_geom", "tiles"):
                shutil.rmtree(os.path.join(self.workdir, stale),
                              ignore_errors=True)
        with open(mode_path, "w") as f:
            json.dump({"mode": stage2_mode}, f)
        if cfg.hierarchical_clip and has_geom_sources:
            # clip-cache recast (default path): identical tile
            # assignments, line/polygon pieces pre-clipped top-down
            # (see tiling.cover_clip_explode) — per-zoom pieces
            # genuinely differ, so the geometry checkpoint holds every
            # zoom's rows. POINTS stay on the compact basezoom-only
            # cover + post-read rollup: clipping a point is free, and a
            # point-dominant workload (the pages table) would otherwise
            # pay a (basezoom - minzoom)x larger checkpoint for nothing.
            from tilemaker_spark.operators.tiling import cover_clip_explode
            pts = feats.filter(F.col("geom_type") == 1)
            geoms = feats.filter(F.col("geom_type") != 1)
            ftp = cover_explode(pts, cfg.basezoom)
            ftp = self._checkpoint(ftp, "feature_tiles", force=force_stage2)
            # the geom_type filter makes pre-split (round-2 flat)
            # workdirs resumable too: their checkpoint also holds
            # line/polygon rows, which now live in feature_tiles_geom
            ftp = ancestor_rollup(ftp.filter(F.col("geom_type") == 1),
                                  cfg.minzoom, cfg.basezoom)
            ftg = cover_clip_explode(geoms, cfg.minzoom, cfg.basezoom,
                                     hires=cfg.high_resolution)
            ftg = self._checkpoint(ftg, "feature_tiles_geom",
                                   force=force_stage2)
            ft = ftp.unionByName(ftg)
        else:
            # checkpoint ONLY the basezoom assignment: the ancestor
            # rollup is deterministic shift math, so re-deriving it
            # after the read costs a few codegen ops while the
            # checkpoint shrinks ~(basezoom - minzoom)x — at planet
            # scale that is the difference between writing the base
            # cover once and writing it once per zoom level
            ft = cover_explode(feats, cfg.basezoom)
            ft = self._checkpoint(ft, "feature_tiles", force=force_stage2)
            ft = ancestor_rollup(ft, cfg.minzoom, cfg.basezoom)
        layer_zooms = {name: (lc.minzoom, lc.maxzoom)
                       for name, lc in cfg.layers.items()}
        ft = zoom_gates(ft, layer_zooms)
        # F6 — bounding-box tile pruning (reference
        # src/tilemaker.cpp:360-374,425-435): static (z,x,y) range
        # filter; lands before the assembly shuffle so out-of-box tiles
        # never shuffle (no-op for the world bbox)
        ft = bbox_tile_filter(ft, cfg.bounding_box)
        # O2 pre-limit bounds hot groups before the assembly shuffle —
        # config-aware (per-layer limit/below, assembly's draw order) so
        # it prunes a strict superset of what assembly keeps; the old
        # max-across-layers apply_feature_limit dropped rows from
        # unlimited layers and ranked the wrong end of ascending layers
        ft = apply_feature_limits(ft, cfg)

        # Stage 3 — per-tile assembly -> tiles (salted two-phase when the
        # config enables hot-tile salting: city-center skew defense).
        # Persist the derived feature_tiles: the salted path consumes it
        # twice (hot-tile counts + the assembly itself) and the rollup
        # is no longer materialized on disk — without caching both
        # passes would re-derive it from the basezoom checkpoint.
        from pyspark import StorageLevel
        ft = ft.persist(StorageLevel.MEMORY_AND_DISK)
        lazy_tiles = None
        try:
            if cfg.hot_tile_salt > 1:
                tiles = assemble_tiles_salted(ft, cfg)
            else:
                tiles = assemble_tiles(ft, cfg)
            lazy_tiles = tiles
            # force_stage2 propagates: a tiles checkpoint derived from a
            # different Stage-2 mode is just as stale as the stage it read
            tiles = self._checkpoint(tiles, "tiles", force=force_stage2)
        finally:
            ft.unpersist()
            # the checkpoint materialized the plan; release the salted
            # path's internal caches so back-to-back runs in one session
            # (benchmarks, notebooks) don't accumulate storage memory
            for df in getattr(lazy_tiles, "_internal_persists", []):
                df.unpersist()

        self.metrics["total_seconds"] = round(time.time() - t_start, 3)
        # tile count from parquet footers (no extra scan)
        n_tiles = self._parquet_rows(os.path.join(self.workdir, "tiles"))
        if n_tiles is None:
            n_tiles = tiles.count()
        self.metrics["tiles"] = n_tiles
        self.metrics["tiles_per_sec"] = round(
            n_tiles / max(self.metrics["total_seconds"], 1e-9), 2)
        with open(os.path.join(self.workdir, "metrics.json"), "w") as f:
            json.dump(self.metrics, f, indent=1)
        return tiles
