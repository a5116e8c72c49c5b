"""Per-tile assembly: sort → limit → combine → clip → simplify → MVT.

The whole of the reference's tile worker
(/root/reference/src/tile_worker.cpp:271-538 ProcessObjects/ProcessLayer/
outputProc) becomes the body of ONE ``groupBy(z, x, y).applyInPandas``.
Inside a group everything is numpy/bytes — no Spark calls — so a tile is
assembled by exactly one task, and tiles are embarrassingly parallel.

Stage order per layer (matching the reference):
  minZoom gate (F3, done upstream) -> per-tile sort O1 -> feature_limit O2
  -> clip G9/G10 -> area filter F7 -> combine A3/A4/A5 -> simplify G7/G8
  -> quantize G6 -> degenerate filter F8 -> MVT encode G16 -> gzip G15.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tilemaker_spark.config import EngineConfig
from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.functions import mvt
from tilemaker_spark.functions.coords import TileBbox

TILE_SCHEMA = "z int, x long, y long, tile binary, n_features int, n_bytes int"


def _quantize_dedup(xs: np.ndarray, ys: np.ndarray, is_ring: bool):
    """Drop consecutive duplicate quantized points (scaleRing backtrack
    guard, reference src/coordinates_geom.cpp:36-56, simplified to
    adjacent-dup removal) and enforce minimum sizes (F8,
    src/tile_worker.cpp:134-149)."""
    if len(xs) == 0:
        return None
    keep = np.ones(len(xs), dtype=bool)
    keep[1:] = (np.diff(xs) != 0) | (np.diff(ys) != 0)
    xs, ys = xs[keep], ys[keep]
    if is_ring and len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if is_ring and len(xs) < 3:
        return None
    if not is_ring and len(xs) < 2:
        return None
    return list(zip(xs.tolist(), ys.tolist()))


def _simplify_part(part: np.ndarray, tol: float, algo: str, is_ring: bool) -> np.ndarray:
    if tol <= 0 or len(part) < 3:
        return part
    if algo == "visvalingam":
        return G.simplify_visvalingam(part, tol, is_ring=is_ring)
    if is_ring:
        # close, simplify, re-open (preserves endpoints = ring anchor)
        closed = np.vstack([part, part[:1]])
        out = G.simplify_dp(closed, tol)
        return out[:-1] if len(out) > 1 else part
    return G.simplify_dp(part, tol)


def _assemble_one_tile(z: int, x: int, y: int, rows: pd.DataFrame,
                       config: EngineConfig) -> tuple:
    bbox = TileBbox(z, x, y, hires=config.high_resolution)
    clip_box = bbox.clipping_box
    extend_box = bbox.extend_box()
    layers_out = []
    n_features = 0

    for target, members in config.layer_order():
        sub = rows[rows["layer"].isin(members)]
        if len(sub) == 0:
            continue
        lc = config.layers[members[0]]
        if not (lc.minzoom <= z <= lc.maxzoom):
            continue
        # O1 per-tile sort: (z_order asc/desc, feature_id) — the layer/
        # geomType components of the reference sort are constant here
        sub = sub.sort_values(
            ["z_order", "feature_id"],
            ascending=[lc.z_order_ascending, True])
        # U3/A2 dedup of identical output objects
        sub = sub.drop_duplicates(["feature_id", "geom_type", "z_order"])
        # O2 feature limit
        if lc.feature_limit > 0 and z < lc.feature_limit_below:
            sub = sub.head(lc.feature_limit)

        tol = lc.simplify_tolerance_at(z)
        min_area = lc.filter_area_at(z)

        lb = mvt.LayerBuilder(target, extent=config.extent,
                              version=config.mvt_version)
        combine_pts: dict = {}

        for row in sub.itertuples(index=False):
            gt = int(row.geom_type)
            parts = [np.asarray(p, dtype=np.float64).reshape(-1, 2)
                     for p in row.geom]
            attrs = sorted((row.attrs or {}).items())
            fid = int(row.feature_id) if config.include_ids else None

            if gt == G.GEOM_POINT:
                pxs, pys = [], []
                for p in parts:
                    inb = ((p[:, 0] >= clip_box[0]) & (p[:, 0] <= clip_box[2])
                           & (p[:, 1] >= clip_box[1]) & (p[:, 1] <= clip_box[3]))
                    if inb.any():
                        qx, qy = bbox.scale_xy(p[inb, 0], p[inb, 1])
                        pxs.extend(qx.tolist())
                        pys.extend(qy.tolist())
                if not pxs:
                    continue
                pts = list(dict.fromkeys(zip(pxs, pys)))
                if lc.combine_points:
                    # A3 — combine compatible points into one multipoint
                    key = (int(row.z_order), tuple(attrs))
                    combine_pts.setdefault(key, []).extend(pts)
                    continue
                lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry(pts),
                               attrs=attrs, feature_id=fid)
                n_features += 1

            elif gt == G.GEOM_LINE:
                out_lines = []
                for part in parts:
                    for run in G.clip_line_to_box(part, extend_box):
                        s = _simplify_part(run, tol, lc.simplify_algorithm, False)
                        qx, qy = bbox.scale_xy(s[:, 0], s[:, 1])
                        q = _quantize_dedup(qx, qy, is_ring=False)
                        if q:
                            out_lines.append(q)
                if not out_lines:
                    continue
                lb.add_feature(mvt.GEOM_LINESTRING,
                               mvt.encode_line_geometry(out_lines),
                               attrs=attrs, feature_id=fid)
                n_features += 1

            else:  # polygon
                clipped = G.clip_polygon_to_box(parts, clip_box)
                if min_area > 0 and clipped:
                    # F7 — drop parts/holes below zoom-scaled area
                    clipped = [r for r in clipped
                               if abs(G.ring_area(r)) >= min_area]
                out_rings = []
                for ring in clipped:
                    s = _simplify_part(ring, tol, lc.simplify_algorithm, True)
                    if len(s) < 3:
                        continue
                    qx, qy = bbox.scale_xy(s[:, 0], s[:, 1])
                    q = _quantize_dedup(qx, qy, is_ring=True)
                    if q:
                        out_rings.append(q)
                if not out_rings:
                    continue
                lb.add_feature(mvt.GEOM_POLYGON,
                               mvt.encode_polygon_geometry(out_rings),
                               attrs=attrs, feature_id=fid)
                n_features += 1

        for (zo, attrs_t), pts in combine_pts.items():
            uniq = list(dict.fromkeys(pts))
            lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry(uniq),
                           attrs=list(attrs_t), feature_id=None)
            n_features += 1

        if lb.features:
            layers_out.append(lb)

    tile_bytes = mvt.encode_tile(layers_out)
    if config.compress != "none":
        tile_bytes = mvt.compress_tile(tile_bytes, config.compress)
    return tile_bytes, n_features


def make_assembler(config: EngineConfig):
    """Returns the applyInPandas function for groupBy(z, x, y)."""

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        tile, n = _assemble_one_tile(z, x, y, pdf, config)
        if n == 0:
            return pd.DataFrame(columns=["z", "x", "y", "tile", "n_features",
                                         "n_bytes"]).astype(
                {"z": "int32", "x": "int64", "y": "int64",
                 "n_features": "int32", "n_bytes": "int32"})
        return pd.DataFrame({"z": [np.int32(z)], "x": [np.int64(x)],
                             "y": [np.int64(y)], "tile": [tile],
                             "n_features": [np.int32(n)],
                             "n_bytes": [np.int32(len(tile))]})

    return assemble


def assemble_tiles(feature_tiles, config: EngineConfig):
    """feature_tiles (with z, x, y + feature cols) -> tiles DataFrame.

    The groupBy keys on (z, x, y); Spark's AQE handles shuffle-size skew
    and `apply_feature_limit` (called upstream) bounds group cardinality.
    """
    cols = ["z", "x", "y", "feature_id", "layer", "geom_type", "z_order",
            "attrs", "geom"]
    return (feature_tiles.select(*cols)
            .groupBy("z", "x", "y")
            .applyInPandas(make_assembler(config), schema=TILE_SCHEMA))
