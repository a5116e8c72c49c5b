"""Pure-numpy geometry kernels (no shapely in this environment).

These reimplement, from the published algorithms, the geometry operators
the reference engine uses (citations into /root/reference):

  * supercover Bresenham tile cover  — src/coordinates_geom.cpp:101-189
  * covered-tile fill                — src/coordinates.cpp:52-67
  * Sutherland-Hodgman box clip      — src/geom.cpp:176-246 ("fast_clip")
  * line clip w/ boundary split      — src/tile_data.cpp:223-248
  * Douglas-Peucker simplify         — src/geom.cpp:117-122 (bg::simplify)
  * Visvalingam simplify             — src/visvalingam.cpp:143-265
  * ring area / point-in-polygon     — standard shoelace / ray cast
  * haversine length, spherical area — src/osm_lua_processing.cpp:483-531
  * centroid / polylabel             — src/osm_lua_processing.cpp:804-869
  * endpoint line-merge              — src/tile_worker.cpp:27-75

Geometry representation used across the engine (Arrow-friendly):
  a geometry is ``(geom_type, parts)`` where
    geom_type: 1=point(s), 2=line(s), 3=polygon(s)
    parts: list of float64 arrays of shape (N, 2) in (lon, latp) order.
  For polygons, parts are rings; each ring carries its role implicitly:
  CCW shoelace area >= 0 -> outer, < 0 -> inner (we normalise on build).
  A multipolygon is flattened to [outer1, inner1a, inner1b, outer2, ...].

All functions operate on plain numpy and are unit-testable without Spark.
"""

from __future__ import annotations

import math

import numpy as np

from tilemaker_spark.functions.coords import (
    RADIUS_METER,
    lat2tileyf_np,
    latp2lat_np,
    latp2tileyf_np,
    lon2tilexf_np,
)

GEOM_POINT = 1
GEOM_LINE = 2
GEOM_POLYGON = 3

# threshold above which the reference indexes a polygon by bbox instead of
# exact cover (src/tile_data.cpp:458-466, 525-533)
LARGE_OBJECT_TILES = 16


# ------------------------------------------------------------ tile cover

def supercover_tiles(coords: np.ndarray, z: int) -> set:
    """All (x, y) tiles at zoom z touched by the polyline ``coords``.

    Supercover Bresenham walk between consecutive vertex tiles, exactly
    mirroring impl_insertIntermediateTiles
    (src/coordinates_geom.cpp:101-189): endpoint tiles are always marked,
    and when the error term crosses a tile corner both adjacent tiles are
    marked, so the cover is conservative (no gaps on diagonals).
    """
    coords = np.asarray(coords, dtype=np.float64)
    if coords.size == 0:
        return set()
    txf = lon2tilexf_np(coords[:, 0], z)
    tyf = latp2tileyf_np(coords[:, 1], z)
    tx = txf.astype(np.int64)
    ty = tyf.astype(np.int64)

    tiles = {(int(tx[0]), int(ty[0]))}
    for i in range(1, len(tx)):
        x1, y1 = int(tx[i - 1]), int(ty[i - 1])
        x2, y2 = int(tx[i]), int(ty[i])
        tiles.add((x2, y2))
        tiles.add((x1, y1))
        dx, dy = x2 - x1, y2 - y1
        ystep = -1 if dy < 0 else 1
        xstep = -1 if dx < 0 else 1
        dx, dy = abs(dx), abs(dy)
        ddy, ddx = 2 * dy, 2 * dx
        x, y = x1, y1
        if ddx >= ddy:  # slope <= 1 octants
            errorprev = error = dx
            for _ in range(dx):
                x += xstep
                error += ddy
                if error > ddx:
                    y += ystep
                    error -= ddx
                    if error + errorprev < ddx:
                        tiles.add((x, y - ystep))
                    elif error + errorprev > ddx:
                        tiles.add((x - xstep, y))
                    else:
                        tiles.add((x, y - ystep))
                        tiles.add((x - xstep, y))
                tiles.add((x, y))
                errorprev = error
        else:
            errorprev = error = dy
            for _ in range(dy):
                y += ystep
                error += ddx
                if error > ddy:
                    x += xstep
                    error -= ddy
                    if error + errorprev < ddy:
                        tiles.add((x - xstep, y))
                    elif error + errorprev > ddy:
                        tiles.add((x, y - ystep))
                    else:
                        tiles.add((x - xstep, y))
                        tiles.add((x, y - ystep))
                tiles.add((x, y))
                errorprev = error
        # loop continues from p2
    return tiles


def fill_covered_tiles(tiles: set) -> set:
    """Fill, per x column, every y between the smallest and largest marked
    y *runs* — reproducing fillCoveredTiles (src/coordinates.cpp:52-67),
    which fills gaps between consecutive marked tiles in sorted order.
    """
    filled = set(tiles)
    tile_list = sorted(tiles)  # sorts by x then y, same as reference compare
    # prev_x=None: the reference's prevY = (uint32)-2 is a huge no-fill
    # sentinel on the first iteration; a signed -2 here would spuriously
    # fill from y=-1 for the first tile of column x=0
    prev_x, prev_y = None, 0
    for tx, ty in tile_list:
        if tx == prev_x:
            for fy in range(prev_y + 1, ty):
                filled.add((tx, fy))
        prev_x, prev_y = tx, ty
    return filled


def cover_geometry(geom_type: int, parts: list, z: int):
    """Tiles covering a geometry at zoom z, with large-object handling.

    Returns (tiles, bbox_or_none):
      * small objects: (set of (x,y), None)
      * large polygons (cover >= 16 tiles): (set(), (minx, miny, maxx, maxy))
        — caller emits the bbox *range*, mirroring the reference's R-tree
        path (src/tile_data.cpp:458-466, 500-533).
    Lines are never "large": every touched tile is emitted
    (src/tile_data.cpp:482-496 emits per-tile for multilinestrings).
    Polygon semantics follow addGeometryToIndex(MultiPolygon)
    (src/tile_data.cpp:500-541): per-polygon outer-ring supercover + fill,
    unioned across parts, then the >= 16 test on the union size.
    """
    if geom_type == GEOM_POINT:
        out = set()
        for p in parts:
            p = np.asarray(p, dtype=np.float64)
            xs = lon2tilexf_np(p[:, 0], z).astype(np.int64)
            ys = latp2tileyf_np(p[:, 1], z).astype(np.int64)
            out.update(zip(xs.tolist(), ys.tolist()))
        return out, None

    if geom_type == GEOM_LINE:
        out = set()
        for part in parts:
            out |= supercover_tiles(part, z)
        return out, None

    # polygon: cover each polygon's rings; fill outer cover per polygon
    tiles: set = set()
    for outer, _inners in iter_polygons(parts):
        t = supercover_tiles(outer, z)
        t = fill_covered_tiles(t)
        tiles |= t
    if len(tiles) >= LARGE_OBJECT_TILES:
        xs = [t[0] for t in tiles]
        ys = [t[1] for t in tiles]
        return set(), (min(xs), min(ys), max(xs), max(ys))
    return tiles, None


# ------------------------------------------------------------- ring math

def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area in coordinate units (positive = clockwise in
    screen coords / the reference's outer-ring orientation)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def iter_polygons(parts: list):
    """Group a flattened ring list into (outer, [inners]) polygons.

    Convention: a ring whose signed area's sign matches the first ring's
    sign starts a new polygon; opposite-sign rings are holes of the
    current polygon (matching shapefile winding-order assembly,
    src/shp_processor.cpp:178-224).
    """
    polys = []
    outer_sign = None
    cur_outer, cur_inners = None, []
    for ring in parts:
        ring = np.asarray(ring, dtype=np.float64)
        a = ring_area(ring)
        sign = 1.0 if a >= 0 else -1.0
        if outer_sign is None:
            outer_sign = sign
        if sign == outer_sign or cur_outer is None:
            if cur_outer is not None:
                polys.append((cur_outer, cur_inners))
            cur_outer, cur_inners = ring, []
        else:
            cur_inners.append(ring)
    if cur_outer is not None:
        polys.append((cur_outer, cur_inners))
    return polys


def point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Ray-cast point-in-ring (boundary-inclusive-ish, standard even-odd)."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    n = len(r)
    inside = False
    j = n - 1
    for i in range(n):
        if (y[i] > py) != (y[j] > py):
            xint = (x[j] - x[i]) * (py - y[i]) / (y[j] - y[i]) + x[i]
            if px < xint:
                inside = not inside
        j = i
    return inside


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: many points vs one ring."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, 1), np.roll(y, 1)
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    cond = (y[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x)[None, :] * (py - y[None, :]) / ((y2 - y)[None, :]) + x[None, :]
    crossings = cond & (px < xint)
    return (np.sum(crossings, axis=1) % 2).astype(bool)


def points_in_polygon(px, py, parts: list) -> np.ndarray:
    """Vectorized point-in-(multi)polygon over flattened ring list."""
    px = np.asarray(px, dtype=np.float64)
    result = np.zeros(len(px), dtype=bool)
    for outer, inners in iter_polygons(parts):
        inside = points_in_ring(px, py, outer)
        for inner in inners:
            inside &= ~points_in_ring(px, py, inner)
        result |= inside
    return result


# ----------------------------------------------------------------- clip

def clip_ring_to_box(ring: np.ndarray, box) -> np.ndarray:
    """Sutherland-Hodgman clip of one ring to an axis-aligned box.

    Same role as the reference's fast_clip (src/geom.cpp:176-246). Output
    ring is implicitly closed (first point not repeated); may be empty.
    """
    minx, miny, maxx, maxy = box
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 2)
    # drop an explicit closing point; SH works on the open cycle
    if len(pts) > 1 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
        pts = pts[:-1]

    def clip_edge(poly, keep, intersect):
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = keep(prev)
        for cur in poly:
            cur_in = keep(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return np.asarray(out, dtype=np.float64).reshape(-1, 2)

    def ix(p, q, xval):
        t = (xval - p[0]) / (q[0] - p[0])
        return (xval, p[1] + t * (q[1] - p[1]))

    def iy(p, q, yval):
        t = (yval - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), yval)

    pts = clip_edge(pts, lambda p: p[0] >= minx, lambda p, q: ix(p, q, minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, lambda p, q: ix(p, q, maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny, lambda p, q: iy(p, q, miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, lambda p, q: iy(p, q, maxy))
    return pts


def clip_ring_to_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clip of a ring to an arbitrary CONVEX clip ring
    (generalizes clip_ring_to_box; the AreaIntersecting join uses it for
    convex build polygons). clip_ring must be positively wound (CCW in
    math coords); output is open-representation, possibly empty."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 2)
    if len(pts) > 1 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
        pts = pts[:-1]
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(clip) > 1 and (clip[0] == clip[-1]).all():
        clip = clip[:-1]
    if ring_area(clip) < 0:
        clip = clip[::-1]

    for i in range(len(clip)):
        if len(pts) == 0:
            break
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        ex, ey = b[0] - a[0], b[1] - a[1]

        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= 0

        def intersect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            if denom == 0:
                return (q[0], q[1])
            t = (ex * (a[1] - p[1]) - ey * (a[0] - p[0])) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        out = []
        prev = pts[-1]
        prev_in = inside(prev)
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(tuple(cur))
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def ring_is_convex(ring: np.ndarray) -> bool:
    """True when all turns of the (open) ring have the same sign
    (collinear runs allowed) — the dispatch test between the fast
    Sutherland-Hodgman area path and the general overlay kernel."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) < 3:
        return True
    v = np.roll(r, -1, axis=0) - r
    cross = v[:, 0] * np.roll(v[:, 1], -1) - v[:, 1] * np.roll(v[:, 0], -1)
    scale = np.abs(cross).max()
    if scale == 0:
        return True
    tol = scale * 1e-12
    return bool((cross >= -tol).all() or (cross <= tol).all())


def intersection_area_with_convex(parts: list, clip_ring: np.ndarray) -> float:
    """|geometry ∩ convex polygon| — AreaIntersecting analog
    (src/osm_lua_processing.cpp:435-453) for convex build polygons."""
    total = 0.0
    for outer, inners in iter_polygons(parts):
        c = clip_ring_to_convex(outer, clip_ring)
        total += abs(ring_area(c))
        for inner in inners:
            ci = clip_ring_to_convex(inner, clip_ring)
            total -= abs(ring_area(ci))
    return max(total, 0.0)


def clip_polygon_to_box(parts: list, box) -> list:
    """Clip a flattened polygon ring list to a box; drops collapsed rings.

    Mirrors the polygon branch of TileDataSource::getTileData clip
    (src/tile_data.cpp:300-355) with Sutherland-Hodgman in place of
    Boost fast_clip; orientation of surviving rings is preserved.
    """
    out = []
    for ring in parts:
        orig_sign = 1.0 if ring_area(ring) >= 0 else -1.0
        clipped = clip_ring_to_box(ring, box)
        if len(clipped) < 3:
            continue
        if abs(ring_area(clipped)) == 0.0:
            continue
        new_sign = 1.0 if ring_area(clipped) >= 0 else -1.0
        if new_sign != orig_sign:  # SH preserves orientation; belt & braces
            clipped = clipped[::-1]
        out.append(clipped)
    return out


def clip_line_to_box(line: np.ndarray, box) -> list:
    """Clip a linestring to a box, splitting where it exits.

    Mirrors the multilinestring clip (src/tile_data.cpp:223-248): each
    maximal in-box run becomes its own output linestring with exact
    boundary intersection points at the cut.
    """
    minx, miny, maxx, maxy = box
    pts = np.asarray(line, dtype=np.float64)
    if len(pts) == 0:
        return []

    # Liang-Barsky parametric clip per segment
    def lb(p, q):
        x0, y0 = float(p[0]), float(p[1])
        dx, dy = float(q[0]) - x0, float(q[1]) - y0
        t0, t1 = 0.0, 1.0
        for pp, qq in ((-dx, x0 - minx), (dx, maxx - x0), (-dy, y0 - miny), (dy, maxy - y0)):
            if pp == 0.0:
                if qq < 0.0:
                    return None
            else:
                t = qq / pp
                if pp < 0.0:
                    if t > t1:
                        return None
                    if t > t0:
                        t0 = t
                else:
                    if t < t0:
                        return None
                    if t < t1:
                        t1 = t
        # exact endpoints at t=0/1: recomputing p + 1.0*d can differ from
        # q by one ulp, which made the run-continuity check below split
        # fully-interior polylines at arbitrary vertices
        a = (x0, y0) if t0 == 0.0 else (x0 + t0 * dx, y0 + t0 * dy)
        b = (float(q[0]), float(q[1])) if t1 == 1.0 \
            else (x0 + t1 * dx, y0 + t1 * dy)
        return (a, b)

    runs = []
    cur = []
    for i in range(len(pts) - 1):
        seg = lb(pts[i], pts[i + 1])
        if seg is None:
            if len(cur) >= 2:
                runs.append(np.asarray(cur, dtype=np.float64))
            cur = []
            continue
        a, b = seg
        if not cur:
            cur = [a]
        elif cur[-1] != a:
            # re-entered the box: start a new run
            if len(cur) >= 2:
                runs.append(np.asarray(cur, dtype=np.float64))
            cur = [a]
        cur.append(b)
    if len(cur) >= 2:
        runs.append(np.asarray(cur, dtype=np.float64))
    return runs


# ------------------------------------------------------------- simplify

def simplify_dp(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker with perpendicular-distance tolerance.

    Same contract as boost::geometry::simplify used by the reference
    (src/geom.cpp:117-122). Iterative stack implementation.
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2 or tolerance <= 0:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tolerance * tolerance
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = pts[lo:hi + 1]
        a, b = pts[lo], pts[hi]
        ab = b - a
        ab2 = float(ab @ ab)
        d = seg[1:-1] - a
        if ab2 == 0.0:
            dist2 = np.sum(d * d, axis=1)
        else:
            t = np.clip((d @ ab) / ab2, 0.0, 1.0)
            proj = a + t[:, None] * ab
            dd = seg[1:-1] - proj
            dist2 = np.sum(dd * dd, axis=1)
        if dist2.size == 0:
            continue
        imax = int(np.argmax(dist2))
        if dist2[imax] > tol2:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return pts[keep]


def _segs_hit_count(p: np.ndarray, q: np.ndarray, segs: np.ndarray) -> int:
    """Count segments (k,4 array: x0,y0,x1,y1) intersecting segment p→q,
    endpoint-touching inclusive (boost segment-segment `intersects`
    semantics) — the vectorized stand-in for the reference's R-tree
    query (src/geom.cpp:57-62)."""
    if segs.size == 0:
        return 0
    a0x, a0y = segs[:, 0], segs[:, 1]
    a1x, a1y = segs[:, 2], segs[:, 3]
    rx, ry = q[0] - p[0], q[1] - p[1]
    d1 = rx * (a0y - p[1]) - ry * (a0x - p[0])
    d2 = rx * (a1y - p[1]) - ry * (a1x - p[0])
    sx, sy = a1x - a0x, a1y - a0y
    d3 = sx * (p[1] - a0y) - sy * (p[0] - a0x)
    d4 = sx * (q[1] - a0y) - sy * (q[0] - a0x)
    straddle1 = ((d1 <= 0) & (d2 >= 0)) | ((d1 >= 0) & (d2 <= 0))
    straddle2 = ((d3 <= 0) & (d4 >= 0)) | ((d3 >= 0) & (d4 <= 0))
    bb = ((np.minimum(a0x, a1x) <= max(p[0], q[0]))
          & (np.maximum(a0x, a1x) >= min(p[0], q[0]))
          & (np.minimum(a0y, a1y) <= max(p[1], q[1]))
          & (np.maximum(a0y, a1y) >= min(p[1], q[1])))
    return int(np.count_nonzero(straddle1 & straddle2 & bb))


def _ring_segs(ring: np.ndarray) -> np.ndarray:
    """(n,4) segment array of a closed ring given open vertices."""
    c = np.vstack([ring, ring[:1]])
    return np.hstack([c[:-1], c[1:]])


def ring_perimeter(ring: np.ndarray) -> float:
    """Closed-ring perimeter of an open vertex list."""
    d = np.diff(np.vstack([ring, ring[:1]]), axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


class _SegGrid:
    """Uniform spatial hash over segments — the reference's simplify
    R-tree (src/geom.cpp:22-27) recast: add/remove segments as the
    simplification rewires the ring, query the intersection count of a
    candidate chord against only the segments whose bboxes share a grid
    cell with the chord's bbox (any intersecting segment necessarily
    registers in a cell inside the chord's bbox range, so the gather
    cannot miss). Turns the guard from O(n) per candidate into
    O(local density)."""

    __slots__ = ("cell", "cells", "segs")

    def __init__(self, cell: float):
        self.cell = max(cell, 1e-300)
        self.cells: dict = {}
        self.segs: dict = {}

    def _range(self, x0, y0, x1, y1):
        c = self.cell
        return (int(min(x0, x1) // c), int(max(x0, x1) // c),
                int(min(y0, y1) // c), int(max(y0, y1) // c))

    def add(self, sid, p, q):
        rec = (float(p[0]), float(p[1]), float(q[0]), float(q[1]))
        self.segs[sid] = rec
        ix0, ix1, iy0, iy1 = self._range(*rec)
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                self.cells.setdefault((ix, iy), set()).add(sid)

    def remove(self, sid):
        rec = self.segs.pop(sid)
        ix0, ix1, iy0, iy1 = self._range(*rec)
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                s = self.cells.get((ix, iy))
                if s is not None:
                    s.discard(sid)

    def hit_count(self, p, q) -> int:
        ix0, ix1, iy0, iy1 = self._range(p[0], p[1], q[0], q[1])
        found: set = set()
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                s = self.cells.get((ix, iy))
                if s:
                    found |= s
        if not found:
            return 0
        segs = np.array([self.segs[s] for s in found], dtype=np.float64)
        return _segs_hit_count(np.asarray(p, dtype=np.float64),
                               np.asarray(q, dtype=np.float64), segs)


def _grid_cell_for(ring: np.ndarray, n_segs: int) -> float:
    span = max(float(ring[:, 0].max() - ring[:, 0].min()),
               float(ring[:, 1].max() - ring[:, 1].min()), 1e-300)
    k = min(256, max(8, int(math.isqrt(max(n_segs, 1)))))
    return span / k


def simplify_ring_topo(ring: np.ndarray, tol: float,
                       other_segs: np.ndarray | None = None) -> np.ndarray:
    """G7 — topology-guarded ring simplification, reference parity with
    simplify_ring (src/geom.cpp:15-75):

    * backwards scan removing one middle vertex at a time;
    * a vertex lying on the ring's own bbox envelope is never removed
      (extreme points anchor the ring);
    * removal criterion: max perpendicular distance of ALL ORIGINAL
      vertices spanned by the replacement segment < tol (not just the
      candidate vertex — accumulated error stays bounded);
    * topology guard: the replacement segment must intersect exactly
      the (up to 4) surviving segments adjacent to it and NOTHING else
      — neither the rest of this ring nor ``other_segs`` (segments of
      sibling rings: holes guard against the outer and vice versa), so
      a simplified outer can never cross its holes or itself.

    Input/output rings are open (no closing duplicate). The guard is
    served by a spatial-hash segment grid (see _SegGrid) updated as
    vertices are removed — O(local density) per candidate instead of
    the O(n) rescan that would make vertex-heavy low-zoom pieces
    quadratic.
    """
    ring = np.asarray(ring, dtype=np.float64)
    n = len(ring)
    if tol <= 0 or n < 4:
        return ring
    a = np.vstack([ring, ring[:1]])  # closed: m = n+1 vertices
    m = len(a)
    env_min = a.min(axis=0)
    env_max = a.max(axis=0)
    on_env = ((a[:, 0] == env_min[0]) | (a[:, 1] == env_min[1])
              | (a[:, 0] == env_max[0]) | (a[:, 1] == env_max[1]))
    cell = _grid_cell_for(a, m - 1)
    own = _SegGrid(cell)
    for i in range(m - 1):
        own.add((i, i + 1), a[i], a[i + 1])
    other = None
    if other_segs is not None and len(other_segs):
        other = _SegGrid(cell)
        for i, rec in enumerate(np.asarray(other_segs, dtype=np.float64)):
            other.add(i, rec[0:2], rec[2:4])
    nodes = list(range(m))
    n_segs = m - 1
    for entry in range(m - 3, -1, -1):
        start, middle, end = nodes[entry], nodes[entry + 1], nodes[entry + 2]
        if on_env[middle]:
            continue
        p, q = a[start], a[end]
        span = a[start + 1:end]
        ab = q - p
        ab2 = float(ab @ ab)
        d = span - p
        if ab2 == 0.0:
            dist2 = np.sum(d * d, axis=1)
        else:
            t = np.clip((d @ ab) / ab2, 0.0, 1.0)
            dd = span - (p + t[:, None] * ab)
            dist2 = np.sum(dd * dd, axis=1)
        if dist2.size and float(dist2.max()) >= tol * tol:
            continue
        cnt = own.hit_count(p, q)
        if other is not None:
            cnt += other.hit_count(p, q)
        if cnt == min(4, n_segs):
            del nodes[entry + 1]
            own.remove((start, middle))
            own.remove((middle, end))
            own.add((start, end), p, q)
            n_segs -= 1
    return a[np.asarray(nodes[:-1])]


def _rings_touch(r1: np.ndarray, r2: np.ndarray) -> bool:
    """Cheap areal `intersects`: bbox overlap, then boundary crossing or
    containment of a representative vertex."""
    if (r1[:, 0].max() < r2[:, 0].min() or r2[:, 0].max() < r1[:, 0].min()
            or r1[:, 1].max() < r2[:, 1].min()
            or r2[:, 1].max() < r1[:, 1].min()):
        return False
    segs2 = _ring_segs(r2)
    c1 = np.vstack([r1, r1[:1]])
    for i in range(len(c1) - 1):
        if _segs_hit_count(c1[i], c1[i + 1], segs2):
            return True
    return (point_in_ring(float(r1[0, 0]), float(r1[0, 1]), r2)
            or point_in_ring(float(r2[0, 0]), float(r2[0, 1]), r1))


def _simplify_combine_rings(rings: list, new: np.ndarray,
                            sign: float) -> None:
    """simplify_combine parity (include/geom.h:50-71): append ``new``,
    then union it with any existing ring it intersects whenever the
    union collapses to a single ring; repeat until stable. ``sign`` is
    the winding convention (sign of ring_area) the caller's rings use —
    overlay output is reoriented to it."""
    from tilemaker_spark.functions import overlay as OV
    rings.append(new)
    i = 0
    while i < len(rings) - 1:
        if not _rings_touch(rings[i], rings[-1]):
            i += 1
            continue
        try:
            u = OV.union_many([[rings[i]], [rings[-1]]])
        except Exception:
            i += 1
            continue
        if len(u) != 1:
            i += 1
            continue
        merged = np.asarray(u[0], dtype=np.float64)
        if len(merged) < 3:
            i += 1
            continue
        if (ring_area(merged) > 0) != (sign > 0):
            merged = merged[::-1]
        rings[-1] = merged
        del rings[i]


def simplify_polygon_parts_topo(parts: list, tol: float) -> list:
    """G7 — polygon-level guarded simplification, parity with the
    reference's simplify(Polygon) / simplify(MultiPolygon)
    (src/geom.cpp:77-136, invoked per tile at
    src/tile_worker.cpp:220-228):

    * each hole is simplified guarded against the UN-simplified outer;
      holes that shrink below 3 vertices or perimeter ≤ 3·tol are
      dropped; holes that meet after simplification merge
      (simplify_combine);
    * the outer is then simplified guarded against the surviving
      holes; the polygon survives only if the outer keeps ≥ 3 vertices
      and perimeter > 3·tol;
    * finally polygons whose outers meet after simplification merge.

    ``parts`` is a flat ring list in the iter_polygons sign convention
    (holes wound opposite to outers); the convention is preserved.
    """
    if tol <= 0:
        return parts
    from tilemaker_spark.functions import overlay as OV
    out_polys: list = []
    outer_sign = 1.0
    for outer, inners in iter_polygons(parts):
        outer_sign = 1.0 if ring_area(outer) >= 0 else -1.0
        outer_segs = _ring_segs(outer)
        new_inners: list = []
        for inner in inners:
            si = simplify_ring_topo(inner, tol, outer_segs)
            if len(si) >= 3 and ring_perimeter(si) > 3 * tol:
                _simplify_combine_rings(new_inners, si, -outer_sign)
        guard = (np.vstack([_ring_segs(r) for r in new_inners])
                 if new_inners else None)
        so = simplify_ring_topo(outer, tol, guard)
        if len(so) >= 3 and ring_perimeter(so) > 3 * tol:
            out_polys.append([so] + new_inners)
    # MultiPolygon-level simplify_combine: union polygons whose union
    # is a single polygon (one outer, any holes)
    combined: list = []
    for poly in out_polys:
        combined.append(poly)
        i = 0
        while i < len(combined) - 1:
            if not _rings_touch(combined[i][0], combined[-1][0]):
                i += 1
                continue
            try:
                u = OV.union_many([combined[i], combined[-1]])
            except Exception:
                i += 1
                continue
            outs = [r for r in u if ring_area(r) > 0]
            if len(outs) != 1:
                i += 1
                continue
            poly_rings = []
            for r in u:
                r = np.asarray(r, dtype=np.float64)
                if len(r) < 3:
                    continue
                is_outer = ring_area(r) > 0
                want = outer_sign if is_outer else -outer_sign
                if (ring_area(r) > 0) != (want > 0):
                    r = r[::-1]
                poly_rings.append(r)
            # outer first (union output is already outer-then-holes)
            combined[-1] = poly_rings
            del combined[i]
    return [r for poly in combined for r in poly]


def simplify_visvalingam(coords: np.ndarray, tolerance: float,
                         is_ring: bool = False) -> np.ndarray:
    """Visvalingam-Whyatt effective-area simplification.

    Reimplements the reference's heap-based simplifyVis
    (src/visvalingam.cpp:143-265): remove points whose triangle area is
    below the threshold; reference maps the distance tolerance to an area
    of ``(2*tolerance)^2 / 2`` and keeps >= 4 points on rings.
    """
    import heapq

    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    min_keep = 4 if is_ring else 2
    if n <= min_keep or tolerance <= 0:
        return pts
    area_thresh = (2.0 * tolerance) ** 2 / 2.0

    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)

    def tri_area(i):
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])) / 2.0

    heap = []
    version = np.zeros(n, dtype=np.int64)
    for i in range(1, n - 1):
        heapq.heappush(heap, (tri_area(i), i, 0))

    remaining = n
    while heap and remaining > min_keep:
        area, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if area >= area_thresh:
            break
        alive[i] = False
        remaining -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                version[j] += 1
                heapq.heappush(heap, (tri_area(j), j, int(version[j])))
    return pts[alive]


# ---------------------------------------------------- measures/centroids

def haversine_length_m(coords: np.ndarray) -> float:
    """Spherical (haversine) length in meters over (lon, lat) vertices.

    Matches Length() (src/osm_lua_processing.cpp:516-531): R=6371000,
    great-circle per segment.
    """
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    lon = np.radians(c[:, 0])
    lat = np.radians(c[:, 1])
    dlon = np.diff(lon)
    dlat = np.diff(lat)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlon / 2.0) ** 2
    return float(RADIUS_METER * np.sum(2.0 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))))


def spherical_ring_area_m2(ring_lonlat: np.ndarray) -> float:
    """Spherical-excess ring area in m^2 (abs), matching Area()
    (src/osm_lua_processing.cpp:483-514) which reprojects latp->lat and
    uses a spherical strategy with R=6371000."""
    r = np.asarray(ring_lonlat, dtype=np.float64)
    if len(r) < 3:
        return 0.0
    lon = np.radians(r[:, 0])
    lat = np.radians(r[:, 1])
    lon2 = np.roll(lon, -1)
    lat2 = np.roll(lat, -1)
    # L'Huilier-style excess accumulation via the Girard summation
    total = np.sum((lon2 - lon) * (2.0 + np.sin(lat) + np.sin(lat2)))
    return abs(total * RADIUS_METER * RADIUS_METER / 2.0)


def polygon_area_spherical_m2(parts_lonlat: list) -> float:
    """Outer areas minus hole areas over a flattened ring list."""
    total = 0.0
    for outer, inners in iter_polygons(parts_lonlat):
        total += spherical_ring_area_m2(outer)
        for inner in inners:
            total -= spherical_ring_area_m2(inner)
    return total


def centroid_xy(parts: list, geom_type: int):
    """Area/length/point-weighted centroid like bg::centroid
    (src/osm_lua_processing.cpp:847-857)."""
    if geom_type == GEOM_POINT:
        allp = np.vstack([np.asarray(p, dtype=np.float64) for p in parts])
        return float(allp[:, 0].mean()), float(allp[:, 1].mean())
    if geom_type == GEOM_LINE:
        num = np.zeros(2)
        den = 0.0
        for part in parts:
            p = np.asarray(part, dtype=np.float64)
            seg_len = np.sqrt(np.sum(np.diff(p, axis=0) ** 2, axis=1))
            mid = (p[:-1] + p[1:]) / 2.0
            num += np.sum(mid * seg_len[:, None], axis=0)
            den += float(np.sum(seg_len))
        if den == 0.0:
            return centroid_xy(parts, GEOM_POINT)
        return float(num[0] / den), float(num[1] / den)
    # polygon: shoelace centroid, holes with negative weight
    num = np.zeros(2)
    den = 0.0
    for ring in parts:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cross = x * y2 - x2 * y
        a = float(np.sum(cross)) / 2.0
        if a == 0.0:
            continue
        cx = float(np.sum((x + x2) * cross)) / (6.0 * a)
        cy = float(np.sum((y + y2) * cross)) / (6.0 * a)
        num += np.array([cx, cy]) * a
        den += a
    if den == 0.0:
        return centroid_xy(parts, GEOM_POINT)
    return float(num[0] / den), float(num[1] / den)


def polylabel_xy(parts: list, precision_frac: float = 1e-2):
    """Pole of inaccessibility of the largest polygon (grid-refinement
    variant of Mapbox polylabel, reference include/polylabel.h;
    'biggest outer' selection per src/osm_lua_processing.cpp:820-843)."""
    polys = iter_polygons(parts)
    if not polys:
        return 0.0, 0.0
    outer, inners = max(polys, key=lambda p: abs(ring_area(p[0])))
    rings = [outer] + list(inners)

    def dist_to_edges(px, py):
        best = math.inf
        inside = bool(points_in_polygon(np.array([px]), np.array([py]), rings)[0])
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            a = r
            b = np.roll(r, -1, axis=0)
            ab = b - a
            ap = np.array([px, py]) - a
            ab2 = np.sum(ab * ab, axis=1)
            t = np.where(ab2 > 0, np.clip(np.sum(ap * ab, axis=1) / np.where(ab2 == 0, 1, ab2), 0, 1), 0.0)
            proj = a + t[:, None] * ab
            d = np.sqrt(np.sum((np.array([px, py]) - proj) ** 2, axis=1))
            best = min(best, float(np.min(d)))
        return best if inside else -best

    o = np.asarray(outer, dtype=np.float64)
    minx, miny = o.min(axis=0)
    maxx, maxy = o.max(axis=0)
    size = max(maxx - minx, maxy - miny)
    if size == 0:
        return float(o[0, 0]), float(o[0, 1])
    precision = size * precision_frac
    # grid search with refinement
    best_xy = ((minx + maxx) / 2.0, (miny + maxy) / 2.0)
    best_d = dist_to_edges(*best_xy)
    cell = size / 4.0
    cx0, cy0, cx1, cy1 = minx, miny, maxx, maxy
    while cell > precision:
        xs = np.arange(cx0, cx1 + cell, cell)
        ys = np.arange(cy0, cy1 + cell, cell)
        for x in xs:
            for y in ys:
                d = dist_to_edges(float(x), float(y))
                if d > best_d:
                    best_d, best_xy = d, (float(x), float(y))
        cx0, cy0 = best_xy[0] - cell, best_xy[1] - cell
        cx1, cy1 = best_xy[0] + cell, best_xy[1] + cell
        cell /= 2.0
    return best_xy


# ----------------------------------------------------------- line merge

def merge_lines(lines: list, max_points: int = 6000) -> list:
    """Greedy endpoint chaining of linestrings.

    Reimplements ReorderMultiLinestring (src/tile_worker.cpp:27-75):
    for each unconsumed line, repeatedly append a line starting at our
    endpoint or prepend a line ending at our start, capped at
    ``max_points`` combined vertices.
    """
    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]
    start_points = {}
    end_points = {}
    for i, l in enumerate(lines):
        start_points[(float(l[0, 0]), float(l[0, 1]))] = i
        end_points[(float(l[-1, 0]), float(l[-1, 1]))] = i
    added = [False] * len(lines)
    out = []
    for i in range(len(lines)):
        if added[i]:
            continue
        ls = lines[i]
        added[i] = True
        while True:
            last = (float(ls[-1, 0]), float(ls[-1, 1]))
            j = start_points.get(last)
            if j is not None and not added[j] and len(lines[j]) + len(ls) < max_points:
                ls = np.vstack([ls, lines[j][1:]])
                added[j] = True
                continue
            first = (float(ls[0, 0]), float(ls[0, 1]))
            j = end_points.get(first)
            if j is not None and not added[j] and len(lines[j]) + len(ls) < max_points:
                ls = np.vstack([lines[j][:-1], ls])
                added[j] = True
                continue
            break
        out.append(ls)
    return out


def stitch_rings(ways: list) -> list:
    """Assemble closed rings from way fragments (multipolygon stitch).

    Reimplements the fixpoint merge of OsmMemTiles relation assembly
    (src/osm_store.cpp:64-226): chain fragments sharing endpoints in
    either orientation until closed; unclosed leftovers are dropped.
    Returns list of closed rings (first point == last point removed,
    i.e. open representation).
    """
    frags = [np.asarray(w, dtype=np.float64) for w in ways if len(w) >= 2]
    rings = []
    pending = []
    for f in frags:
        if len(f) >= 4 and f[0, 0] == f[-1, 0] and f[0, 1] == f[-1, 1]:
            rings.append(f[:-1])
        else:
            pending.append(f)
    changed = True
    while changed and pending:
        changed = False
        i = 0
        while i < len(pending):
            cur = pending[i]
            j = i + 1
            merged = False
            while j < len(pending):
                other = pending[j]
                if tuple(cur[-1]) == tuple(other[0]):
                    cur = np.vstack([cur, other[1:]])
                elif tuple(cur[-1]) == tuple(other[-1]):
                    cur = np.vstack([cur, other[::-1][1:]])
                elif tuple(cur[0]) == tuple(other[-1]):
                    cur = np.vstack([other[:-1], cur])
                elif tuple(cur[0]) == tuple(other[0]):
                    cur = np.vstack([other[::-1][:-1], cur])
                else:
                    j += 1
                    continue
                pending.pop(j)
                pending[i] = cur
                merged = changed = True
            if merged and len(cur) >= 4 and tuple(cur[0]) == tuple(cur[-1]):
                rings.append(cur[:-1])
                pending.pop(i)
            else:
                i += 1
    return rings


# -------------------------------------------------- intersection helpers

def _segments_intersect(a1, a2, b1, b2) -> bool:
    d1 = np.cross(b2 - b1, a1 - b1)
    d2 = np.cross(b2 - b1, a2 - b1)
    d3 = np.cross(a2 - a1, b1 - a1)
    d4 = np.cross(a2 - a1, b2 - a1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True

    def on_seg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))
    if d1 == 0 and on_seg(b1, b2, a1):
        return True
    if d2 == 0 and on_seg(b1, b2, a2):
        return True
    if d3 == 0 and on_seg(a1, a2, b1):
        return True
    if d4 == 0 and on_seg(a1, a2, b2):
        return True
    return False


def boundaries_cross(coords_a: np.ndarray, coords_b: np.ndarray) -> bool:
    """Any segment of polyline A intersects any segment of polyline B.
    O(n*m) — intended for post-cell-join small candidate sets only."""
    a = np.asarray(coords_a, dtype=np.float64)
    b = np.asarray(coords_b, dtype=np.float64)
    for i in range(len(a) - 1):
        for j in range(len(b) - 1):
            if _segments_intersect(a[i], a[i + 1], b[j], b[j + 1]):
                return True
    return False


def geom_intersects_polygon(geom_type: int, parts: list, poly_parts: list) -> bool:
    """Exact Intersects() predicate vs a (multi)polygon — used as the
    post-filter after the cell equi-join (reference exact test:
    src/shp_mem_tiles.cpp:21-55 geom::intersects)."""
    if geom_type == GEOM_POINT:
        for p in parts:
            p = np.asarray(p, dtype=np.float64)
            if points_in_polygon(p[:, 0], p[:, 1], poly_parts).any():
                return True
        return False
    # line/polygon: any vertex inside, polygon vertex inside us, or edges cross
    for part in parts:
        part = np.asarray(part, dtype=np.float64)
        if points_in_polygon(part[:, 0], part[:, 1], poly_parts).any():
            return True
        closed_a = np.vstack([part, part[:1]]) if geom_type == GEOM_POLYGON else part
        for ring in poly_parts:
            ring = np.asarray(ring, dtype=np.float64)
            closed_b = np.vstack([ring, ring[:1]])
            if boundaries_cross(closed_a, closed_b):
                return True
    if geom_type == GEOM_POLYGON:
        for ring in poly_parts:
            ring = np.asarray(ring, dtype=np.float64)
            if points_in_polygon(ring[:, 0], ring[:, 1], parts).any():
                return True
    return False


def geom_covered_by_polygon(geom_type: int, parts: list, poly_parts: list) -> bool:
    """CoveredBy() — all vertices inside and no boundary crossing
    (src/osm_lua_processing.cpp:393-407 geom::covered_by)."""
    for part in parts:
        part = np.asarray(part, dtype=np.float64)
        if not points_in_polygon(part[:, 0], part[:, 1], poly_parts).all():
            return False
    if geom_type != GEOM_POINT:
        for part in parts:
            part = np.asarray(part, dtype=np.float64)
            closed_a = np.vstack([part, part[:1]]) if geom_type == GEOM_POLYGON else part
            for ring in poly_parts:
                ring = np.asarray(ring, dtype=np.float64)
                closed_b = np.vstack([ring, ring[:1]])
                if boundaries_cross(closed_a, closed_b):
                    return False
    return True


def intersection_area_with_box(parts: list, box) -> float:
    """|geometry ∩ box| in coordinate units^2 — AreaIntersecting analog
    (src/osm_lua_processing.cpp:435-453) for axis-aligned query polygons."""
    total = 0.0
    for outer, inners in iter_polygons(parts):
        c = clip_ring_to_box(outer, box)
        total += abs(ring_area(c))
        for inner in inners:
            ci = clip_ring_to_box(inner, box)
            total -= abs(ring_area(ci))
    return total
