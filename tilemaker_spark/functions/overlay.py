"""General polygon overlay kernel: union / intersection / dissolve for
arbitrary (concave, multi-ring, even self-intersecting) polygons.

Replaces three documented round-1 partials with one shared kernel:
  * A5/G12 true geometric union (reference union_many,
    /root/reference/src/geom.cpp:150-169, used by the tile worker's
    polygon combine at src/tile_worker.cpp:350-361)
  * J5 AreaIntersecting with concave build polygons
    (src/osm_lua_processing.cpp:435-453 handles arbitrary polygons)
  * G11 make_valid self-intersection dissolve
    (src/geom.cpp:138-145, include/geometry/correct.hpp)

Algorithm (overlay by boundary classification — the classic planar
subdivision approach, cf. Martinez-Rueda 2009 "A new algorithm for
computing Boolean operations on polygons", recast without the sweep
because per-tile / per-pair inputs are small):

  1. fragment: split every input segment at every crossing, T-junction,
     and collinear-overlap endpoint against all other segments;
  2. classify: for each fragment, sample a point just left and just
     right of its midpoint and evaluate even-odd coverage per input
     group; a fragment lies on the result boundary iff the predicate
     (union: any group covers; intersection: all groups cover) differs
     across it. Orient so the result interior is on the LEFT.
     Coincident duplicate fragments (shared edges) collapse to one.
  3. stitch: walk directed fragments into closed rings, at multi-way
     vertices taking the sharpest-left continuation (planar-graph face
     traversal, interior kept on the left).

Ring conventions match geomnp: open rings (first point not repeated),
outers positive shoelace area in (lon, latp), holes negative, holes
emitted directly after their containing outer (iter_polygons order).

Numerics: tolerances scale with the input bbox diagonal; coverage
sampling offsets are proportional to fragment length. This trades
guaranteed exactness for simplicity — adequate for tile-local combines
and join predicates, and verified by closed-form oracles in tests.
"""

from __future__ import annotations

import math

import numpy as np

from tilemaker_spark.functions.geomnp import point_in_ring, ring_area

# -------------------------------------------------------------- fragment


def _collect_segments(groups: list) -> tuple:
    """Flatten groups of rings into parallel segment arrays.

    groups: list of ring-lists; each ring an (n,2) float array (open).
    Returns (P1, P2, group_ids) with one row per directed segment.
    """
    p1s, p2s, gids = [], [], []
    for gi, rings in enumerate(groups):
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
            if len(r) < 3:
                continue
            nxt = np.roll(r, -1, axis=0)
            keep = ~np.all(r == nxt, axis=1)
            p1s.append(r[keep])
            p2s.append(nxt[keep])
            gids.append(np.full(int(keep.sum()), gi, dtype=np.int64))
    if not p1s:
        return (np.empty((0, 2)), np.empty((0, 2)), np.empty(0, dtype=np.int64))
    return (np.concatenate(p1s), np.concatenate(p2s), np.concatenate(gids))


def _split_params(P1: np.ndarray, P2: np.ndarray, eps: float) -> list:
    """For each segment i, the sorted list of parameters t in (0,1) where
    any other segment crosses, touches, or collinearly overlaps it."""
    n = len(P1)
    D = P2 - P1
    ts: list = [[] for _ in range(n)]
    if n == 0:
        return ts
    # bbox prefilter, vectorized per segment
    lo = np.minimum(P1, P2) - eps
    hi = np.maximum(P1, P2) + eps
    for i in range(n):
        cand = np.nonzero(
            (lo[i, 0] <= hi[:, 0]) & (hi[i, 0] >= lo[:, 0])
            & (lo[i, 1] <= hi[:, 1]) & (hi[i, 1] >= lo[:, 1]))[0]
        cand = cand[cand != i]
        if len(cand) == 0:
            continue
        p = P1[i]
        d = D[i]
        len_d = math.hypot(d[0], d[1])
        if len_d < eps:
            continue
        q1 = P1[cand]
        q2 = P2[cand]
        e = q2 - q1
        w = q1 - p
        denom = d[0] * e[:, 1] - d[1] * e[:, 0]
        # proper / touching intersections
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
            u = (w[:, 0] * d[1] - w[:, 1] * d[0]) / denom
        nonpar = np.abs(denom) > eps * len_d
        ok = nonpar & (t > -1e-12) & (t < 1 + 1e-12) \
            & (u > -1e-12) & (u < 1 + 1e-12)
        for tv in t[ok]:
            if 1e-12 < tv < 1 - 1e-12:
                ts[i].append(float(tv))
        # (near-)collinear overlaps: project the other segment's
        # endpoints. The distance band is 4*eps — the SAME scale the
        # midpoint classification samples at — so parallel edges a few
        # nanounits apart (a sliver thinner than the classification
        # offset) are split at each other's endpoints instead of being
        # classified whole by an ambiguous midpoint; the canonical-
        # point matcher in _boundary_fragments then reconnects the
        # T-junctions across the sliver (hypothesis-found: a union of
        # two rects separated by a 3e-9 gap used to lose rings).
        par = ~nonpar
        if par.any():
            # distance of q1 from the line through p along d
            cross1 = w[par, 0] * d[1] - w[par, 1] * d[0]
            coll = np.abs(cross1) <= 4 * eps * len_d
            if coll.any():
                qa = q1[par][coll]
                qb = q2[par][coll]
                for q in (qa, qb):
                    tq = ((q[:, 0] - p[0]) * d[0] + (q[:, 1] - p[1]) * d[1]) \
                        / (len_d * len_d)
                    for tv in tq:
                        if 1e-12 < tv < 1 - 1e-12:
                            ts[i].append(float(tv))
    return ts


def _fragments(groups: list, eps: float):
    """All input segments split at mutual intersections.

    Returns (F1, F2, gids): fragment endpoints + source group id."""
    P1, P2, gids = _collect_segments(groups)
    ts = _split_params(P1, P2, eps)
    f1s, f2s, fg = [], [], []
    for i in range(len(P1)):
        tlist = sorted(set(ts[i]))
        pts = [P1[i]]
        for t in tlist:
            pts.append(P1[i] + t * (P2[i] - P1[i]))
        pts.append(P2[i])
        for a, b in zip(pts[:-1], pts[1:]):
            if math.hypot(b[0] - a[0], b[1] - a[1]) > eps:
                f1s.append(a)
                f2s.append(b)
                fg.append(gids[i])
    if not f1s:
        return (np.empty((0, 2)), np.empty((0, 2)), np.empty(0, dtype=np.int64))
    return (np.asarray(f1s), np.asarray(f2s), np.asarray(fg, dtype=np.int64))


# -------------------------------------------------------------- classify

def _covered(x: float, y: float, rings: list) -> bool:
    """Even-odd coverage of (x, y) by a group's ring set (XOR over
    rings — orientation-independent, hole-aware, robust to
    self-intersections)."""
    inside = False
    for r in rings:
        if point_in_ring(x, y, r):
            inside = not inside
    return inside


def _boundary_fragments(groups: list, predicate, eps: float):
    """Directed fragments of the result-region boundary, interior LEFT."""
    F1, F2, FG = _fragments(groups, eps)
    n = len(F1)
    out = {}
    rings_per_group = [
        [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in g
         if len(np.asarray(r).reshape(-1, 2)) >= 3]
        for g in groups]
    # Matching tolerance must cover the classification offset below
    # (delta <= 4*eps, since ln*1e-9 <= diag*1e-9 = eps): when a sliver
    # thinner than delta merges into the interior and its facing edges
    # are dropped, the surviving edges' endpoints — up to delta apart —
    # MUST canonicalize to one point or no closed ring can be stitched
    # (a union of two rects separated by a 3e-9 gap returned 0 rings
    # before this). Neighbor-cell lookup makes the match independent of
    # snap-cell boundaries.
    snap = max(4 * eps, 1e-12)
    canon: dict = {}

    def key(p):
        # snap only for MATCHING; the emitted coordinate is the first
        # exact float seen near the cell (input vertices / intersection
        # points pass through unquantized)
        kx, ky = round(p[0] / snap), round(p[1] / snap)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                got = canon.get((kx + dx, ky + dy))
                if got is not None and abs(got[0] - p[0]) <= snap \
                        and abs(got[1] - p[1]) <= snap:
                    return got
        got = (float(p[0]), float(p[1]))
        canon[(kx, ky)] = got
        return got

    for i in range(n):
        a, b = F1[i], F2[i]
        dx, dy = b[0] - a[0], b[1] - a[1]
        ln = math.hypot(dx, dy)
        if ln <= eps:
            continue
        mx, my = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
        # sample just left and just right of the midpoint. The offset
        # must undercut the thinnest feature of the arrangement (slivers
        # between nearly-coincident boundaries), so it scales with the
        # snap tolerance (~1e-9 of the bbox diagonal — still orders of
        # magnitude above double rounding error at these magnitudes),
        # NOT with the fragment length.
        delta = max(ln * 1e-9, eps * 4)
        nx, ny = -dy / ln * delta, dx / ln * delta
        cov_l = predicate([_covered(mx + nx, my + ny, rg)
                           for rg in rings_per_group])
        cov_r = predicate([_covered(mx - nx, my - ny, rg)
                           for rg in rings_per_group])
        if cov_l == cov_r:
            continue
        if cov_l:
            ka, kb = key(a), key(b)
        else:
            ka, kb = key(b), key(a)
        if ka != kb:
            out[(ka, kb)] = (ka, kb)  # dedupe coincident duplicates
    return list(out.values())


# ---------------------------------------------------------------- stitch

def _stitch_faces(edges: list) -> list:
    """Walk directed edges (interior-left) into closed rings.

    At a fork, take the sharpest-left turn relative to the incoming
    direction (planar-graph face traversal keeping the interior on the
    left). Returns rings as (n,2) arrays, open."""
    from collections import defaultdict
    by_start = defaultdict(list)
    for e in edges:
        by_start[e[0]].append(e)
    used = set()
    rings = []
    for e0 in edges:
        if e0 in used:
            continue
        ring = [e0[0]]
        cur = e0
        used.add(e0)
        guard = 0
        closed = False
        while guard < len(edges) + 1:
            guard += 1
            ring.append(cur[1])
            if cur[1] == e0[0]:
                closed = True
                break
            cands = [c for c in by_start.get(cur[1], ()) if c not in used]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                din = (cur[1][0] - cur[0][0], cur[1][1] - cur[0][1])
                ain = math.atan2(din[1], din[0])

                def turn(c):
                    dout = (c[1][0] - c[0][0], c[1][1] - c[0][1])
                    aout = math.atan2(dout[1], dout[0])
                    # CCW turn angle from the incoming direction, in
                    # (0, 2pi]. The SMALLEST turn keeps the same face on
                    # the left and splits pinch vertices (bowties,
                    # corner-touching rings) into separate simple rings
                    # instead of a figure-eight.
                    t = (aout - ain) % (2 * math.pi)
                    return t if t > 1e-12 else 2 * math.pi
                nxt = min(cands, key=turn)
            used.add(nxt)
            cur = nxt
        if closed and len(ring) >= 4:
            r = _drop_collinear(np.asarray(ring[:-1], dtype=np.float64))
            if len(r) >= 3:
                rings.append(r)
    return rings


def _drop_collinear(ring: np.ndarray) -> np.ndarray:
    """Remove straight-through vertices left by T-junction splits
    (collinear triples), keeping true corners."""
    n = len(ring)
    if n < 4:
        return ring
    prev = np.roll(ring, 1, axis=0)
    nxt = np.roll(ring, -1, axis=0)
    v1 = ring - prev
    v2 = nxt - ring
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    scale = np.maximum(
        np.hypot(v1[:, 0], v1[:, 1]) * np.hypot(v2[:, 0], v2[:, 1]), 1e-300)
    keep = np.abs(cross) / scale > 1e-12
    return ring[keep] if keep.sum() >= 3 else ring


def _order_rings(rings: list) -> list:
    """Emit outers (positive area) each followed by its holes (negative),
    innermost-containment assignment — iter_polygons grouping order."""
    outers = [(r, ring_area(r)) for r in rings if ring_area(r) > 0]
    holes = [r for r in rings if ring_area(r) <= 0]
    assigned: list = [[] for _ in outers]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best, best_area = None, None
        for i, (o, a) in enumerate(outers):
            if point_in_ring(px, py, o) and (best_area is None or a < best_area):
                best, best_area = i, a
        if best is not None:
            assigned[best].append(h)
    out = []
    for i, (o, _) in enumerate(outers):
        out.append(o)
        out.extend(assigned[i])
    return out


# ------------------------------------------------------------ public API

def _bbox_eps(groups: list) -> float:
    lo = np.array([np.inf, np.inf])
    hi = np.array([-np.inf, -np.inf])
    any_pts = False
    for rings in groups:
        for r in rings:
            a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            if len(a) == 0:
                continue
            any_pts = True
            lo = np.minimum(lo, a.min(axis=0))
            hi = np.maximum(hi, a.max(axis=0))
    if not any_pts:
        return 1e-12
    diag = math.hypot(*(hi - lo))
    return max(diag, 1e-9) * 1e-9


def polygon_overlay(groups: list, mode: str = "union") -> list:
    """Boolean overlay of polygon groups.

    groups: list of polygons, each a flattened ring list (geomnp
    convention — outer + holes, any winding; even-odd semantics within
    a group). mode: 'union' (region covered by ANY group) or
    'intersection' (region covered by ALL groups).
    Returns the flattened ring list of the result (outers positive,
    holes negative, holes after their outer)."""
    n_in = len(groups)
    groups = [[np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in g]
              for g in groups if g and any(len(r) for r in g)]
    if mode == "intersection" and len(groups) < n_in:
        return []  # ALL-of semantics: an empty operand empties the result
    if not groups:
        return []
    eps = _bbox_eps(groups)
    predicate = any if mode == "union" else all
    if mode == "intersection" and len(groups) < 2:
        return _order_rings(_stitch_faces(
            _boundary_fragments(groups, any, eps)))
    edges = _boundary_fragments(groups, predicate, eps)
    return _order_rings(_stitch_faces(edges))


def union_many(polys: list) -> list:
    """A5/G12 — true geometric union of N polygons (each a flattened
    ring list). Overlapping interiors dissolve; shared borders vanish.
    Matches reference union_many semantics (src/geom.cpp:150-169)."""
    return polygon_overlay([p for p in polys if p], "union")


def intersection_rings(parts_a: list, parts_b: list) -> list:
    """Ring list of A ∩ B for arbitrary simple polygons (concave OK)."""
    return polygon_overlay([parts_a, parts_b], "intersection")


def intersection_area(parts_a: list, parts_b: list) -> float:
    """|A ∩ B| for arbitrary polygons — the J5 concave-clip kernel.
    Sum of signed ring areas of the overlay result (holes negative)."""
    rings = intersection_rings(parts_a, parts_b)
    return float(sum(ring_area(r) for r in rings))


def needs_dissolve(parts: list) -> bool:
    """Cheap-ish G11 pre-test: does any segment of the ring set cross,
    T-touch, or collinearly overlap another mid-segment? (Shared
    endpoints — ordinary ring adjacency — do NOT trigger.)"""
    rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in parts]
    rings = [r for r in rings if len(r) >= 3]
    if not rings:
        return False
    P1, P2, _ = _collect_segments([rings])
    ts = _split_params(P1, P2, _bbox_eps([rings]))
    return any(len(t) > 0 for t in ts)


def make_valid(parts: list) -> list:
    """G11 — dissolve self-intersections and normalize winding.

    The even-odd-covered region of the input ring set is re-extracted
    with clean boundaries: bowties split into separate outers, winding
    corrected, degenerate slivers dropped (reference dissolve semantics,
    include/geometry/correct.hpp)."""
    return polygon_overlay([parts], "union")
