"""G7 — topology-guarded polygon simplification (reference parity:
src/geom.cpp:15-136, invoked per tile at src/tile_worker.cpp:220-228).

The guard must prevent what naive per-ring DP allows: a simplified
outer crossing its hole (or a neighbor ring), producing invalid MVT
polygons at aggressive tolerances."""

import numpy as np
import pytest

from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.functions import overlay as OV

# outer bulges down to y=-40 at x=50 (interior above the chain); the
# deeper spike at (98,-50) owns the bbox envelope so the bulge vertex
# is eligible for removal; the hole straddles the y≈0 chord the naive
# simplification would snap the bulge to.
OUTER = np.array([[0, 0], [50, -40], [96, -1], [98, -50], [100, 0],
                  [100, 100], [0, 100]], dtype=np.float64)
HOLE = np.array([[10, -6], [10, 55], [90, 55], [90, -6]], dtype=np.float64)
TOL = 46.0


def _naive_dp(r, tol=TOL):
    closed = np.vstack([r, r[:1]])
    out = G.simplify_dp(closed, tol)
    return out[:-1]


def test_naive_dp_crosses_hole_guarded_does_not():
    """The golden case: per-ring DP produces an outer that cuts through
    the hole (ring crossing -> invalid polygon); the guarded kernel
    keeps the bulge vertex because its replacement chord would
    intersect the hole's segments."""
    naive = [_naive_dp(OUTER), _naive_dp(HOLE)]
    assert OV.needs_dissolve(naive), "fixture must break naive DP"
    guarded = G.simplify_polygon_parts_topo([OUTER, HOLE], TOL)
    assert not OV.needs_dissolve(guarded)
    assert any(tuple(p) == (50.0, -40.0) for p in np.asarray(guarded[0]))
    assert len(guarded) == 2 and G.ring_area(np.asarray(guarded[1])) < 0


def test_envelope_vertices_never_removed():
    """Vertices on the ring's own bbox envelope anchor the ring
    (reference src/geom.cpp:37-40)."""
    ring = np.array([[0, 0], [50, 0.5], [100, 0], [100, 100], [0, 100]],
                    dtype=np.float64)
    out = G.simplify_ring_topo(ring, 1000.0)
    pts = {tuple(p) for p in out}
    # the four envelope-touching corners survive any tolerance
    for corner in [(0, 0), (100, 0), (100, 100), (0, 100)]:
        assert corner in pts


def test_perimeter_keep_rule_drops_slivers():
    """Rings with perimeter <= 3*tol are dropped (holes) or kill the
    polygon (outer) — reference src/geom.cpp:92,110."""
    outer = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    tiny_hole = np.array([[50, 50], [50, 52], [52, 52], [52, 50]],
                         float)[::-1]
    out = G.simplify_polygon_parts_topo([outer, tiny_hole], 5.0)
    # hole perimeter 8 <= 15 -> dropped; outer perimeter 400 survives
    assert len(out) == 1 and G.ring_area(np.asarray(out[0])) > 0
    # an outer below the rule kills the polygon entirely
    small = np.array([[0, 0], [3, 0], [3, 3], [0, 3]], float)
    assert G.simplify_polygon_parts_topo([small], 5.0) == []


def test_simplify_combine_merges_expanded_polygons():
    """MultiPolygon-level simplify_combine: two disjoint polygons whose
    simplified outers overlap merge into ONE ring (include/geom.h:50-71,
    src/geom.cpp:124-136)."""
    p1 = np.array([[0, 0], [40, 0], [38, 20], [40, 40], [0, 40]], float)
    p2 = np.array([[39, 15], [60, 15], [60, 25], [39, 25]], float)
    assert not OV.needs_dissolve([p1])  # sanity: valid inputs
    out = G.simplify_polygon_parts_topo([p1, p2], 3.0)
    outers = [r for r in out if G.ring_area(np.asarray(r)) > 0]
    assert len(outers) == 1, f"expected merged single outer, got {len(outers)}"
    a = np.asarray(outers[0])
    # merged footprint spans both inputs
    assert a[:, 0].min() <= 0 and a[:, 0].max() >= 60


@pytest.mark.parametrize("seed", range(12))
def test_property_no_ring_crossings(seed):
    """Random star outers with grid holes, random tolerance: guarded
    output never contains ring crossings (the reference guard's
    invariant)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(24, 80))
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ang = ang + rng.uniform(-0.3, 0.3, n) * (2 * np.pi / n)
    r = rng.uniform(70, 100, n)
    outer = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
    if G.ring_area(outer) < 0:
        outer = outer[::-1]
    holes = []
    for gx in (-1, 1):
        for gy in (-1, 1):
            cx, cy = 28 * gx, 28 * gy
            w, h = rng.uniform(4, 16, 2)
            hole = np.array([[cx - w, cy - h], [cx - w, cy + h],
                             [cx + w, cy + h], [cx + w, cy - h]])
            holes.append(hole)  # negative area (CW) by construction
    parts = [outer] + [h if G.ring_area(h) < 0 else h[::-1] for h in holes]
    assert not OV.needs_dissolve(parts), "generator must produce valid input"
    for tol in rng.uniform(1, 40, 3):
        out = G.simplify_polygon_parts_topo(parts, float(tol))
        assert not OV.needs_dissolve(out), f"crossing at tol={tol}"
        for ring in out:
            assert len(ring) >= 3


@pytest.mark.parametrize("seed", range(8))
def test_property_area_drift_bounded(seed):
    """Simplification area drift is bounded: each removed vertex moves
    the boundary by < tol, so |Δarea| ≤ tol · perimeter(in) (generous
    2x slack for accumulated removals)."""
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(30, 90))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    keep = np.concatenate([[True], np.diff(ang) > 1e-3])
    ang = ang[keep]
    r = rng.uniform(60, 100, len(ang))
    outer = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
    if G.ring_area(outer) < 0:
        outer = outer[::-1]
    area_in = G.ring_area(outer)
    per_in = G.ring_perimeter(outer)
    for tol in (1.0, 5.0, 15.0):
        out = G.simplify_polygon_parts_topo([outer], tol)
        area_out = sum(G.ring_area(np.asarray(rg)) for rg in out)
        assert abs(area_out - area_in) <= 2 * tol * per_in + 1e-9, \
            (tol, area_in, area_out)
