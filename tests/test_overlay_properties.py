"""Property-based hardening of the overlay kernel: random polygon
soups, unions and intersections cross-checked against an independent
grid-sampling oracle (even-odd point coverage)."""

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from tilemaker_spark.functions.geomnp import points_in_polygon, ring_area
from tilemaker_spark.functions.overlay import (
    intersection_area,
    make_valid,
    needs_dissolve,
    union_many,
)


def _perimeter(polys):
    total = 0.0
    for p in polys:
        for ring in p:
            r = np.asarray(ring)
            total += np.hypot(*(np.roll(r, -1, axis=0) - r).T).sum()
    return total


def _grid_tol(polys, a_grid, lo=-1.0, hi=11.0, n=160):
    """Error model for the grid-sampling oracle: every boundary cell can
    be misclassified, so the oracle itself is only accurate to
    O(perimeter * spacing). The kernel side is exact arithmetic."""
    spacing = (hi - lo) / (n - 1)
    return max(0.25, 0.08 * a_grid, 0.75 * _perimeter(polys) * spacing)


def _grid_area(polys, lo=-1.0, hi=11.0, n=160, mode="union"):
    xs = np.linspace(lo, hi, n)
    ys = np.linspace(lo, hi, n)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.ravel(), gy.ravel()
    if mode == "union":
        acc = np.zeros(px.size, dtype=bool)
        for p in polys:
            acc |= points_in_polygon(px, py, p)
    else:
        acc = np.ones(px.size, dtype=bool)
        for p in polys:
            acc &= points_in_polygon(px, py, p)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return acc.sum() * cell


def _rand_rect(draw):
    x0 = draw(st.floats(0, 8))
    y0 = draw(st.floats(0, 8))
    w = draw(st.floats(0.5, 3))
    h = draw(st.floats(0.5, 3))
    return np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])


def _rand_poly(draw):
    """Star-shaped SIMPLE polygon around a random center: distinct
    angles with a minimum separation (duplicate angles with different
    radii would create a self-crossing spike, whose shoelace area
    legitimately underestimates its even-odd region — the union/
    intersection invariants below only hold for simple inputs; the
    self-intersecting case is make_valid's job and covered there)."""
    cx = draw(st.floats(1, 9))
    cy = draw(st.floats(1, 9))
    k = draw(st.integers(4, 9))
    raw = sorted(draw(st.floats(0, 2 * np.pi)) for _ in range(k))
    angs = []
    for a in raw:
        if not angs or (a - angs[-1]) > 0.05:
            angs.append(a)
    if len(angs) < 3 or (2 * np.pi - angs[-1] + angs[0]) <= 0.05:
        angs = np.linspace(0, 2 * np.pi, max(k, 3), endpoint=False)
    angs = np.asarray(angs)
    rads = np.array([draw(st.floats(0.4, 2.0)) for _ in range(len(angs))])
    return np.column_stack([cx + rads * np.cos(angs),
                            cy + rads * np.sin(angs)])


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_union_matches_grid(data):
    n = data.draw(st.integers(2, 5))
    polys = [[_rand_rect(data.draw) if data.draw(st.booleans())
              else _rand_poly(data.draw)] for _ in range(n)]
    # the shoelace-based invariants below require SIMPLE inputs
    # (angular-sorted vertices with varying radii can still
    # self-intersect when the angular gap exceeds pi)
    assume(all(not needs_dissolve(p) for p in polys))
    out = union_many(polys)
    a_union = sum(ring_area(r) for r in out)
    a_grid = _grid_area(polys, mode="union")
    tol = _grid_tol(polys, a_grid)
    assert abs(a_union - a_grid) < tol
    # union never below the largest input, never above the sum
    areas = [abs(ring_area(p[0])) for p in polys]
    assert a_union >= max(areas) - 1e-6
    assert a_union <= sum(areas) + 1e-6


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_intersection_matches_grid(data):
    a = [_rand_rect(data.draw) if data.draw(st.booleans())
         else _rand_poly(data.draw)]
    b = [_rand_rect(data.draw) if data.draw(st.booleans())
         else _rand_poly(data.draw)]
    assume(not needs_dissolve(a) and not needs_dissolve(b))
    got = intersection_area(a, b)
    grid = _grid_area([a, b], mode="intersection")
    tol = _grid_tol([a, b], max(grid, 1e-9))
    assert abs(got - grid) < tol
    assert got <= min(abs(ring_area(a[0])), abs(ring_area(b[0]))) + 1e-6
    assert got >= -1e-12


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_make_valid_idempotent(data):
    poly = [_rand_poly(data.draw)]
    assume(not needs_dissolve(poly))
    once = make_valid(poly)
    twice = make_valid(once)
    a1 = sum(ring_area(r) for r in once)
    a2 = sum(ring_area(r) for r in twice)
    assert a1 == pytest.approx(a2, rel=1e-6, abs=1e-9)
    # area preserved for an already-simple polygon
    assert a1 == pytest.approx(abs(ring_area(poly[0])), rel=1e-6)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_make_valid_dissolves_to_even_odd_region(data):
    """SELF-INTERSECTING inputs (the case the two kernel 'failures'
    above actually exercised correctly): make_valid's output area must
    match the even-odd covered region measured by grid sampling."""
    base = _rand_poly(data.draw)
    # force a crossing: swap two (usually non-adjacent) vertices
    i = data.draw(st.integers(0, len(base) - 1))
    j = (i + 2) % len(base)
    base[[i, j]] = base[[j, i]]
    poly = [base]
    assume(needs_dissolve(poly))
    out = make_valid(poly)
    a = sum(ring_area(r) for r in out)
    grid = _grid_area([poly], lo=-2.0, hi=12.0, n=220, mode="union")
    tol = max(0.2, 0.1 * max(grid, 1e-9))
    assert abs(a - grid) < tol
    # idempotent: a second pass changes nothing
    a2 = sum(ring_area(r) for r in make_valid(out))
    assert a2 == pytest.approx(a, rel=1e-6, abs=1e-9)
