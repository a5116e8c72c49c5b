"""High-volume randomized soak of the overlay kernel.

Replays the invariants of tests/test_overlay_properties.py (union /
intersection vs the independent grid-sampling oracle, make_valid
idempotence and even-odd dissolve) with a seeded numpy RNG at 100x the
per-commit volume. Pure numpy — no Spark — so it can run for thousands
of cases in minutes. Every case derives its own RNG from (seed, index);
a failure prints that pair for exact reproduction.

Usage: python scripts/overlay_soak.py [n_cases] [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from test_overlay_properties import _grid_area, _grid_tol  # noqa: E402

from tilemaker_spark.functions.geomnp import ring_area  # noqa: E402
from tilemaker_spark.functions.overlay import (  # noqa: E402
    intersection_area,
    make_valid,
    needs_dissolve,
    union_many,
)


def rand_rect(rng: np.random.Generator) -> np.ndarray:
    x0, y0 = rng.uniform(0, 8, 2)
    w, h = rng.uniform(0.5, 3, 2)
    return np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])


def rand_poly(rng: np.random.Generator) -> np.ndarray:
    """Star-shaped simple polygon (same construction as the property
    tests: angularly sorted vertices with a minimum separation)."""
    cx, cy = rng.uniform(1, 9, 2)
    k = int(rng.integers(4, 10))
    raw = np.sort(rng.uniform(0, 2 * np.pi, k))
    angs = []
    for a in raw:
        if not angs or (a - angs[-1]) > 0.05:
            angs.append(a)
    if len(angs) < 3 or (2 * np.pi - angs[-1] + angs[0]) <= 0.05:
        angs = np.linspace(0, 2 * np.pi, max(k, 3), endpoint=False)
    angs = np.asarray(angs)
    rads = rng.uniform(0.4, 2.0, len(angs))
    return np.column_stack([cx + rads * np.cos(angs),
                            cy + rads * np.sin(angs)])


def one_shape(rng: np.random.Generator) -> np.ndarray:
    return rand_rect(rng) if rng.random() < 0.5 else rand_poly(rng)


def case_union(rng: np.random.Generator) -> None:
    n = int(rng.integers(2, 6))
    polys = [[one_shape(rng)] for _ in range(n)]
    if any(needs_dissolve(p) for p in polys):
        return
    out = union_many(polys)
    a_union = sum(ring_area(r) for r in out)
    a_grid = _grid_area(polys, mode="union")
    tol = _grid_tol(polys, a_grid)
    assert abs(a_union - a_grid) < tol, (a_union, a_grid, tol)
    areas = [abs(ring_area(p[0])) for p in polys]
    assert a_union >= max(areas) - 1e-6
    assert a_union <= sum(areas) + 1e-6


def case_intersection(rng: np.random.Generator) -> None:
    a, b = [one_shape(rng)], [one_shape(rng)]
    if needs_dissolve(a) or needs_dissolve(b):
        return
    got = intersection_area(a, b)
    grid = _grid_area([a, b], mode="intersection")
    tol = _grid_tol([a, b], max(grid, 1e-9))
    assert abs(got - grid) < tol, (got, grid, tol)
    assert got <= min(abs(ring_area(a[0])), abs(ring_area(b[0]))) + 1e-6
    assert got >= -1e-12


def case_make_valid(rng: np.random.Generator) -> None:
    base = rand_poly(rng)
    if rng.random() < 0.5:
        # force a crossing by swapping two vertices
        i = int(rng.integers(0, len(base)))
        j = (i + 2) % len(base)
        base[[i, j]] = base[[j, i]]
    poly = [base]
    out = make_valid(poly)
    a1 = sum(ring_area(r) for r in out)
    a2 = sum(ring_area(r) for r in make_valid(out))
    assert abs(a1 - a2) <= max(1e-9, 1e-6 * abs(a1)), (a1, a2)
    if needs_dissolve(poly):
        grid = _grid_area([poly], lo=-2.0, hi=12.0, n=220, mode="union")
        tol = max(0.2, 0.1 * max(grid, 1e-9))
        assert abs(a1 - grid) < tol, (a1, grid, tol)
    else:
        want = abs(ring_area(poly[0]))
        assert abs(a1 - want) <= max(1e-9, 1e-6 * want), (a1, want)


def _rand_ring(rng: np.random.Generator, min_pts=3, max_pts=12):
    n = int(rng.integers(min_pts, max_pts + 1))
    return np.round(rng.uniform(-170, 170, (n, 2)), 5)


def case_clip(rng: np.random.Generator) -> None:
    from tilemaker_spark.functions import geomnp as G
    ring = _rand_ring(rng)
    box = (-10.0, -10.0, 10.0, 10.0)
    out = G.clip_ring_to_box(ring, box)
    if len(out):
        assert out[:, 0].min() >= box[0] - 1e-9
        assert out[:, 0].max() <= box[2] + 1e-9
        assert out[:, 1].min() >= box[1] - 1e-9
        assert out[:, 1].max() <= box[3] + 1e-9
    # identity when the box contains the (open) ring
    if tuple(ring[0]) != tuple(ring[-1]):
        lo = float(min(ring[:, 0].min(), ring[:, 1].min())) - 1.0
        hi = float(max(ring[:, 0].max(), ring[:, 1].max())) + 1.0
        out2 = G.clip_ring_to_box(ring, (lo, lo, hi, hi))
        assert np.allclose(out2, ring)


def case_simplify(rng: np.random.Generator) -> None:
    from tilemaker_spark.functions import geomnp as G
    line = _rand_ring(rng, min_pts=2)
    out = G.simplify_dp(line, float(rng.uniform(0.01, 5.0)))
    assert np.array_equal(out[0], line[0])
    assert np.array_equal(out[-1], line[-1])
    in_set = {tuple(p) for p in line}
    assert all(tuple(p) in in_set for p in out)
    assert len(out) <= len(line)


def case_supercover(rng: np.random.Generator) -> None:
    from tilemaker_spark.functions import geomnp as G
    line = _rand_ring(rng, min_pts=2, max_pts=6)
    z = int(rng.integers(3, 11))
    tiles = G.supercover_tiles(line, z)
    for p in (line[0], line[-1]):
        tx = int(np.floor((p[0] + 180.0) / 360.0 * (1 << z)))
        ty = int(np.floor((180.0 - p[1]) / 360.0 * (1 << z)))
        assert (tx, ty) in tiles, (p, z)


def case_mvt_roundtrip(rng: np.random.Generator) -> None:
    from tilemaker_spark.functions import mvt
    n = int(rng.integers(1, 30))
    pts = [tuple(p) for p in
           np.unique(rng.integers(-100, 4200, (n, 2)), axis=0).tolist()]
    lb = mvt.LayerBuilder("t")
    lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry(pts),
                   attrs=[("n", "v")])
    dec = mvt.decode_tile(mvt.encode_tile([lb]))
    got = [p[0] for p in dec["t"]["features"][0]["geom"]]
    assert got == pts, (got, pts)


CASES = [case_union, case_intersection, case_make_valid,
         case_clip, case_simplify, case_supercover, case_mvt_roundtrip]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260818
    fails = 0
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        fn = CASES[i % len(CASES)]
        try:
            fn(rng)
        except AssertionError as e:
            fails += 1
            print(f"FAIL case={i} fn={fn.__name__} seed=({seed},{i}): {e}")
        if i % 500 == 499:
            print(f"{i + 1}/{n} cases, {fails} failures", flush=True)
    print(f"done: {n} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
