"""H3-style aperture-7 hex index: icosahedron/basis structure, pack
algebra, lattice parent/child/k-ring invariants, center roundtrip,
Spark wrapper + JVM parent parity, and the DuckDB twin replay (the
same two-encoders-must-agree check the contract gate runs)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.functions.h3 import (
    ALPHA, MAX_RES, _FACE_C, _FACE_EX, _FACE_EY, _INV,
    hex_cell_center, hex_cell_id, hex_children, hex_kring, hex_kring_col,
    hex_neighborhood_agg, hex_pack, hex_parent, hex_parent_col, hex_round,
    hex_unpack, with_hex_cell,
)


def _rand_latlon(n, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85.0, 85.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


# ------------------------------------------------------------ structure

def test_icosahedron_derivation():
    # 20 unit-normal faces, orthonormal tangent bases, ey = n x ex
    assert _FACE_C.shape == (20, 3)
    np.testing.assert_allclose((_FACE_C ** 2).sum(1), 1.0, atol=1e-12)
    np.testing.assert_allclose((_FACE_EX ** 2).sum(1), 1.0, atol=1e-12)
    np.testing.assert_allclose((_FACE_C * _FACE_EX).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose(_FACE_EY, np.cross(_FACE_C, _FACE_EX),
                               atol=1e-15)
    # face centers are distinct and cover both hemispheres
    assert len({tuple(np.round(c, 9)) for c in _FACE_C}) == 20
    assert (_FACE_C[:, 2] > 0).any() and (_FACE_C[:, 2] < 0).any()


def test_aperture_is_seven():
    # consecutive-res bases differ by scale sqrt(7) and rotation ALPHA
    for r in range(MAX_RES):
        a, b, c, d = _INV[r]
        a2, b2, c2, d2 = _INV[r + 1]
        det = a * d - b * c
        det2 = a2 * d2 - b2 * c2
        assert det2 / det == pytest.approx(7.0, rel=1e-12)
    assert np.tan(ALPHA) == pytest.approx(np.sqrt(3.0) / 5.0, rel=1e-15)


def test_pack_unpack_roundtrip():
    res = np.array([0, 5, 15, 9], dtype=np.int64)
    face = np.array([0, 7, 19, 3], dtype=np.int64)
    i = np.array([0, -123456, 2 ** 25, -1], dtype=np.int64)
    j = np.array([0, 654321, -(2 ** 25), 1], dtype=np.int64)
    cell = hex_pack(res, face, i, j)
    assert (cell > 0).all()
    r2, f2, i2, j2 = hex_unpack(cell)
    np.testing.assert_array_equal(r2, res)
    np.testing.assert_array_equal(f2, face)
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(j2, j)


def test_hex_round_identities():
    # exact lattice points round to themselves
    g = np.arange(-5, 6, dtype=np.float64)
    fi, fj = np.meshgrid(g, g)
    i, j = hex_round(fi.ravel(), fj.ravel())
    np.testing.assert_array_equal(i, fi.ravel().astype(np.int64))
    np.testing.assert_array_equal(j, fj.ravel().astype(np.int64))
    # rounded output always satisfies the cube constraint implicitly:
    # nearest-cell property vs brute force over the 3x3 neighborhood
    rng = np.random.default_rng(3)
    fi = rng.uniform(-4, 4, 2000)
    fj = rng.uniform(-4, 4, 2000)
    i, j = hex_round(fi, fj)
    # axial -> plane with the canonical 60-degree basis
    def plane(a, b):
        return a + 0.5 * b, (np.sqrt(3) / 2) * b
    px, py = plane(fi, fj)
    cx, cy = plane(i.astype(float), j.astype(float))
    d_best = np.hypot(px - cx, py - cy)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ox, oy = plane((i + di).astype(float), (j + dj).astype(float))
            d = np.hypot(px - ox, py - oy)
            assert (d_best <= d + 1e-9).all()


# ------------------------------------------------------------ hierarchy

def test_children_parent_exact_inverse():
    rng = np.random.default_rng(11)
    for _ in range(50):
        res = int(rng.integers(0, MAX_RES))
        cell = int(hex_pack(res, int(rng.integers(0, 20)),
                            int(rng.integers(-1000, 1000)),
                            int(rng.integers(-1000, 1000))))
        kids = hex_children(cell)
        assert len(set(kids.tolist())) == 7
        np.testing.assert_array_equal(hex_parent(kids),
                                      np.full(7, cell, dtype=np.int64))


def test_children_tile_without_overlap():
    # two adjacent parents' child sets are disjoint and each child maps
    # back to exactly its own parent (partition property of aperture 7)
    a = int(hex_pack(4, 2, 10, -3))
    b = int(hex_pack(4, 2, 11, -3))
    ka, kb = set(hex_children(a).tolist()), set(hex_children(b).tolist())
    assert not ka & kb


def test_parent_vs_direct_encoding():
    # hex hierarchies are not perfectly nested (H3 documents the same);
    # the lattice parent must agree with direct coarse encoding for the
    # bulk of points and never be further than one ring off
    lat, lon = _rand_latlon(4000)
    res = 7
    fine = hex_cell_id(lat, lon, res)
    coarse = hex_cell_id(lat, lon, res - 1)
    par = hex_parent(fine)
    same = par == coarse
    assert same.mean() > 0.75
    _, pf, pi, pj = hex_unpack(par)
    _, cf, ci, cj = hex_unpack(coarse)
    onface = pf == cf
    di, dj = pi - ci, pj - cj
    hexd = (np.abs(di) + np.abs(dj) + np.abs(di + dj)) // 2
    assert (hexd[onface] <= 1).all()


def test_kring_counts_and_distance():
    cell = int(hex_pack(6, 9, 40, -17))
    for k in (1, 2, 3):
        ring = hex_kring(cell, k)
        assert len(ring) == 1 + 3 * k * (k + 1)
        assert len(set(ring.tolist())) == len(ring)
        _, _, i0, j0 = hex_unpack(np.int64(cell))
        _, _, ii, jj = hex_unpack(ring)
        d = (np.abs(ii - i0) + np.abs(jj - j0)
             + np.abs((ii - i0) + (jj - j0))) // 2
        assert d.max() == k


def test_center_roundtrip():
    # a cell's center re-encodes to the same cell whenever the center
    # projects to the cell's own face (face-interior cells)
    lat, lon = _rand_latlon(2000, seed=23)
    res = 6
    cells = hex_cell_id(lat, lon, res)
    clat, clon = hex_cell_center(cells)
    again = hex_cell_id(clat, clon, res)
    _, f0, _, _ = hex_unpack(cells)
    _, f1, _, _ = hex_unpack(again)
    onface = f0 == f1
    assert onface.mean() > 0.9
    np.testing.assert_array_equal(cells[onface], again[onface])


def test_kring_col_matches_numpy(spark):
    cells = [int(hex_pack(6, f, i, j))
             for f, i, j in [(0, 0, 0), (9, 40, -17), (19, -300, 512)]]
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    for k in (1, 2):
        rows = df.select("cell",
                         hex_kring_col(F.col("cell"), k).alias("nb")).collect()
        for r in rows:
            assert sorted(r["nb"]) == sorted(hex_kring(r["cell"], k).tolist())


def test_neighborhood_agg_brute_force(spark):
    # a 5x5 axial block with value = 1 + (i + 2) * 5 + (j + 2)
    cells = {int(hex_pack(7, 3, i, j)): 1 + (i + 2) * 5 + (j + 2)
             for i in range(-2, 3) for j in range(-2, 3)}
    df = spark.createDataFrame(list(cells.items()), "cell long, v long")
    got = {r["cell"]: r["nbhd_sum"] for r in
           hex_neighborhood_agg(df, "v", k=1).collect()}
    assert set(got) == set(cells)
    for c, v in cells.items():
        want = sum(cells.get(int(n), 0) for n in hex_kring(c, 1))
        assert got[c] == want, hex_unpack(np.int64(c))


def test_res_validation():
    with pytest.raises(ValueError):
        hex_cell_id(np.zeros(1), np.zeros(1), MAX_RES + 1)
    with pytest.raises(ValueError):
        hex_parent(hex_pack(np.zeros(1, np.int64), np.zeros(1, np.int64),
                            np.zeros(1, np.int64), np.zeros(1, np.int64)))
    with pytest.raises(ValueError):
        hex_children(int(hex_pack(MAX_RES, 0, 0, 0)))


# ------------------------------------------------------------ Spark

def test_with_hex_cell_matches_numpy(spark):
    lat, lon = _rand_latlon(500, seed=5)
    df = spark.createDataFrame(
        [(int(k), float(a), float(o)) for k, (a, o) in
         enumerate(zip(lat, lon))], "id long, lat double, lon double")
    got = {r["id"]: r["c"] for r in
           with_hex_cell(df, res=6, out="c").select("id", "c").collect()}
    want = hex_cell_id(lat, lon, 6)
    assert [got[k] for k in range(500)] == want.tolist()


def test_hex_parent_col_matches_numpy(spark):
    lat, lon = _rand_latlon(500, seed=9)
    cells = hex_cell_id(lat, lon, 7)
    df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
    got = [r["p"] for r in
           df.select(hex_parent_col(F.col("cell")).alias("p")).collect()]
    assert got == hex_parent(cells).tolist()


def test_hex_parent_col_res0_is_null(spark):
    # the numpy twin raises; the Column version must yield null, never
    # a wrapped garbage id
    df = spark.createDataFrame([(int(hex_pack(0, 3, 1, 2)),),
                                (int(hex_pack(1, 3, 1, 2)),)], "cell long")
    rows = df.select("cell",
                     hex_parent_col(F.col("cell")).alias("p")).collect()
    by_res = {(r["cell"] >> 59) & 0xF: r["p"] for r in rows}
    assert by_res[0] is None
    assert by_res[1] is not None


def test_duckdb_twin_replay(spark):
    """The contract-gate check in miniature, against the gate's OWN
    SQL: numpy/Spark encoder vs `__spark_entry__._h3_encode_ctes` (the
    exact CTE chain h3_cells/hex_smooth oracles run) must agree per
    row — no hand-copied formulas that could drift."""
    from __spark_entry__ import _h3_encode_ctes
    lat, lon = _rand_latlon(400, seed=13)
    res = 5
    cells = hex_cell_id(lat, lon, res)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, {float(a)!r}, {float(o)!r})"
                            for k, (a, o) in enumerate(zip(lat, lon)))
                + ") t(id, lat, lon)")
    geo = "geo AS (SELECT id AS doc_id, lat, lon FROM pts)"
    sql = (f"WITH {_h3_encode_ctes(res, geo_cte=geo)} "
           f"SELECT doc_id, cell FROM cells ORDER BY doc_id")
    got = con.execute(sql).fetchall()
    assert [c for _, c in got] == cells.tolist()
