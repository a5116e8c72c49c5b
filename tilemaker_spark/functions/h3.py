"""H3-style hexagonal cell encoding — vectorized (numpy kernel behind an
Arrow pandas UDF), from the published H3 algorithm description.

The north rule mandates spatial indexing "via vectorized H3/S2 cell
encoding in Arrow pandas UDFs"; `s2.py` implements the S2 half, this
module implements the H3 half from scratch against the public algorithm
(h3geo.org docs and the Uber engineering paper "H3: Uber's Hexagonal
Hierarchical Spatial Index" — no code copied): lat/lon -> unit-sphere
XYZ -> icosahedron face by max dot product with the 20 face centers ->
gnomonic projection onto the face plane -> fractional axial hex
coordinates at the requested resolution -> cube rounding -> packed
64-bit cell id.  Resolutions are aperture 7: each res-r hexagon has
exactly 7 res-(r+1) children, the child lattice is the parent lattice
scaled by 1/sqrt(7) and rotated by alpha = atan(sqrt(3)/5) ~ 19.107
degrees (the H3 Class II/III alternation), and parent lookup is the
integer lattice transform T^-1 = 1/7 * [[3, 1], [-1, 2]] followed by
the same cube rounding — pure JVM Column arithmetic, so rollups on
parent cells stay in whole-stage codegen.

Documented divergences from the canonical H3 library (same policy as
`s2.py`'s quantization note — the *algorithm* is reproduced, library
*data tables* are not):

* Icosahedron orientation: the canonical library uses a fixed
  Dymaxion-like orientation chosen so all 12 vertices fall in ocean;
  this module uses the standard (0, +-1, +-phi) icosahedron. Same grid
  geometry, different placement on the globe.
* Cell numbering: canonical ids route through a 122-entry base-cell
  assignment table (published *data*, not an algorithm). This module
  packs (res, face, i, j) directly:
  ``res(4 bits) | face(5 bits) | i+BIAS(27 bits) | j+BIAS(27 bits)``
  (63 bits, always positive). Same cells, same aperture-7 hierarchy,
  different numbering.
* Face seams: canonical H3 stitches the 12 icosahedron vertices into
  pentagons via base-cell ownership; per-face indexing instead clips
  the hex grid at the face's spherical Voronoi boundary. Every point
  still maps to exactly one cell (the argmax face is unique up to
  measure-zero ties), but cells straddling a face edge are split —
  `hex_kring` is therefore face-local, documented below.

Oracle story: the DuckDB twin (``__spark_entry__._h3_cells_sql``)
replays the same pipeline as SQL — identical float formulas, the same
20-row face relation (centers + tangent basis emitted by
``sql_h3_face_values`` from the module constants, round-tripped through
repr so the doubles are bit-identical), the same per-resolution inverse
basis literals (``sql_h3_inv``), cube rounding written as the same
comparison chain, and ``floor(x + 0.5)`` on both sides (no
round-half-to-even ambiguity). Two from-scratch encoders must agree
per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from tilemaker_spark.functions.s2 import xyz_from_latlon

MAX_RES = 15
_I_BITS = 27
BIAS = 1 << (_I_BITS - 1)  # axial coords stored biased-unsigned
_I_MASK = (1 << _I_BITS) - 1
# Aperture-7 rotation between consecutive resolutions: the parent
# lattice vector is (2, 1) in child axial units (2^2 + 2*1 + 1^2 = 7),
# whose angle against the child i-axis is atan2(sqrt(3)/2, 5/2).
ALPHA = float(np.arctan2(np.sqrt(3.0), 5.0))
# The 7 child digit offsets of an aperture-7 subdivision: the center
# plus the 6 axial unit neighbors (all round back to the parent under
# T^-1, so parent(child) == parent exactly — pinned by tests).
DIGITS = ((0, 0), (1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1))


def _build_icosahedron():
    """The 20 face centers and per-face tangent bases, derived (not
    transcribed): vertices are the normalized cyclic permutations of
    (0, +-1, +-phi), sorted lexicographically; faces are the vertex
    triples at edge distance, sorted — fully deterministic."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    pts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            pts += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    verts = np.array(sorted(pts), dtype=np.float64)
    verts /= np.sqrt((verts ** 2).sum(axis=1, keepdims=True))
    d2 = ((verts[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    edge2 = d2.min()
    is_edge = np.abs(d2 - edge2) < 1e-9
    faces = [(i, j, k)
             for i in range(12) for j in range(i + 1, 12)
             for k in range(j + 1, 12)
             if is_edge[i, j] and is_edge[i, k] and is_edge[j, k]]
    assert len(faces) == 20
    tri = verts[np.array(faces)]                      # (20, 3, 3)
    centers = tri.sum(axis=1)
    centers /= np.sqrt((centers ** 2).sum(axis=1, keepdims=True))
    # ex: first vertex projected off the normal, ey = n x ex
    ex = tri[:, 0, :] - (tri[:, 0, :] * centers).sum(1, keepdims=True) * centers
    ex /= np.sqrt((ex ** 2).sum(axis=1, keepdims=True))
    ey = np.cross(centers, ex)
    return centers, ex, ey


_FACE_C, _FACE_EX, _FACE_EY = _build_icosahedron()


def _basis(res: int):
    """Axial basis vectors (e1, e2) of the res-r hex lattice in
    face-plane coordinates: res 0 has pitch 1.0 along +x; each finer
    res scales by 7^-0.5 and rotates by -ALPHA so the coarse lattice
    is exactly T = [[2, -1], [1, 3]] (columns) in fine-lattice units."""
    s = 7.0 ** (-res / 2.0)
    th = -res * ALPHA
    e1 = (s * np.cos(th), s * np.sin(th))
    e2 = (s * np.cos(th + np.pi / 3.0), s * np.sin(th + np.pi / 3.0))
    return e1, e2


def _inv_entries(res: int):
    """Row-major inverse of [e1 e2] — the 4 doubles used verbatim by
    both the numpy kernel and the SQL twin (via `sql_h3_inv`)."""
    (e1x, e1y), (e2x, e2y) = _basis(res)
    det = e1x * e2y - e2x * e1y
    return (e2y / det, -e2x / det, -e1y / det, e1x / det)


_INV = [_inv_entries(r) for r in range(MAX_RES + 1)]


def hex_round(fi: np.ndarray, fj: np.ndarray):
    """Cube rounding of fractional axial coords (the standard published
    algorithm), with floor(x + 0.5) as the scalar rounding so the SQL
    twin can replay it without round-half-to-even ambiguity."""
    xf, zf = fi, fj
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    i = np.where(fix_x, -ry - rz, rx)
    j = np.where(fix_z, -rx - ry, rz)
    return i.astype(np.int64), j.astype(np.int64)


def hex_pack(res, face, i, j):
    res = np.asarray(res, dtype=np.int64)
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    return ((res << 59) | (face << 54)
            | ((i + BIAS) << _I_BITS) | (j + BIAS))


def hex_unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> 59) & 0xF
    face = (cell >> 54) & 0x1F
    i = ((cell >> _I_BITS) & _I_MASK) - BIAS
    j = (cell & _I_MASK) - BIAS
    return res, face, i, j


def hex_cell_id(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Cell ids at `res` for degree lat/lon arrays — one vectorized
    pass: face argmax (first max wins, matching the SQL twin's
    ``ORDER BY dot DESC, face``), gnomonic projection, axial inverse,
    cube round, pack."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res {res} out of [0, {MAX_RES}]")
    x, y, z = xyz_from_latlon(np.asarray(lat, dtype=np.float64),
                              np.asarray(lon, dtype=np.float64))
    dots = (x[:, None] * _FACE_C[:, 0] + y[:, None] * _FACE_C[:, 1]
            + z[:, None] * _FACE_C[:, 2])
    face = np.argmax(dots, axis=1)
    c = _FACE_C[face]
    ex = _FACE_EX[face]
    ey = _FACE_EY[face]
    dt = x * c[:, 0] + y * c[:, 1] + z * c[:, 2]
    qx, qy, qz = x / dt, y / dt, z / dt
    u = qx * ex[:, 0] + qy * ex[:, 1] + qz * ex[:, 2]
    v = qx * ey[:, 0] + qy * ey[:, 1] + qz * ey[:, 2]
    inv = _INV[res]
    fi = inv[0] * u + inv[1] * v
    fj = inv[2] * u + inv[3] * v
    i, j = hex_round(fi, fj)
    return hex_pack(res, face, i, j)


def hex_parent(cell: np.ndarray) -> np.ndarray:
    """Aperture-7 parent: T^-1 = 1/7 [[3, 1], [-1, 2]] + cube round
    (the same math `hex_parent_col` runs JVM-side)."""
    res, face, i, j = hex_unpack(cell)
    if np.any(res < 1):
        raise ValueError("res-0 cells have no parent")
    fi = (3 * i + j) / 7.0
    fj = (-i + 2 * j) / 7.0
    pi, pj = hex_round(fi, fj)
    return hex_pack(res - 1, face, pi, pj)


def hex_children(cell: int) -> np.ndarray:
    """The 7 res+1 children: T * (i, j) + digit, T = [[2, -1], [1, 3]]
    columns. Exact inverse of `hex_parent` (|T^-1 * digit| rounds to
    the origin for all 7 digits)."""
    res, face, i, j = (int(v) for v in hex_unpack(np.int64(cell)))
    if res >= MAX_RES:
        raise ValueError(f"res {res} cells have no children")
    ci, cj = 2 * i - j, i + 3 * j
    kids = np.array([(ci + di, cj + dj) for di, dj in DIGITS],
                    dtype=np.int64)
    return hex_pack(np.full(7, res + 1), np.full(7, face),
                    kids[:, 0], kids[:, 1])


def hex_kring(cell: int, k: int) -> np.ndarray:
    """All cells within hex distance k — FACE-LOCAL (see the module
    docstring's seam note): 1 + 3k(k+1) ids on the cell's own face."""
    res, face, i, j = (int(v) for v in hex_unpack(np.int64(cell)))
    arr = np.array([(i + di, j + dj) for di, dj in kring_offsets(k)],
                   dtype=np.int64)
    return hex_pack(np.full(len(arr), res), np.full(len(arr), face),
                    arr[:, 0], arr[:, 1])


def hex_cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees of the cell center — gnomonic inverse
    (tests-only; no SQL twin needed)."""
    res, face, i, j = hex_unpack(np.asarray(cell, dtype=np.int64))
    lat = np.empty(res.shape, dtype=np.float64)
    lon = np.empty(res.shape, dtype=np.float64)
    for r in np.unique(res):
        m = res == r
        (e1x, e1y), (e2x, e2y) = _basis(int(r))
        px = i[m] * e1x + j[m] * e2x
        py = i[m] * e1y + j[m] * e2y
        f = face[m]
        p = (_FACE_C[f] + px[:, None] * _FACE_EX[f]
             + py[:, None] * _FACE_EY[f])
        p /= np.sqrt((p ** 2).sum(axis=1, keepdims=True))
        lat[m] = np.degrees(np.arctan2(p[:, 2], np.hypot(p[:, 0], p[:, 1])))
        lon[m] = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    return lat, lon


# ------------------------------------------------------------- Spark

def hex_leaf_udf(res: int):
    """Arrow-batched cell id at `res` (the one Python touchpoint)."""
    @pandas_udf(LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(hex_cell_id(lat.to_numpy(), lon.to_numpy(), res))
    return _udf


def with_hex_cell(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                  res: int = 5, out: str = "hex_cell") -> DataFrame:
    """Attach an aperture-7 hex cell id at `res`. One vectorized UDF;
    downstream groupBy/join on `out` never re-enters Python."""
    udf = hex_leaf_udf(res)
    return df.withColumn(out, udf(F.col(lat_col).cast("double"),
                                  F.col(lon_col).cast("double")))


def hex_res_col(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, 59).bitwiseAND(F.lit(0xF)).cast("int")


def hex_face_col(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, 54).bitwiseAND(F.lit(0x1F)).cast("int")


def hex_i_col(cell: Column) -> Column:
    return (F.shiftrightunsigned(cell, _I_BITS)
            .bitwiseAND(F.lit(_I_MASK)) - F.lit(BIAS))


def hex_j_col(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit(_I_MASK)) - F.lit(BIAS)


def hex_parent_col(cell: Column) -> Column:
    """Aperture-7 parent as pure JVM Column arithmetic (codegen — no
    Python re-entry for rollups): the identical T^-1 + cube-round
    chain as `hex_parent` / the SQL twin, term for term. Column exprs
    cannot raise per-row — callers must not feed res-0 cells (the
    numpy `hex_parent` twin raises; res-0 would wrap to res 15)."""
    i = hex_i_col(cell)
    j = hex_j_col(cell)
    fi = (i * F.lit(3) + j).cast("double") / F.lit(7.0)
    fj = (i * F.lit(-1) + j * F.lit(2)).cast("double") / F.lit(7.0)
    yf = -fi - fj
    rx = F.floor(fi + F.lit(0.5))
    ry = F.floor(yf + F.lit(0.5))
    rz = F.floor(fj + F.lit(0.5))
    dx = F.abs(rx.cast("double") - fi)
    dy = F.abs(ry.cast("double") - yf)
    dz = F.abs(rz.cast("double") - fj)
    fix_x = (dx > dy) & (dx > dz)
    pi = F.when(fix_x, -ry - rz).otherwise(rx)
    pj = F.when(~fix_x & ~(dy > dz), -rx - ry).otherwise(rz)
    res1 = (hex_res_col(cell) - F.lit(1)).cast("long")
    packed = (F.shiftleft(res1, 59)
              .bitwiseOR(F.shiftleft(hex_face_col(cell).cast("long"), 54))
              .bitwiseOR(F.shiftleft(pi + F.lit(BIAS), _I_BITS))
              .bitwiseOR(pj + F.lit(BIAS)))
    # res-0 has no parent: null (the numpy twin raises; shiftleft(-1, 59)
    # would otherwise wrap into a garbage id whose res field reads 15)
    return F.when(hex_res_col(cell) > 0, packed)


def kring_offsets(k: int) -> list[tuple[int, int]]:
    """Axial (di, dj) offsets of the k-ring disc — 1 + 3k(k+1) of them,
    the same enumeration `hex_kring` uses."""
    return [(di, dj)
            for di in range(-k, k + 1)
            for dj in range(max(-k, -di - k), min(k, -di + k) + 1)]


def hex_kring_col(cell: Column, k: int) -> Column:
    """The k-ring disc as an array Column of cell ids — FACE-LOCAL
    (module-docstring seam note). Because i and j live in fixed bit
    fields, a neighbor id is literally ``cell + di*2^27 + dj``: one
    integer add per neighbor, whole-stage codegen, no Python. Valid
    while |i+di| and |j+dj| stay inside the 27-bit biased fields —
    real cells sit at |i|,|j| < ~2^23 even at res 15, so offsets of
    any practical k never carry across fields."""
    return F.array(*[cell + F.lit(int(di * (1 << _I_BITS) + dj))
                     for di, dj in kring_offsets(k)])


def hex_neighborhood_agg(per_cell: DataFrame, value_col: str,
                         cell_col: str = "cell", k: int = 1,
                         out: str = "nbhd_sum") -> DataFrame:
    """K-ring neighborhood aggregation (hex spatial smoothing): for
    every OCCUPIED cell, the sum of `value_col` over its k-ring disc.

    Scale shape: scatter-then-gather — each cell row explodes to its
    1+3k(k+1) neighbor ids (ring symmetry makes scatter == gather) and
    one partial-agg groupBy sums contributions; occupied cells are
    recovered with an inner join. Shuffle volume is a constant
    (1+3k(k+1))x the CELL table (already aggregated — tiny vs the
    corpus), never the row table; everything is codegen Column math.
    """
    per_cell = per_cell.persist()  # consumed by scatter AND the join-back
    nbr = (per_cell
           .select(F.explode(hex_kring_col(F.col(cell_col), k)).alias(cell_col),
                   F.col(value_col))
           .groupBy(cell_col)
           .agg(F.sum(value_col).alias(out)))
    res = per_cell.join(nbr, cell_col, "inner")
    res._internal_persists = [per_cell]  # release convention (CLAUDE.md)
    return res


# ---------------------------------------------------------- SQL twin

def sql_h3_face_values() -> str:
    """The 20-row face relation for the DuckDB twin: (face, cx, cy, cz,
    exx, exy, exz, eyx, eyy, eyz) — repr round-trip keeps every double
    bit-identical to the module constants the numpy kernel uses."""
    rows = []
    for f in range(20):
        vals = [repr(float(v)) for v in
                (*_FACE_C[f], *_FACE_EX[f], *_FACE_EY[f])]
        rows.append(f"({f}, {', '.join(vals)})")
    return ", ".join(rows)


def sql_h3_inv(res: int) -> tuple[str, str, str, str]:
    """repr literals of the res-r inverse basis for the SQL twin."""
    return tuple(repr(float(v)) for v in _INV[res])
