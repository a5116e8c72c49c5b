"""Property-based tests (hypothesis) for the numpy geometry kernels and
the MVT codec — pure-python, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.functions import mvt
from tilemaker_spark import sinks

coord = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False,
                  width=64).map(lambda v: round(v, 5))


@st.composite
def rings(draw, min_pts=3, max_pts=12):
    n = draw(st.integers(min_pts, max_pts))
    pts = [(draw(coord), draw(coord)) for _ in range(n)]
    return np.asarray(pts, dtype=np.float64)


@given(rings())
@settings(max_examples=60, deadline=None)
def test_clip_stays_in_box(ring):
    box = (-10.0, -10.0, 10.0, 10.0)
    out = G.clip_ring_to_box(ring, box)
    if len(out):
        assert out[:, 0].min() >= box[0] - 1e-9
        assert out[:, 0].max() <= box[2] + 1e-9
        assert out[:, 1].min() >= box[1] - 1e-9
        assert out[:, 1].max() <= box[3] + 1e-9


@given(rings())
@settings(max_examples=60, deadline=None)
def test_clip_identity_when_inside(ring):
    from hypothesis import assume
    # the kernel treats first==last as an explicit closing point and
    # drops it (open-ring convention) — exclude that representation
    assume(tuple(ring[0]) != tuple(ring[-1]))
    lo = float(min(ring[:, 0].min(), ring[:, 1].min())) - 1.0
    hi = float(max(ring[:, 0].max(), ring[:, 1].max())) + 1.0
    out = G.clip_ring_to_box(ring, (lo, lo, hi, hi))
    assert np.allclose(out, ring)


@given(rings(min_pts=2))
@settings(max_examples=60, deadline=None)
def test_simplify_dp_subset_and_endpoints(line):
    out = G.simplify_dp(line, 0.5)
    assert np.array_equal(out[0], line[0])
    assert np.array_equal(out[-1], line[-1])
    # every output vertex is one of the input vertices
    in_set = {tuple(p) for p in line}
    assert all(tuple(p) in in_set for p in out)
    assert len(out) <= len(line)


@given(rings(min_pts=2, max_pts=6), st.integers(3, 10))
@settings(max_examples=40, deadline=None)
def test_supercover_connected_and_covers_endpoints(line, z):
    tiles = G.supercover_tiles(line, z)
    from tilemaker_spark.functions.coords import lat2tiley_np, lon2tilex_np
    # endpoints' tiles are in the cover (latp-space y: the kernel works
    # in (lon, latp) — here we feed raw coords consistently as latp)
    for p in (line[0], line[-1]):
        tx = int(np.floor((p[0] + 180.0) / 360.0 * (1 << z)))
        ty = int(np.floor((180.0 - p[1]) / 360.0 * (1 << z)))
        assert (tx, ty) in tiles


@given(st.integers(0, 14), st.data())
@settings(max_examples=80, deadline=None)
def test_hilbert_tileid_roundtrip(z, data):
    x = data.draw(st.integers(0, (1 << z) - 1))
    y = data.draw(st.integers(0, (1 << z) - 1))
    tid = sinks.zxy_to_tileid(z, x, y)
    assert sinks.tileid_to_zxy(tid) == (z, x, y)


@given(st.lists(st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
                min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_mvt_point_roundtrip(pts):
    uniq = list(dict.fromkeys(pts))
    lb = mvt.LayerBuilder("t")
    lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry(uniq),
                   attrs=[("n", "v")])
    dec = mvt.decode_tile(mvt.encode_tile([lb]))
    got = [p[0] for p in dec["t"]["features"][0]["geom"]]
    assert got == uniq


@given(st.lists(st.tuples(st.integers(-100, 4200), st.integers(-100, 4200)),
                min_size=3, max_size=15, unique=True))
@settings(max_examples=60, deadline=None)
def test_mvt_polygon_roundtrip(ring):
    """Roundtrip up to MVT-spec winding normalization: a lone ring is an
    exterior, so it decodes as the input if already positive-area, else
    as its start-preserving reversal — never any other permutation."""
    lb = mvt.LayerBuilder("t")
    lb.add_feature(mvt.GEOM_POLYGON, mvt.encode_polygon_geometry([ring]))
    dec = mvt.decode_tile(mvt.encode_tile([lb]))
    got = [tuple(p) for p in dec["t"]["features"][0]["geom"][0]]
    fwd = [tuple(p) for p in ring]
    rev = [fwd[0]] + fwd[:0:-1]
    area = mvt._ring_shoelace(fwd)
    if area < 0:
        assert got == rev
    elif area > 0:
        assert got == fwd
    else:
        assert got == fwd  # degenerate rings pass through unchanged
    assert mvt._ring_shoelace(got) >= 0


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=5))
@settings(max_examples=40, deadline=None)
def test_gzip_deterministic(blobs):
    tile = b"".join(blobs)
    assert mvt.compress_tile(tile, "gzip") == mvt.compress_tile(tile, "gzip")


@given(st.lists(st.binary(min_size=0, max_size=500), min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_gzip_byte_identical(blobs):
    """The hand-assembled gzip stream must equal
    gzip.compress(level=6, mtime=0) byte-for-byte (the byte-stability
    invariant survives the fast path)."""
    import gzip as _gzip
    tile = b"".join(blobs)
    assert mvt.compress_tile(tile, "gzip") == _gzip.compress(
        tile, compresslevel=6, mtime=0)
