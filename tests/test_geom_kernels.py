"""Unit tests for pure-numpy geometry kernels (no Spark needed)."""

import math

import numpy as np
import pytest

from tilemaker_spark.functions import geomnp as G
from tilemaker_spark.functions import mvt
from tilemaker_spark.functions.coords import (
    TileBbox,
    lat2latp,
    lat2latp_np,
    latp2lat_np,
    lat2tiley_np,
    lon2tilex_np,
    tilex2lon,
    tiley2latp,
)


class TestCoords:
    def test_latp_roundtrip(self):
        lats = np.linspace(-85, 85, 101)
        back = latp2lat_np(lat2latp_np(lats))
        np.testing.assert_allclose(back, lats, atol=1e-9)

    def test_latp_clamp(self):
        # reference clamps at 85.06 (src/coordinates.cpp:23)
        assert lat2latp(89.9) == lat2latp(85.06)

    def test_known_tiles(self):
        # lon=0, lat=0 is tile (2^z/2, 2^z/2 - ...) center of the map
        assert lon2tilex_np([0.0], 14)[0] == 8192
        # lat=0 -> latp=0 -> tileyf exactly 8192; truncation matches the
        # reference's C++ cast (src/coordinates.cpp:31)
        assert lat2tiley_np([0.0], 14)[0] == 8192
        assert lon2tilex_np([-180.0], 5)[0] == 0

    def test_tile_bbox_margins(self):
        bb = TileBbox(14, 8192, 8191)
        assert bb.max_lon > bb.min_lon
        assert bb.max_latp > bb.min_latp
        w = bb.max_lon - bb.min_lon
        assert math.isclose(bb.xmargin, w / 200.0)
        assert math.isclose(bb.xscale, w / 4096.0)

    def test_scale_xy_quantization(self):
        bb = TileBbox(14, 8192, 8191)
        xs, ys = bb.scale_xy([bb.min_lon, bb.max_lon], [bb.max_latp, bb.min_latp])
        assert xs[0] == 0 and ys[0] == 0
        assert xs[1] == 4096 and ys[1] == 4096


class TestCover:
    def test_point_cover(self):
        tiles, bbox = G.cover_geometry(G.GEOM_POINT, [np.array([[0.5, 0.5]])], 14)
        assert bbox is None and len(tiles) == 1

    def test_horizontal_line_cover(self):
        z = 10
        # a line spanning exactly 4 tiles horizontally
        x0 = tilex2lon(100, z) + 1e-9
        x1 = tilex2lon(104, z) - 1e-9
        y = tiley2latp(300, z) - 1e-6
        line = np.array([[x0, y], [x1, y]])
        tiles = G.supercover_tiles(line, z)
        assert tiles == {(100, 300), (101, 300), (102, 300), (103, 300)}

    def test_diagonal_no_gaps(self):
        z = 12
        line = np.array([[0.01, 0.01], [0.4, 0.37]])
        tiles = sorted(G.supercover_tiles(line, z))
        # 4-connectivity: consecutive tiles in walk order differ by <= 1 in
        # each axis and the set must be "thick" enough to contain the line
        for t in np.linspace(0, 1, 500):
            p = line[0] + t * (line[1] - line[0])
            tx = int((p[0] + 180.0) / 360.0 * (1 << z))
            ty = int((180.0 - p[1]) / 360.0 * (1 << z))
            assert (tx, ty) in tiles

    def test_fill_covered(self):
        # a ring around a 3x3 block: fill should add the center
        tiles = {(0, 0), (1, 0), (2, 0), (0, 1), (2, 1), (0, 2), (1, 2), (2, 2)}
        filled = G.fill_covered_tiles(tiles)
        assert (1, 1) in filled

    def test_polygon_large_bbox(self):
        z = 10
        # big polygon covering >= 16 tiles -> bbox path
        ring = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]])
        tiles, bbox = G.cover_geometry(G.GEOM_POLYGON, [ring], z)
        assert tiles == set() and bbox is not None
        minx, miny, maxx, maxy = bbox
        assert maxx > minx and maxy > miny

    def test_polygon_small_filled(self):
        z = 10
        d = 360.0 / (1 << z)
        ring = np.array([[0.0, 0.0], [2.5 * d, 0.0], [2.5 * d, 2.5 * d], [0.0, 2.5 * d]])
        tiles, bbox = G.cover_geometry(G.GEOM_POLYGON, [ring], z)
        assert bbox is None
        assert len(tiles) >= 9  # 3x3 block fully covered


class TestRingMath:
    def test_ring_area_unit_square(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        assert math.isclose(abs(G.ring_area(sq)), 1.0)

    def test_point_in_polygon(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        hole = np.array([[0.4, 0.4], [0.4, 0.6], [0.6, 0.6], [0.6, 0.4]], dtype=float)
        px = np.array([0.5, 0.2, 1.5])
        py = np.array([0.5, 0.2, 0.5])
        res = G.points_in_polygon(px, py, [sq, hole])
        assert list(res) == [False, True, False]  # center is in the hole

    def test_iter_polygons_grouping(self):
        outer1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        inner1 = np.array([[0.2, 0.2], [0.2, 0.8], [0.8, 0.8], [0.8, 0.2]], dtype=float)
        outer2 = outer1 + 5.0
        polys = G.iter_polygons([outer1, inner1, outer2])
        assert len(polys) == 2
        assert len(polys[0][1]) == 1 and len(polys[1][1]) == 0


class TestClip:
    def test_clip_ring_fully_inside(self):
        sq = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]])
        out = G.clip_ring_to_box(sq, (0, 0, 1, 1))
        assert abs(abs(G.ring_area(out)) - 0.36) < 1e-12

    def test_clip_ring_partial(self):
        sq = np.array([[-0.5, 0.2], [0.5, 0.2], [0.5, 0.8], [-0.5, 0.8]])
        out = G.clip_ring_to_box(sq, (0, 0, 1, 1))
        assert abs(abs(G.ring_area(out)) - 0.3) < 1e-12  # half survives

    def test_clip_ring_outside(self):
        sq = np.array([[5, 5], [6, 5], [6, 6], [5, 6]], dtype=float)
        out = G.clip_ring_to_box(sq, (0, 0, 1, 1))
        assert len(out) == 0

    def test_clip_line_split(self):
        # line exits and re-enters the box -> two runs
        line = np.array([[-0.5, 0.5], [0.5, 0.5], [0.5, 1.5], [0.9, 1.5], [0.9, 0.5], [1.5, 0.5]])
        runs = G.clip_line_to_box(line, (0, 0, 1, 1))
        assert len(runs) == 2
        for run in runs:
            assert (run[:, 0] >= -1e-9).all() and (run[:, 0] <= 1 + 1e-9).all()

    def test_clip_line_inside(self):
        line = np.array([[0.1, 0.1], [0.9, 0.9]])
        runs = G.clip_line_to_box(line, (0, 0, 1, 1))
        assert len(runs) == 1 and len(runs[0]) == 2


class TestSimplify:
    def test_dp_collinear_removed(self):
        line = np.array([[0, 0], [0.5, 1e-6], [1, 0]], dtype=float)
        out = G.simplify_dp(line, 0.001)
        assert len(out) == 2

    def test_dp_keeps_corner(self):
        line = np.array([[0, 0], [0.5, 0.4], [1, 0]], dtype=float)
        out = G.simplify_dp(line, 0.001)
        assert len(out) == 3

    def test_visvalingam_ring_floor(self):
        ring = np.array([[0, 0], [1, 0], [1, 1], [0.5, 1.001], [0, 1], [0, 0]], dtype=float)
        out = G.simplify_visvalingam(ring, 0.5, is_ring=True)
        assert len(out) >= 4

    def test_visvalingam_removes_small(self):
        line = np.array([[0, 0], [0.5, 0.0001], [1, 0], [2, 0]], dtype=float)
        out = G.simplify_visvalingam(line, 0.1)
        assert len(out) < 4


class TestMeasures:
    def test_haversine_equator_degree(self):
        # 1 degree of longitude at the equator ~ 111.19 km with R=6371000
        line = np.array([[0, 0], [1, 0]], dtype=float)
        assert abs(G.haversine_length_m(line) - 111194.9) < 10

    def test_spherical_area_plausible(self):
        # 1x1 degree square at equator ~ 1.2363e10 m^2
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        a = G.spherical_ring_area_m2(ring)
        assert 1.2e10 < a < 1.25e10

    def test_centroid_square(self):
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
        cx, cy = G.centroid_xy([sq], G.GEOM_POLYGON)
        assert abs(cx - 1) < 1e-9 and abs(cy - 1) < 1e-9

    def test_polylabel_in_polygon(self):
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
        x, y = G.polylabel_xy([sq])
        assert 1.0 < x < 3.0 and 1.0 < y < 3.0


class TestMergeStitch:
    def test_merge_lines_chain(self):
        l1 = np.array([[0, 0], [1, 0]], dtype=float)
        l2 = np.array([[1, 0], [2, 0]], dtype=float)
        l3 = np.array([[5, 5], [6, 6]], dtype=float)
        out = G.merge_lines([l1, l2, l3])
        assert len(out) == 2
        assert len(out[0]) == 3

    def test_stitch_rings_reversed_fragments(self):
        # outer square split into 3 open ways, one reversed
        w1 = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
        w2 = np.array([[0, 1], [1, 1]], dtype=float)  # reversed orientation
        w3 = np.array([[0, 0], [0, 1]], dtype=float)
        rings = G.stitch_rings([w1, w2, w3])
        assert len(rings) == 1
        assert len(rings[0]) == 4

    def test_stitch_closed_way(self):
        w = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
        rings = G.stitch_rings([w])
        assert len(rings) == 1 and len(rings[0]) == 4


class TestPredicates:
    SQ = [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)]

    def test_point_intersects(self):
        assert G.geom_intersects_polygon(G.GEOM_POINT, [np.array([[5.0, 5.0]])], self.SQ)
        assert not G.geom_intersects_polygon(G.GEOM_POINT, [np.array([[15.0, 5.0]])], self.SQ)

    def test_line_crossing_intersects(self):
        line = [np.array([[-5, 5], [15, 5]], dtype=float)]
        assert G.geom_intersects_polygon(G.GEOM_LINE, line, self.SQ)

    def test_polygon_containing_query(self):
        big = [np.array([[-5, -5], [15, -5], [15, 15], [-5, 15]], dtype=float)]
        assert G.geom_intersects_polygon(G.GEOM_POLYGON, big, self.SQ)

    def test_covered_by(self):
        inner = [np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=float)]
        assert G.geom_covered_by_polygon(G.GEOM_POLYGON, inner, self.SQ)
        crossing = [np.array([[-1, 1], [2, 1], [2, 2], [-1, 2]], dtype=float)]
        assert not G.geom_covered_by_polygon(G.GEOM_POLYGON, crossing, self.SQ)

    def test_intersection_area_box(self):
        half = G.intersection_area_with_box(self.SQ, (5, 0, 15, 10))
        assert abs(half - 50.0) < 1e-9


class TestMVT:
    def test_point_roundtrip(self):
        lb = mvt.LayerBuilder("pages")
        lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry([(100, 200)]),
                       attrs=[("lang", "en"), ("n", 3)], feature_id=7)
        tile = mvt.encode_tile([lb])
        decoded = mvt.decode_tile(tile)
        f = decoded["pages"]["features"][0]
        assert f["id"] == 7
        assert f["geom"] == [[(100, 200)]]
        assert f["attrs"] == {"lang": "en", "n": 3}
        assert decoded["pages"]["extent"] == 4096

    def test_line_roundtrip(self):
        lb = mvt.LayerBuilder("roads", extent=8192)
        lb.add_feature(mvt.GEOM_LINESTRING,
                       mvt.encode_line_geometry([[(0, 0), (10, 5)], [(3, 3), (4, 4)]]))
        decoded = mvt.decode_tile(mvt.encode_tile([lb]))
        f = decoded["roads"]["features"][0]
        assert f["geom"] == [[(0, 0), (10, 5)], [(3, 3), (4, 4)]]

    def test_polygon_roundtrip(self):
        lb = mvt.LayerBuilder("water")
        ring = [(0, 0), (100, 0), (100, 100), (0, 100)]
        lb.add_feature(mvt.GEOM_POLYGON, mvt.encode_polygon_geometry([ring]))
        decoded = mvt.decode_tile(mvt.encode_tile([lb]))
        f = decoded["water"]["features"][0]
        assert f["geom"] == [ring]

    def test_value_types(self):
        assert mvt.decode_tile(mvt.encode_tile([_layer_with_value(True)]))["x"]["features"][0]["attrs"]["k"] is True
        assert mvt.decode_tile(mvt.encode_tile([_layer_with_value(-5)]))["x"]["features"][0]["attrs"]["k"] == -5
        v = mvt.decode_tile(mvt.encode_tile([_layer_with_value(1.5)]))["x"]["features"][0]["attrs"]["k"]
        assert abs(v - 1.5) < 1e-6

    def test_compress_stable(self):
        lb = mvt.LayerBuilder("a")
        lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry([(1, 1)]))
        t = mvt.encode_tile([lb])
        assert mvt.compress_tile(t) == mvt.compress_tile(t)
        import gzip
        assert gzip.decompress(mvt.compress_tile(t)) == t


def _layer_with_value(v):
    lb = mvt.LayerBuilder("x")
    lb.add_feature(mvt.GEOM_POINT, mvt.encode_point_geometry([(0, 0)]), attrs=[("k", v)])
    return lb
