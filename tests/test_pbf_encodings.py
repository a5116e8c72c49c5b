"""PBF completeness (verdict item 5): plain (non-dense) Node groups and
LocationsOnWays inline way coordinates — encodings produced by e.g.
`osmium cat --output-format=pbf,dense=false` and
`osmium add-locations-to-ways`.

A tiny hand-rolled PBF writer builds the same entity set in each
encoding and asserts parse equality (the reference handles both at
src/pbf_processor.cpp:41 and :115-118,524)."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from tilemaker_spark import sources_pbf


# ---------------------------------------------------------- wire writers

def _vi(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zzv(n: int) -> bytes:
    return _vi((n << 1) ^ (n >> 63)) if n < 0 else _vi(n << 1)


def _len_field(field: int, payload: bytes) -> bytes:
    return _vi((field << 3) | 2) + _vi(len(payload)) + payload


def _vi_field(field: int, v: int) -> bytes:
    return _vi(field << 3) + _vi(v)


def _packed_zz_delta(field: int, values) -> bytes:
    out = bytearray()
    prev = 0
    for v in values:
        out += _zzv(v - prev)
        prev = v
    return _len_field(field, bytes(out))


def _packed_vi(field: int, values) -> bytes:
    out = bytearray()
    for v in values:
        out += _vi(v)
    return _len_field(field, bytes(out))


def _stringtable(strings) -> bytes:
    body = b"".join(_len_field(1, s.encode()) for s in strings)
    return _len_field(1, body)


def _blob(block: bytes) -> bytes:
    z = zlib.compress(block)
    blob = _vi_field(2, len(block)) + _len_field(3, z)
    header = (_len_field(1, b"OSMData") + _vi_field(3, len(blob)))
    return struct.pack(">I", len(header)) + header + blob


def _header_blob() -> bytes:
    block = _len_field(4, b"OsmSchema-V0.6") + _len_field(4, b"DenseNodes")
    blob = _vi_field(2, len(block)) + _len_field(3, zlib.compress(block))
    header = (_len_field(1, b"OSMHeader") + _vi_field(3, len(blob)))
    return struct.pack(">I", len(header)) + header + blob


# nodes: (id, lat_nano, lon_nano, {k: v}); way refs those node ids
NODES = [
    (101, 43_700_000_000, 7_400_000_000, {}),
    (102, 43_700_500_000, 7_400_500_000, {"amenity": "cafe"}),
    (103, 43_701_000_000, 7_401_000_000, {}),
]
WAY = (501, [101, 102, 103], {"highway": "primary"})
STRINGS = ["", "amenity", "cafe", "highway", "primary"]
S_IX = {s: i for i, s in enumerate(STRINGS)}


def _dense_block() -> bytes:
    ids = [n[0] for n in NODES]
    lats = [n[1] // 100 for n in NODES]
    lons = [n[2] // 100 for n in NODES]
    kv = []
    for n in NODES:
        for k, v in n[3].items():
            kv += [S_IX[k], S_IX[v]]
        kv.append(0)
    dense = (_packed_zz_delta(1, ids) + _packed_zz_delta(8, lats)
             + _packed_zz_delta(9, lons) + _packed_vi(10, kv))
    group = _len_field(2, dense)
    return _stringtable(STRINGS) + _len_field(2, group)


def _plain_block() -> bytes:
    group = b""
    for nid, lat, lon, tags in NODES:
        node = _vi(1 << 3) + _zzv(nid)
        if tags:
            node += _packed_vi(2, [S_IX[k] for k in tags])
            node += _packed_vi(3, [S_IX[v] for v in tags.values()])
        node += _vi(8 << 3) + _zzv(lat // 100)
        node += _vi(9 << 3) + _zzv(lon // 100)
        group += _len_field(1, node)
    return _stringtable(STRINGS) + _len_field(2, group)


def _way_block(locations_on_ways: bool) -> bytes:
    wid, refs, tags = WAY
    way = _vi_field(1, wid)
    way += _packed_vi(2, [S_IX[k] for k in tags])
    way += _packed_vi(3, [S_IX[v] for v in tags.values()])
    way += _packed_zz_delta(8, refs)
    if locations_on_ways:
        by_id = {n[0]: n for n in NODES}
        way += _packed_zz_delta(9, [by_id[r][1] // 100 for r in refs])
        way += _packed_zz_delta(10, [by_id[r][2] // 100 for r in refs])
    group = _len_field(3, way)
    return _stringtable(STRINGS) + _len_field(2, group)


def _write(path, blocks):
    with open(path, "wb") as f:
        f.write(_header_blob())
        for b in blocks:
            f.write(_blob(b))


@pytest.fixture(scope="module")
def pbf_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("pbf_enc")
    dense = str(d / "dense.pbf")
    plain = str(d / "plain.pbf")
    low = str(d / "locations_on_ways.pbf")
    _write(dense, [_dense_block(), _way_block(False)])
    _write(plain, [_plain_block(), _way_block(False)])
    _write(low, [_way_block(True)])  # no node groups at all
    return dense, plain, low


def _node_set(df):
    return {(r.id, round(r.lat, 7), round(r.lon, 7), tuple(sorted(r.tags.items())))
            for r in df.collect()}


def test_plain_nodes_equal_dense(spark, pbf_paths):
    dense, plain, _ = pbf_paths
    nd, wd, _ = sources_pbf.read_pbf_tables(spark, dense)
    np_, wp, _ = sources_pbf.read_pbf_tables(spark, plain)
    assert _node_set(nd) == _node_set(np_)
    assert nd.count() == 3
    assert wd.select("id", "refs", "tags").collect() \
        == wp.select("id", "refs", "tags").collect()


def test_locations_on_ways_resolve_without_nodes(spark, pbf_paths):
    """A LocationsOnWays file has ways but NO node groups; the way must
    still assemble coordinates (join-free fast path)."""
    from tilemaker_spark.functions.coords import lat2latp
    from tilemaker_spark.operators.profile import assemble_way_geoms
    _, _, low = pbf_paths
    nodes, ways, _ = sources_pbf.read_pbf_tables(spark, low)
    assert nodes.count() == 0
    out = assemble_way_geoms(nodes, ways).collect()
    assert len(out) == 1
    coords = out[0].coords
    assert len(coords) == 6  # 3 points * (lon, latp)
    assert coords[0] == pytest.approx(7.4, abs=1e-7)
    assert coords[1] == pytest.approx(lat2latp(43.7), abs=1e-6)
    assert coords[4] == pytest.approx(7.401, abs=1e-7)


def test_locations_on_ways_matches_join_path(spark, pbf_paths):
    """Same way through both paths -> identical coords."""
    from tilemaker_spark.operators.profile import assemble_way_geoms
    dense, _, low = pbf_paths
    nodes_d, ways_d, _ = sources_pbf.read_pbf_tables(spark, dense)
    nodes_l, ways_l, _ = sources_pbf.read_pbf_tables(spark, low)
    a = assemble_way_geoms(nodes_d, ways_d).collect()[0]
    b = assemble_way_geoms(nodes_l, ways_l).collect()[0]
    assert a.id == b.id
    assert a.coords == pytest.approx(b.coords, abs=1e-9)


def test_dense_tags_missing_trailing_zero():
    """Encoders may omit the final 0 delimiter in keys_vals; the LAST
    node's tags must still be emitted (round-2 advice regression)."""
    import numpy as np
    from tilemaker_spark.sources_pbf import _dense_tags
    strings = ["", "highway", "primary", "name", "Main"]
    with_z = np.array([1, 2, 0, 0, 3, 4, 0], dtype=np.int64)
    no_z = np.array([1, 2, 0, 0, 3, 4], dtype=np.int64)
    expect = [{"highway": "primary"}, {}, {"name": "Main"}]
    assert _dense_tags(with_z, 3, strings) == expect
    assert _dense_tags(no_z, 3, strings) == expect
