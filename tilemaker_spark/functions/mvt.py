"""Mapbox Vector Tile (MVT) encoder — pure-Python protobuf wire format.

Replaces the reference's vtzero-based tile writer
(/root/reference/src/tile_worker.cpp:96-269, include/vtzero/*). The MVT
spec (https://github.com/mapbox/vector-tile-spec, v2.1) is a small
protobuf schema, encoded here directly as wire-format bytes so we don't
need the protobuf package:

  Tile        { repeated Layer layers = 3; }
  Layer       { version=15, name=1, repeated Feature features=2,
                repeated string keys=3, repeated Value values=4,
                extent=5 }
  Feature     { id=1, tags=2 (packed uint32), type=3, geometry=4 (packed) }
  Value       { string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7 }

Geometry commands: MoveTo=1, LineTo=2, ClosePath=7; command integer =
(cmd & 7) | (count << 3); coordinates zigzag-encoded deltas — identical
to what vtzero emits, so byte output is comparable feature-for-feature.

Also provides gzip compression of the finished tile, matching
compress_string (/root/reference/src/helpers.cpp:103-178).
"""

from __future__ import annotations

import gzip
import struct
import zlib

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3

CMD_MOVETO, CMD_LINETO, CMD_CLOSEPATH = 1, 2, 7


def _varint_slow(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# Small-value lookup table: the encode hot path emits millions of 1-3
# byte varints (zigzagged tile-local deltas, tag indexes, field tags);
# a table hit replaces the shift loop. Bytes identical by construction.
_VARINT_TABLE = [_varint_slow(i) for i in range(1 << 16)]


def _varint(n: int) -> bytes:
    if 0 <= n < 65536:
        return _VARINT_TABLE[n]
    return _varint_slow(n)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else (n << 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def encode_value(v) -> bytes:
    """Encode one MVT Value message (typed attrs: string/float/bool/int,
    mirroring AttributePairType — reference include/attribute_store.h:45)."""
    if isinstance(v, bool):
        return _varint_field(7, 1 if v else 0)
    if isinstance(v, int):
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        return _tag(2, 5) + struct.pack("<f", v)
    s = str(v).encode("utf-8")
    return _len_field(1, s)


def _cmd(cmd: int, count: int) -> int:
    return (cmd & 0x7) | (count << 3)


def encode_point_geometry(points) -> bytes:
    """points: iterable of (x, y) int pairs -> packed geometry varints."""
    out = bytearray()
    out += _varint(_cmd(CMD_MOVETO, len(points)))
    px = py = 0
    for x, y in points:
        out += _varint(_zigzag(int(x) - px))
        out += _varint(_zigzag(int(y) - py))
        px, py = int(x), int(y)
    return bytes(out)


def encode_line_geometry(lines) -> bytes:
    """lines: list of [(x,y), ...] integer vertex lists (deduped)."""
    out = bytearray()
    px = py = 0
    for line in lines:
        if len(line) < 2:
            continue
        x0, y0 = int(line[0][0]), int(line[0][1])
        out += _varint(_cmd(CMD_MOVETO, 1))
        out += _varint(_zigzag(x0 - px)) + _varint(_zigzag(y0 - py))
        px, py = x0, y0
        out += _varint(_cmd(CMD_LINETO, len(line) - 1))
        for x, y in line[1:]:
            x, y = int(x), int(y)
            out += _varint(_zigzag(x - px)) + _varint(_zigzag(y - py))
            px, py = x, y
    return bytes(out)


def _ring_shoelace(ring) -> float:
    """Signed area (surveyor's formula) of a [(x,y), ...] ring."""
    n = len(ring)
    if n >= 64:
        # encode hot path: numpy for vertex-heavy rings (water/landuse)
        import numpy as np
        arr = np.asarray(ring, dtype=np.float64)
        x, y = arr[:, 0], arr[:, 1]
        return 0.5 * float(np.dot(x, np.roll(y, -1))
                           - np.dot(np.roll(x, -1), y))
    a = 0.0
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        a += x0 * y1 - x1 * y0
    return 0.5 * a


def normalize_mvt_winding(rings) -> list:
    """Reorient rings to the MVT v2 spec (§4.3.3.3): exterior rings
    positive area, interior rings negative, under the surveyor's
    formula in tile coords (y down).

    Classification is sign-relative, not absolute: the ring with the
    largest |area| is definitionally an exterior (a hole cannot out-
    measure its outer), rings sharing its sign are exteriors, opposite
    signs are holes. This accepts BOTH pipeline conventions — flat-path
    tile rings arrive outers-negative (latp-positive flipped by the y
    inversion), overlay.union_many output arrives outers-positive —
    and emits one spec-compliant convention, so decoders that classify
    by signed area (MapLibre classifyRings) always group correctly.
    Reversal keeps the start vertex (rotation-stable for goldens).
    """
    areas = [_ring_shoelace(r) for r in rings]
    dom = 0.0
    for a in areas:
        if abs(a) > abs(dom):
            dom = a
    if dom == 0.0:
        return list(rings)
    out = []
    for ring, a in zip(rings, areas):
        is_outer = (a > 0) == (dom > 0) or a == 0
        want_pos = is_outer
        if a != 0 and (a > 0) != want_pos:
            ring = [ring[0]] + list(ring)[:0:-1]
        out.append(ring)
    return out


def encode_polygon_geometry(rings) -> bytes:
    """rings: list of [(x,y), ...] closed rings (first pt NOT repeated).

    Ring order: outer then its inners. Winding is normalized to the
    MVT spec here (exterior positive in tile coords) so nesting is
    decodable by signed area regardless of the caller's convention.
    """
    out = bytearray()
    px = py = 0
    for ring in normalize_mvt_winding(rings):
        if len(ring) < 3:
            continue
        x0, y0 = int(ring[0][0]), int(ring[0][1])
        out += _varint(_cmd(CMD_MOVETO, 1))
        out += _varint(_zigzag(x0 - px)) + _varint(_zigzag(y0 - py))
        px, py = x0, y0
        out += _varint(_cmd(CMD_LINETO, len(ring) - 1))
        for x, y in ring[1:]:
            x, y = int(x), int(y)
            out += _varint(_zigzag(x - px)) + _varint(_zigzag(y - py))
            px, py = x, y
        out += _varint(_cmd(CMD_CLOSEPATH, 1))
    return bytes(out)


class LayerBuilder:
    """One MVT layer with per-layer key/value dictionary dedup —
    the same property-interning vtzero does (attribute dedup A1 happens
    here per tile, replacing the reference's global AttributeStore)."""

    def __init__(self, name: str, extent: int = 4096, version: int = 2):
        self.name = name
        self.extent = extent
        self.version = version
        self.keys: list = []
        self.values: list = []
        self._key_ix: dict = {}
        self._val_ix: dict = {}
        self.features: list = []

    def _key(self, k: str) -> int:
        ix = self._key_ix.get(k)
        if ix is None:
            ix = len(self.keys)
            self.keys.append(k)
            self._key_ix[k] = ix
        return ix

    def _value(self, v) -> int:
        tagv = (type(v).__name__, v)
        ix = self._val_ix.get(tagv)
        if ix is None:
            ix = len(self.values)
            self.values.append(v)
            self._val_ix[tagv] = ix
        return ix

    def add_feature(self, geom_type: int, geometry: bytes, attrs=None,
                    feature_id=None):
        tags = bytearray()
        if attrs:
            for k, v in attrs:
                tags += _varint(self._key(k))
                tags += _varint(self._value(v))
        body = bytearray()
        if feature_id is not None:
            body += _varint_field(1, int(feature_id))
        if tags:
            body += _len_field(2, bytes(tags))
        body += _varint_field(3, geom_type)
        body += _len_field(4, geometry)
        self.features.append(bytes(body))

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += _varint_field(15, self.version)
        out += _len_field(1, self.name.encode("utf-8"))
        for f in self.features:
            out += _len_field(2, f)
        for k in self.keys:
            out += _len_field(3, k.encode("utf-8"))
        for v in self.values:
            out += _len_field(4, encode_value(v))
        out += _varint_field(5, self.extent)
        return bytes(out)


def encode_tile(layers) -> bytes:
    """layers: iterable of LayerBuilder -> serialized Tile message."""
    out = bytearray()
    for layer in layers:
        payload = layer.to_bytes() if isinstance(layer, LayerBuilder) else layer
        if payload:
            out += _len_field(3, payload)
    return bytes(out)


def merge_tiles(blobs) -> bytes:
    """Merge several Tile messages into one: features of same-named
    layers are concatenated into a single layer (the MVT spec requires
    unique layer names per tile). Used to combine salted partial tiles
    of one hot (z, x, y) and for --merge tileset unions.

    Geometry command streams are decoded and re-encoded (delta ints are
    relative within a feature, so this is a lossless roundtrip)."""
    merged: dict = {}
    order: list = []
    for b in blobs:
        for name, ld in decode_tile(b).items():
            if name not in merged:
                merged[name] = LayerBuilder(name, extent=ld["extent"],
                                            version=ld.get("version", 2))
                order.append(name)
            lb = merged[name]
            for f in ld["features"]:
                t = f["type"]
                if t == GEOM_POINT:
                    geom = encode_point_geometry([p[0] for p in f["geom"]])
                elif t == GEOM_LINESTRING:
                    geom = encode_line_geometry(f["geom"])
                else:
                    geom = encode_polygon_geometry(f["geom"])
                lb.add_feature(t, geom, attrs=sorted(f["attrs"].items()),
                               feature_id=f["id"])
    return encode_tile([merged[n] for n in order])


def _shallow_layer(buf: bytes):
    """Parse a Layer message keeping features/keys/values as raw bytes."""
    name = b""
    extent, version = 4096, 2
    keys: list = []
    values: list = []
    feats: list = []
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos:pos + ln]
            pos += ln
            if field == 2:
                feats.append(chunk)
            elif field == 3:
                keys.append(chunk)
            elif field == 4:
                values.append(chunk)
            elif field == 1:
                name = chunk
        elif field == 5:
            extent, pos = _read_varint(buf, pos)
        elif field == 15:
            version, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    return name, extent, version, keys, values, feats


def _remap_feature_tags(fbuf: bytes, kmapb: list, vmapb: list) -> bytes:
    """Rewrite only the tags field of a raw Feature message; id, type and
    the geometry command stream are copied verbatim (one tail slice).
    kmapb/vmapb are pre-encoded varint bytes per old index. Varint reads
    are inlined — this runs once per feature of a hot tile's non-first
    partials, the merge task's inner loop."""
    n = len(fbuf)
    pos = 0
    while pos < n:
        start = pos
        key = fbuf[pos]
        pos += 1
        if key & 0x80:  # field >= 16: not an MVT Feature field, skip generic
            key, pos = _read_varint(fbuf, start)
            pos = _skip(fbuf, pos, key & 7)
            continue
        wire = key & 7
        if key == 0x12:  # field 2 wire 2: the tags payload
            ln = fbuf[pos]
            pos += 1
            if ln & 0x80:
                ln &= 0x7F
                shift = 7
                while True:
                    b = fbuf[pos]
                    pos += 1
                    ln |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
            end = pos + ln
            parts = []
            while pos < end:
                v = fbuf[pos]
                pos += 1
                if v & 0x80:
                    v &= 0x7F
                    shift = 7
                    while True:
                        b = fbuf[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                parts.append(kmapb[v])
                v = fbuf[pos]
                pos += 1
                if v & 0x80:
                    v &= 0x7F
                    shift = 7
                    while True:
                        b = fbuf[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                parts.append(vmapb[v])
            tb = b"".join(parts)
            # protobuf allows a packed repeated field split across
            # several chunks — remap the tail too, not just the first
            return (fbuf[:start] + b"\x12" + _varint(len(tb)) + tb +
                    _remap_feature_tags(fbuf[end:], kmapb, vmapb))
        # skip a non-tags field inline
        if wire == 0:
            while fbuf[pos] & 0x80:
                pos += 1
            pos += 1
        elif wire == 2:
            ln = fbuf[pos]
            pos += 1
            if ln & 0x80:
                ln &= 0x7F
                shift = 7
                while True:
                    b = fbuf[pos]
                    pos += 1
                    ln |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
            pos += ln
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:  # wire 3/4/6/7: not valid protobuf here — fail, don't spin
            raise ValueError(f"unsupported protobuf wire type {wire}")
    return fbuf  # feature has no tags field: verbatim


def merge_tiles_fast(blobs) -> bytes:
    """Shallow (wire-level) variant of :func:`merge_tiles` for the salted
    hot-tile merge: feature messages — including the geometry command
    stream, which is feature-relative and therefore position-independent —
    are copied verbatim; only the per-layer key/value dictionaries are
    merged, with tag indexes remapped where the merged tables shift.

    ~30x faster than the decode/re-encode merge on large point tiles
    (the z10 city-center straggler), and byte-identical to
    :func:`merge_tiles` for engine-produced partials (LayerBuilder interns
    keys/values in first-use order and writes attrs key-sorted, so the
    merged tables come out in the same order — pinned by
    tests/test_mvt_merge_fast.py). For foreign tiles with unsorted tags
    the output can differ byte-wise from merge_tiles but decodes to the
    same features."""
    order: list = []
    layers: dict = {}
    for b in blobs:
        pos = 0
        n = len(b)
        while pos < n:
            key, pos = _read_varint(b, pos)
            field, wire = key >> 3, key & 7
            if field == 3 and wire == 2:
                ln, pos = _read_varint(b, pos)
                name, extent, version, keys, values, feats = _shallow_layer(
                    b[pos:pos + ln])
                pos += ln
                L = layers.get(name)
                if L is None:
                    L = layers[name] = {
                        "extent": extent, "version": version,
                        "keys": [], "key_ix": {},
                        "values": [], "val_ix": {}, "feats": [],
                    }
                    order.append(name)
                kmap = []
                identity = True
                for kb in keys:
                    ix = L["key_ix"].get(kb)
                    if ix is None:
                        ix = len(L["keys"])
                        L["keys"].append(kb)
                        L["key_ix"][kb] = ix
                    if ix != len(kmap):
                        identity = False
                    kmap.append(ix)
                vmap = []
                for vb in values:
                    ix = L["val_ix"].get(vb)
                    if ix is None:
                        ix = len(L["values"])
                        L["values"].append(vb)
                        L["val_ix"][vb] = ix
                    if ix != len(vmap):
                        identity = False
                    vmap.append(ix)
                if identity:
                    L["feats"].extend(feats)
                else:
                    kmapb = [_varint(ix) for ix in kmap]
                    vmapb = [_varint(ix) for ix in vmap]
                    L["feats"].extend(
                        _remap_feature_tags(f, kmapb, vmapb) for f in feats)
            else:
                pos = _skip(b, pos, wire)
    out = bytearray()
    for name in order:
        L = layers[name]
        payload = bytearray()
        payload += _varint_field(15, L["version"])
        payload += _len_field(1, name)
        for f in L["feats"]:
            payload += _len_field(2, f)
        for kb in L["keys"]:
            payload += _len_field(3, kb)
        for vb in L["values"]:
            payload += _len_field(4, vb)
        payload += _varint_field(5, L["extent"])
        out += _len_field(3, bytes(payload))
    return bytes(out)


_GZ_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"  # mtime=0, OS=unix


def compress_tile(tile: bytes, mode: str = "gzip") -> bytes:
    """gzip/deflate per config.compress (reference src/helpers.cpp:103-178).
    mtime pinned to 0 for byte-stable output across runs.

    The gzip path hand-assembles header + raw deflate + crc32/isize —
    byte-identical to gzip.compress(level=6, mtime=0) (asserted by
    test_gzip_byte_identical) but ~18% faster per call, and gzip is
    ~half the tile-stage wall, so this is a real headline win."""
    if mode == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        return (_GZ_HEADER + co.compress(tile) + co.flush()
                + zlib.crc32(tile).to_bytes(4, "little")
                + (len(tile) & 0xFFFFFFFF).to_bytes(4, "little"))
    if mode == "deflate":
        return zlib.compress(tile, 6)
    return tile


# ------------------------------------------------------------- decoding
# Minimal decoder for tests/golden checks (round-trip verification).

def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def decode_tile(buf: bytes) -> dict:
    """Parse a Tile message back to {layer_name: {extent, features:[...]}}.
    Each feature: {id, type, geom: [[(x,y),...] per part], attrs: dict}."""
    layers = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            layer = _decode_layer(buf[pos:pos + ln])
            layers[layer["name"]] = layer
            pos += ln
        else:
            pos = _skip(buf, pos, wire)
    return layers


def _skip(buf, pos, wire):
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    elif wire == 1:
        pos += 8
    else:
        # wire 3/4 (deprecated groups) / 6/7 (reserved) never occur in
        # MVT; returning pos unchanged would make every `while pos < n`
        # decode loop spin forever on a corrupt byte — fail fast instead
        # (merge-read and the tile server decode FOREIGN tilesets).
        raise ValueError(f"unsupported protobuf wire type {wire}")
    return pos


def _decode_layer(buf: bytes) -> dict:
    name, extent, version = "", 4096, 2
    keys, values, features = [], [], []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            features.append(_decode_feature(buf[pos:pos + ln]))
            pos += ln
        elif field == 3:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            values.append(_decode_value(buf[pos:pos + ln]))
            pos += ln
        elif field == 5:
            extent, pos = _read_varint(buf, pos)
        elif field == 15:
            version, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    for f in features:
        f["attrs"] = {keys[k]: values[v] for k, v in f.pop("tag_pairs")}
    return {"name": name, "extent": extent, "version": version,
            "features": features}


def _decode_value(buf: bytes):
    pos = 0
    key, pos = _read_varint(buf, pos)
    field, wire = key >> 3, key & 7
    if field == 1:
        ln, pos = _read_varint(buf, pos)
        return buf[pos:pos + ln].decode("utf-8")
    if field == 2:
        return struct.unpack("<f", buf[pos:pos + 4])[0]
    if field == 3:
        return struct.unpack("<d", buf[pos:pos + 8])[0]
    if field in (4, 5):
        v, pos = _read_varint(buf, pos)
        return v
    if field == 6:
        v, pos = _read_varint(buf, pos)
        return _unzigzag(v)
    if field == 7:
        v, pos = _read_varint(buf, pos)
        return bool(v)
    return None


def _decode_feature(buf: bytes) -> dict:
    fid, ftype, geom_ints, tag_pairs = None, 0, [], []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            fid, pos = _read_varint(buf, pos)
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            flat = []
            while pos < end:
                v, pos = _read_varint(buf, pos)
                flat.append(v)
            tag_pairs = list(zip(flat[::2], flat[1::2]))
        elif field == 3:
            ftype, pos = _read_varint(buf, pos)
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                geom_ints.append(v)
        else:
            pos = _skip(buf, pos, wire)
    # decode command stream to parts
    parts = []
    cur = []
    x = y = 0
    i = 0
    while i < len(geom_ints):
        cmd_int = geom_ints[i]
        i += 1
        cmd, count = cmd_int & 7, cmd_int >> 3
        if cmd == CMD_MOVETO:
            for _ in range(count):
                x += _unzigzag(geom_ints[i]); y += _unzigzag(geom_ints[i + 1]); i += 2
                if ftype == GEOM_POINT:
                    parts.append([(x, y)])
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(x, y)]
        elif cmd == CMD_LINETO:
            for _ in range(count):
                x += _unzigzag(geom_ints[i]); y += _unzigzag(geom_ints[i + 1]); i += 2
                cur.append((x, y))
        elif cmd == CMD_CLOSEPATH:
            if cur:
                parts.append(cur)
                cur = []
    if cur:
        parts.append(cur)
    return {"id": fid, "type": ftype, "geom": parts, "tag_pairs": tag_pairs}
