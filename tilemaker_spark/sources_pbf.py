"""OSM PBF scan (S1) — block-parallel reader for .osm.pbf files.

Re-expresses the reference's PbfReader/PbfProcessor
(src/pbf_reader.cpp, src/pbf_processor.cpp:506-748) Spark-first:

  1. the DRIVER walks only the blob framing (4-byte BE length +
     BlobHeader) to build the blob list — a few bytes per ~8k-entity
     block, the same cheap pass the reference does to plan work;
  2. the blob list becomes a DataFrame; a mapInPandas stage opens the
     file per partition, decompresses and parses its blobs — the
     reference's per-phase thread pools become input-split parallelism
     (blobs ↔ splits), and the mutable node/way stores become plain
     DataFrames downstream.

The protobuf wire decoding is hand-rolled (same style as the MVT codec
in functions/mvt.py): OSM PBF fileformat/osmformat per the public spec
(wiki.openstreetmap.org/wiki/PBF_Format). DenseNodes delta decoding
vectorizes with numpy cumsum.

Output: one entities DataFrame
    (etype: 'node'|'way'|'relation', id, lat, lon, tags,
     refs array<long>, members array<struct<mtype,ref,role>>)
split into nodes/ways/relations by a cheap filter (partition-pruned by
the etype column when persisted partitioned).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENTITY_SCHEMA = (
    "etype string, id long, lat double, lon double, "
    "tags map<string,string>, refs array<long>, "
    "members array<struct<mtype:string, ref:long, role:string>>")

_MEMBER_TYPES = ("node", "way", "relation")


# ------------------------------------------------------ wire primitives

def _rv(buf: bytes, pos: int):
    """Read one varint."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zz(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value_or_bytes) of one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _rv(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _rv(buf, pos)
            yield field, 0, v
        elif wire == 2:
            ln, pos = _rv(buf, pos)
            yield field, 2, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            yield field, 5, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            yield field, 1, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _packed_varints(buf: bytes) -> np.ndarray:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _rv(buf, pos)
        out.append(v)
    return np.asarray(out, dtype=np.uint64)


def _packed_sint_delta(buf: bytes) -> np.ndarray:
    """Packed sint64 with per-element delta coding -> absolute values."""
    raw = _packed_varints(buf).astype(np.int64)
    dezz = (raw >> 1) ^ -(raw & 1)
    return np.cumsum(dezz)


# -------------------------------------------------------- blob framing

def scan_blobs(path: str) -> list:
    """Walk the file's blob framing; returns
    [(offset, header_len, data_len, type), ...] without reading blob
    payloads (the planning pass)."""
    blobs = []
    with open(path, "rb") as f:
        while True:
            lenbuf = f.read(4)
            if len(lenbuf) < 4:
                break
            hlen = struct.unpack(">I", lenbuf)[0]
            header = f.read(hlen)
            btype = ""
            datasize = 0
            for field, wire, val in _fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    datasize = val
            offset = f.tell()
            blobs.append((offset, hlen, datasize, btype))
            f.seek(offset + datasize)
    return blobs


def _blob_payload(raw: bytes) -> bytes:
    """Blob message -> decompressed PrimitiveBlock/HeaderBlock bytes."""
    data = b""
    for field, wire, val in _fields(raw):
        if field == 1:      # raw
            data = val
        elif field == 3:    # zlib_data
            data = zlib.decompress(val)
    return data


# ------------------------------------------------------- block parsing

def _parse_primitive_block(buf: bytes) -> list:
    """PrimitiveBlock -> list of entity tuples (ENTITY_SCHEMA order)."""
    strings: list = []
    groups: list = []
    granularity = 100
    lat_off = 0
    lon_off = 0
    for field, wire, val in _fields(buf):
        if field == 1:       # stringtable
            for f2, w2, s in _fields(val):
                if f2 == 1:
                    strings.append(s.decode("utf-8", "replace"))
        elif field == 2:     # primitivegroup
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val

    scale = 1e-9
    out = []
    for g in groups:
        for field, wire, val in _fields(g):
            if field == 2:    # DenseNodes
                ids = lats = lons = None
                kv = np.asarray([], dtype=np.int64)
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        ids = _packed_sint_delta(v2)
                    elif f2 == 8:
                        lats = _packed_sint_delta(v2)
                    elif f2 == 9:
                        lons = _packed_sint_delta(v2)
                    elif f2 == 10:
                        kv = _packed_varints(v2).astype(np.int64)
                if ids is None:
                    continue
                lat_deg = scale * (lat_off + granularity * lats)
                lon_deg = scale * (lon_off + granularity * lons)
                # keys_vals: k,v index pairs per node, 0-terminated
                tag_iter = iter(kv.tolist())
                for i in range(len(ids)):
                    tags = {}
                    for k in tag_iter:
                        if k == 0:
                            break
                        v = next(tag_iter)
                        tags[strings[k]] = strings[v]
                    out.append(("node", int(ids[i]), float(lat_deg[i]),
                                float(lon_deg[i]), tags, None, None))
            elif field == 3:  # Way
                wid = 0
                keys = vals = np.asarray([], dtype=np.uint64)
                refs = np.asarray([], dtype=np.int64)
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = _packed_sint_delta(v2)
                tags = {strings[int(k)]: strings[int(v)]
                        for k, v in zip(keys, vals)}
                out.append(("way", int(wid), None, None, tags,
                            [int(r) for r in refs], None))
            elif field == 4:  # Relation
                rid = 0
                keys = vals = roles = types = np.asarray([], dtype=np.uint64)
                memids = np.asarray([], dtype=np.int64)
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = _packed_sint_delta(v2)
                    elif f2 == 10:
                        types = _packed_varints(v2)
                tags = {strings[int(k)]: strings[int(v)]
                        for k, v in zip(keys, vals)}
                members = [
                    {"mtype": _MEMBER_TYPES[int(t)], "ref": int(m),
                     "role": strings[int(r)]}
                    for t, m, r in zip(types, memids, roles)]
                out.append(("relation", int(rid), None, None, tags,
                            None, members))
    return out


def read_pbf_header(path: str) -> dict:
    """S2 — header/bbox probe (reference src/pbf_processor.cpp:762-785)."""
    for offset, hlen, dlen, btype in scan_blobs(path):
        if btype != "OSMHeader":
            continue
        with open(path, "rb") as f:
            f.seek(offset)
            block = _blob_payload(f.read(dlen))
        info: dict = {"features": []}
        for field, wire, val in _fields(block):
            if field == 1:    # HeaderBBox, nanodegrees
                bb = {}
                for f2, w2, v2 in _fields(val):
                    bb[f2] = _zz(v2)
                info["bbox"] = [bb.get(1, 0) * 1e-9, bb.get(3, 0) * 1e-9,
                                bb.get(2, 0) * 1e-9, bb.get(4, 0) * 1e-9]
            elif field == 4:
                info["features"].append(val.decode())
        return info
    return {}


def read_pbf(spark: SparkSession, path: str,
             partitions: int | None = None) -> DataFrame:
    """Block-parallel PBF scan -> entities DataFrame (ENTITY_SCHEMA).

    Split nodes/ways/relations with ``.filter(F.col('etype') == ...)``
    (or use :func:`read_pbf_tables`).
    """
    blobs = [(o, h, d, t) for o, h, d, t in scan_blobs(path)
             if t == "OSMData"]
    n_part = partitions or min(
        len(blobs), spark.sparkContext.defaultParallelism * 2) or 1
    blob_df = spark.createDataFrame(
        [(o, d) for o, h, d, _ in blobs],
        "offset long, datasize long").repartition(n_part)

    def parse(batches):
        with open(path, "rb") as f:
            for pdf in batches:
                rows = []
                for off, size in zip(pdf["offset"], pdf["datasize"]):
                    f.seek(int(off))
                    block = _blob_payload(f.read(int(size)))
                    rows.extend(_parse_primitive_block(block))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["etype", "id", "lat", "lon", "tags",
                                       "refs", "members"])

    return blob_df.mapInPandas(parse, schema=ENTITY_SCHEMA)


def read_pbf_tables(spark: SparkSession, path: str):
    """(nodes, ways, relations) DataFrames in the engine's fixture
    schemas (FIXTURES.md §2/§3)."""
    ents = read_pbf(spark, path)
    nodes = ents.filter(F.col("etype") == "node") \
        .select("id", "lat", "lon", "tags")
    ways = ents.filter(F.col("etype") == "way") \
        .select("id", "refs", "tags")
    relations = ents.filter(F.col("etype") == "relation") \
        .select("id", "members", "tags")
    return nodes, ways, relations
