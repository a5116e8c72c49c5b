"""External layer sources — the shapefile / GeoJSON analogs (S3/S4).

Reference: SHP+DBF reader with column projection and ring->polygon
winding assembly (src/shp_processor.cpp:110-279); GeoJSON
FeatureCollection + JSONL reader (src/geojson_processor.cpp:17-77,
199-283; JSONL chunking src/helpers.cpp:210).

Spark shapes:
  * JSONL GeoJSON is read by spark.read.json directly — newline-aligned
    chunking is Spark's native text-split behavior, so the reference's
    hand-rolled parallel chunker disappears.
  * FeatureCollection files are a single JSON document: read via
    multiLine json + explode(features).
  * The shapefile analog reads a tabular source (parquet/CSV) carrying a
    WKT geometry column + attribute columns; `source_columns` projection
    is a select() (Catalyst prunes at scan).

Output schema (the spatial-join build side / layer_polygons shape):
    (layer, name, geom_type, rings array<array<double>>, attrs map)
rings are flat [x,y,...] in (lon, lat), outer ring first, holes after
(iter_polygons winding convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tilemaker_spark.functions import geomnp as G

LAYER_SCHEMA = ("layer string, name string, geom_type int, "
                "rings array<array<double>>, attrs map<string,string>")


# ------------------------------------------------------------ WKT parse

def _parse_wkt(wkt: str):
    """Minimal WKT parser: POINT/LINESTRING/POLYGON/MULTIPOLYGON/
    MULTILINESTRING. Returns (geom_type, parts) with parts a list of
    flat [x,y,...] python lists."""
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper()
    body = s[s.index("("):] if "(" in s else "()"

    def coords(txt):
        pts = []
        for pair in txt.split(","):
            xy = pair.strip().split()
            pts.extend([float(xy[0]), float(xy[1])])
        return pts

    def rings_of(txt):
        # txt like "(x y, x y, ...), (...)" — split top-level parens
        out = []
        depth = 0
        cur = ""
        for ch in txt:
            if ch == "(":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            if ch == ")":
                depth -= 1
                if depth == 0:
                    out.append(coords(cur))
                    continue
            if depth >= 1:
                cur += ch
        return out

    if head == "POINT":
        return G.GEOM_POINT, [coords(body.strip("() "))]
    if head == "LINESTRING":
        return G.GEOM_LINE, [coords(body.strip("() "))]
    if head == "MULTILINESTRING":
        return G.GEOM_LINE, rings_of(body[1:-1])
    if head == "POLYGON":
        return G.GEOM_POLYGON, rings_of(body[1:-1])
    if head == "MULTIPOLYGON":
        parts = []
        depth = 0
        cur = ""
        polys = []
        for ch in body[1:-1]:
            if ch == "(":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            if ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(cur)
                    continue
            if depth >= 1:
                cur += ch
        for p in polys:
            parts.extend(rings_of("(" + p + ")") if not p.startswith("(")
                         else rings_of(p))
        return G.GEOM_POLYGON, parts
    raise ValueError(f"unsupported WKT type: {head}")


def _orient_rings(geom_type: int, parts: list) -> list:
    """G11 make_valid: shapefile winding assembly
    (src/shp_processor.cpp:178-224) plus self-intersection dissolve
    (src/geom.cpp:138-145, include/geometry/correct.hpp) — rings that
    cross themselves or each other are re-extracted as clean simple
    rings via the overlay kernel; then the first ring's orientation is
    the outer convention, holes the opposite sign (outer forced
    positive)."""
    if geom_type != G.GEOM_POLYGON or not parts:
        return parts
    out = []
    for ring in parts:
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        # drop duplicated closing point
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        out.append(r)
    if not out:
        return []
    from tilemaker_spark.functions import overlay as OV
    if OV.needs_dissolve(out):
        dissolved = OV.make_valid(out)
        if dissolved:
            out = dissolved
    oriented = []
    first_sign = 1.0 if G.ring_area(out[0]) >= 0 else -1.0
    for i, r in enumerate(out):
        a = G.ring_area(r)
        sign = 1.0 if a >= 0 else -1.0
        is_outer = sign == first_sign
        want_pos = is_outer
        if (a >= 0) != want_pos:
            r = r[::-1]
        oriented.append(r.reshape(-1).tolist())
    return oriented


def read_wkt_layer(df: DataFrame, layer: str,
                   wkt_col: str = "wkt",
                   name_col: str = "name",
                   source_columns: list | None = None) -> DataFrame:
    """Shapefile-analog scan: tabular DataFrame with a WKT column ->
    canonical layer schema. source_columns projects the attribute
    columns kept in attrs (F9 column projection — a select, so parquet
    scans only those columns)."""
    attr_cols = source_columns or [
        c for c in df.columns if c not in (wkt_col, name_col)]
    proj = df.select(name_col, wkt_col, *attr_cols)

    @pandas_udf("struct<geom_type:int, rings:array<array<double>>>")
    def parse(wkt: pd.Series) -> pd.DataFrame:
        types, rings = [], []
        for w in wkt:
            gt, parts = _parse_wkt(w)
            types.append(gt)
            rings.append(_orient_rings(gt, parts))
        return pd.DataFrame({"geom_type": types, "rings": rings})

    attrs = F.map_from_arrays(
        F.array(*[F.lit(c) for c in attr_cols]),
        F.array(*[F.col(c).cast("string") for c in attr_cols])) \
        if attr_cols else F.expr("map()")
    return (proj.withColumn("_g", parse(F.col(wkt_col)))
            .select(F.lit(layer).alias("layer"),
                    F.col(name_col).alias("name"),
                    F.col("_g.geom_type").alias("geom_type"),
                    F.col("_g.rings").alias("rings"),
                    attrs.alias("attrs")))


# --------------------------------------------------------------- WKB

_WKB_BASE = {1: G.GEOM_POINT, 2: G.GEOM_LINE, 3: G.GEOM_POLYGON,
             4: G.GEOM_POINT, 5: G.GEOM_LINE, 6: G.GEOM_POLYGON}


def _parse_wkb(buf: bytes):
    """(geom_type, parts) from ISO WKB or PostGIS EWKB bytes.

    Handles both dimension conventions (ISO type+1000/2000/3000 for
    Z/M/ZM; EWKB 0x80000000/0x40000000 flag bits, 0x20000000 SRID) —
    Z/M ordinates are parsed and dropped, SRID skipped. Multi*
    geometries flatten into the engine's flat parts list (same shape as
    the WKT/GeoJSON scans). No external geo libs: plain struct/numpy
    over the spec (OGC 06-103r4 §8)."""
    import struct as _s

    def parse_geom(pos):
        bo = "<" if buf[pos] == 1 else ">"
        raw = _s.unpack_from(bo + "I", buf, pos + 1)[0]
        pos += 5
        if raw & 0x20000000:  # EWKB SRID present
            pos += 4
        dims = 2 + bool(raw & 0x80000000) + bool(raw & 0x40000000)
        base = raw & 0x0FFFFFFF
        if base >= 1000:  # ISO: 1000=Z 2000=M 3000=ZM
            dims = {1: 3, 2: 3, 3: 4}[base // 1000]
            base = base % 1000
        if base in (1, 2, 3):
            if base == 1:
                vals = _s.unpack_from(f"{bo}{dims}d", buf, pos)
                return base, [[vals[0], vals[1]]], pos + 8 * dims
            if base == 2:
                n = _s.unpack_from(bo + "I", buf, pos)[0]
                pos += 4
                vals = _s.unpack_from(f"{bo}{n * dims}d", buf, pos)
                xy = [vals[i * dims + k] for i in range(n) for k in (0, 1)]
                return base, [xy], pos + 8 * n * dims
            nr = _s.unpack_from(bo + "I", buf, pos)[0]
            pos += 4
            parts = []
            for _ in range(nr):
                n = _s.unpack_from(bo + "I", buf, pos)[0]
                pos += 4
                vals = _s.unpack_from(f"{bo}{n * dims}d", buf, pos)
                parts.append([vals[i * dims + k]
                              for i in range(n) for k in (0, 1)])
                pos += 8 * n * dims
            return base, parts, pos
        if base in (4, 5, 6, 7):  # Multi* / GeometryCollection
            n = _s.unpack_from(bo + "I", buf, pos)[0]
            pos += 4
            sub_base = None
            parts = []
            for _ in range(n):
                b2, p2, pos = parse_geom(pos)
                if sub_base is None:
                    sub_base = b2
                # Multi* members are homogeneous by spec; a mixed
                # GeometryCollection (type 7) keeps only members of the
                # FIRST member's geometry class — one feature carries
                # one geom_type, and reinterpreting e.g. polygon rings
                # as line parts would corrupt downstream clipping.
                # (Documented limitation: split mixed collections into
                # separate rows upstream to keep every member.)
                if b2 == sub_base:
                    parts.extend(p2)
            return sub_base or 1, parts, pos
        raise ValueError(f"unsupported WKB geometry type {base}")

    base, parts, _ = parse_geom(0)
    return _WKB_BASE.get(base, base if base in (1, 2, 3) else 1), parts


def read_wkb_layer(df: DataFrame, layer: str,
                   wkb_col: str = "wkb",
                   name_col: str = "name",
                   source_columns: list | None = None) -> DataFrame:
    """WKB-column scan (the Spark-ecosystem interchange format —
    GeoParquet/Sedona tables carry geometry as WKB binary): tabular
    DataFrame with a WKB column -> the same canonical layer schema as
    read_wkt_layer, winding normalized through _orient_rings."""
    attr_cols = source_columns or [
        c for c in df.columns if c not in (wkb_col, name_col)]
    proj = df.select(name_col, wkb_col, *attr_cols)

    @pandas_udf("struct<geom_type:int, rings:array<array<double>>>")
    def parse(wkb: pd.Series) -> pd.DataFrame:
        types, rings = [], []
        for b in wkb:
            gt, parts = _parse_wkb(bytes(b))
            types.append(gt)
            rings.append(_orient_rings(gt, parts))
        return pd.DataFrame({"geom_type": types, "rings": rings})

    attrs = F.map_from_arrays(
        F.array(*[F.lit(c) for c in attr_cols]),
        F.array(*[F.col(c).cast("string") for c in attr_cols])) \
        if attr_cols else F.expr("map()")
    return (proj.withColumn("_g", parse(F.col(wkb_col)))
            .select(F.lit(layer).alias("layer"),
                    F.col(name_col).alias("name"),
                    F.col("_g.geom_type").alias("geom_type"),
                    F.col("_g.rings").alias("rings"),
                    attrs.alias("attrs")))


# ------------------------------------------- GeoParquet write (S4f)

def _encode_wkb(geom_type: int, parts: list) -> tuple:
    """(wkb_bytes, type_name) — inverse of :func:`_parse_wkb` over the
    canonical flat-parts layer schema: little-endian ISO WKB
    (OGC 06-103r4 §8), no Z/M, no SRID.

    Points: one part -> Point, many -> MultiPoint. Lines likewise.
    Polygons regroup the flat ring list by the engine's orientation
    convention (_orient_rings: outer rings positive area, holes
    negative) — a positive ring opens a new polygon, negatives attach
    as its holes; rings are re-closed per spec (the canonical form
    drops the closing point)."""
    import struct as _s

    def point(xy):
        return b"\x01" + _s.pack("<Idd", 1, xy[0], xy[1])

    def linestring(flat):
        n = len(flat) // 2
        return b"\x01" + _s.pack("<II", 2, n) + _s.pack(f"<{2 * n}d", *flat)

    def ring_bytes(flat):
        closed = list(flat)
        if len(closed) >= 4 and (closed[0], closed[1]) != (closed[-2],
                                                           closed[-1]):
            closed += [closed[0], closed[1]]
        n = len(closed) // 2
        return _s.pack("<I", n) + _s.pack(f"<{2 * n}d", *closed)

    if geom_type == G.GEOM_POINT:
        if len(parts) == 1:
            return point(parts[0]), "Point"
        body = b"".join(point(p) for p in parts)
        return (b"\x01" + _s.pack("<II", 4, len(parts)) + body,
                "MultiPoint")
    if geom_type == G.GEOM_LINE:
        if len(parts) == 1:
            return linestring(parts[0]), "LineString"
        body = b"".join(linestring(p) for p in parts)
        return (b"\x01" + _s.pack("<II", 5, len(parts)) + body,
                "MultiLineString")
    polys = []
    for flat in parts:
        r = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
        if G.ring_area(r) >= 0 or not polys:
            polys.append([flat])
        else:
            polys[-1].append(flat)

    def polygon(rs):
        return (b"\x01" + _s.pack("<II", 3, len(rs))
                + b"".join(ring_bytes(r) for r in rs))

    if len(polys) == 1:
        return polygon(polys[0]), "Polygon"
    return (b"\x01" + _s.pack("<II", 6, len(polys))
            + b"".join(polygon(p) for p in polys), "MultiPolygon")


def write_geoparquet(layer_df: DataFrame, path: str,
                     geometry_name: str = "geometry") -> int:
    """GeoParquet sink — the interchange writer paired with
    read_wkb_layer (GeoParquet/Sedona tables carry WKB geometry).

    Distributed shape: every Spark partition writes its own
    footer-complete parquet file via pyarrow (mapInPandas; no
    single-writer choke — the write_tile_directory pattern), each file
    carrying the OGC GeoParquet ``geo`` key-value footer metadata
    (version 1.0.0: primary_column, WKB encoding, file-local bbox and
    geometry_types). A directory of per-task GeoParquet files is the
    standard cluster/object-store layout; readers union them. Each
    partition is buffered as one Arrow table before writing (one row
    group) — partitions are already sized to executor memory by the
    engine's explicit repartitioning, and the footer bbox cannot be
    known before the partition is exhausted.

    File schema: layer string, name string, attrs map<string,string>,
    ``geometry_name`` binary (WKB). Returns total features written.
    """
    import glob as _glob
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    # overwrite semantics, like every Spark .mode("overwrite") sink: a
    # rerun with fewer partitions must not leave stale part files that
    # readers would union with the new data
    for stale in _glob.glob(_os.path.join(path, "part-*.parquet")):
        _os.remove(stale)
    src = layer_df.select("layer", "name", "geom_type", "rings",
                          F.to_json("attrs").alias("_attrs_json"))
    # explicit count before the CPU-bound Python encode stage — AQE
    # byte-based coalescing would otherwise collapse a post-shuffle
    # input to a handful of giant single-row-group files
    sess = layer_df.sparkSession
    src = src.repartition(sess.sparkContext.defaultParallelism * 2)

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        layers, names, attrs, wkbs, gtypes = [], [], [], [], set()
        bbox = [np.inf, np.inf, -np.inf, -np.inf]
        for pdf in batches:
            for gt, rings in zip(pdf["geom_type"], pdf["rings"]):
                parts = [list(r) for r in rings]
                wkb, tname = _encode_wkb(int(gt), parts)
                wkbs.append(wkb)
                gtypes.add(tname)
                for flat in parts:
                    if not flat:
                        continue
                    xs, ys = flat[0::2], flat[1::2]
                    bbox[0] = min(bbox[0], min(xs))
                    bbox[1] = min(bbox[1], min(ys))
                    bbox[2] = max(bbox[2], max(xs))
                    bbox[3] = max(bbox[3], max(ys))
            layers.extend(pdf["layer"])
            names.extend(pdf["name"])
            attrs.extend(_json.loads(a) if a else {}
                         for a in pdf["_attrs_json"])
        if wkbs:
            col_meta = {"encoding": "WKB",
                        "geometry_types": sorted(gtypes),
                        "crs": None}  # null = OGC:CRS84 per spec
            if bbox[0] <= bbox[2]:  # bbox is optional per spec; an
                # all-empty-parts partition would otherwise emit
                # JSON-invalid Infinity values
                col_meta["bbox"] = bbox
            geo = {"version": "1.0.0",
                   "primary_column": geometry_name,
                   "columns": {geometry_name: col_meta}}
            table = pa.table(
                {"layer": pa.array(layers, pa.string()),
                 "name": pa.array(names, pa.string()),
                 "attrs": pa.array(attrs,
                                   pa.map_(pa.string(), pa.string())),
                 geometry_name: pa.array(wkbs, pa.binary())})
            table = table.replace_schema_metadata(
                {"geo": _json.dumps(geo)})
            pq.write_table(table, _os.path.join(
                path, f"part-{pid:05d}.parquet"))
        yield pd.DataFrame({"rows": [len(wkbs)]})

    counts = src.mapInPandas(write_part, "rows long")
    return int(counts.agg(F.sum("rows")).collect()[0][0] or 0)


# ----------------------------------------------------------- GeoJSON

_GJ_TYPE_MAP = {"Point": G.GEOM_POINT, "LineString": G.GEOM_LINE,
                "MultiLineString": G.GEOM_LINE, "Polygon": G.GEOM_POLYGON,
                "MultiPolygon": G.GEOM_POLYGON, "MultiPoint": G.GEOM_POINT}


def _gj_parts(gtype: str, coords) -> list:
    if gtype == "Point":
        return [[float(coords[0]), float(coords[1])]]
    if gtype == "MultiPoint":
        return [[float(v) for xy in coords for v in xy[:2]]]
    if gtype == "LineString":
        return [[float(v) for xy in coords for v in xy[:2]]]
    if gtype == "MultiLineString":
        return [[float(v) for xy in line for v in xy[:2]] for line in coords]
    if gtype == "Polygon":
        return [[float(v) for xy in ring for v in xy[:2]] for ring in coords]
    if gtype == "MultiPolygon":
        return [[float(v) for xy in ring for v in xy[:2]]
                for poly in coords for ring in poly]
    raise ValueError(f"unsupported GeoJSON type {gtype}")


def read_geojson(spark: SparkSession, path: str, layer: str,
                 name_attr: str = "name",
                 jsonl: bool | None = None) -> DataFrame:
    """GeoJSON scan: JSONL (one Feature per line, Spark-native splits)
    or a single FeatureCollection document (multiLine read + explode).
    """
    if jsonl is None:
        jsonl = path.endswith((".jsonl", ".ndjson"))
    if jsonl:
        raw = spark.read.json(path)
        feats = raw
    else:
        raw = spark.read.option("multiLine", "true").json(path)
        feats = raw.select(F.explode("features").alias("f")).select("f.*")

    # properties arrive as a struct with file-dependent fields; geometry
    # as struct<type, coordinates> with ragged nesting -> parse the
    # geometry from re-serialized JSON in a vectorized UDF (schema-free)
    gj = feats.select(
        F.to_json(F.col("geometry")).alias("_geo"),
        F.to_json(F.col("properties")).alias("_props"))

    @pandas_udf("struct<geom_type:int, rings:array<array<double>>, "
                "name:string, attrs:map<string,string>>")
    def parse(geo: pd.Series, props: pd.Series) -> pd.DataFrame:
        import json as _json
        types, rings, names, attrs = [], [], [], []
        for g, p in zip(geo, props):
            gd = _json.loads(g)
            pd_ = _json.loads(p) if p else {}
            gt = _GJ_TYPE_MAP[gd["type"]]
            # mixed geometry types in one file make Spark's schema
            # inference fall back to strings at whatever nesting level
            # unified — normalize recursively
            def _norm(c):
                if isinstance(c, str):
                    s = c.strip()
                    if s.startswith("["):
                        return [_norm(x) for x in _json.loads(s)]
                    return float(s)
                if isinstance(c, list):
                    return [_norm(x) for x in c]
                return float(c)

            parts = _gj_parts(gd["type"], _norm(gd["coordinates"]))
            types.append(gt)
            rings.append(_orient_rings(gt, parts))
            names.append(str(pd_.get(name_attr, "")))
            attrs.append({k: str(v) for k, v in pd_.items()})
        return pd.DataFrame({"geom_type": types, "rings": rings,
                             "name": names, "attrs": attrs})

    return (gj.withColumn("_f", parse(F.col("_geo"), F.col("_props")))
            .select(F.lit(layer).alias("layer"),
                    F.col("_f.name").alias("name"),
                    F.col("_f.geom_type").alias("geom_type"),
                    F.col("_f.rings").alias("rings"),
                    F.col("_f.attrs").alias("attrs")))


# -------------------------------------------------------- bbox probe (S2)

def probe_bbox(layer_df: DataFrame, rings_col: str = "rings") -> tuple:
    """Dataset bbox via one aggregation (the reference's PBF header
    probe, src/pbf_processor.cpp:762-785, generalized)."""
    flat = layer_df.select(F.explode(rings_col).alias("r"))
    per_row = flat.select(
        F.expr("array_min(filter(r, (v, i) -> i % 2 = 0))").alias("x0"),
        F.expr("array_max(filter(r, (v, i) -> i % 2 = 0))").alias("x1"),
        F.expr("array_min(filter(r, (v, i) -> i % 2 = 1))").alias("y0"),
        F.expr("array_max(filter(r, (v, i) -> i % 2 = 1))").alias("y1"))
    row = per_row.agg(F.min("x0").alias("a"), F.min("y0").alias("b"),
                      F.max("x1").alias("c"), F.max("y1").alias("d")).first()
    return (row.a, row.b, row.c, row.d)


# ----------------------------------------------- binary shapefile (S3)

_SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = 1, 3, 5, 8
_SHP_TYPE_MAP = {_SHP_POINT: G.GEOM_POINT, _SHP_MULTIPOINT: G.GEOM_POINT,
                 _SHP_POLYLINE: G.GEOM_LINE, _SHP_POLYGON: G.GEOM_POLYGON}


def _scan_shp_records(path: str) -> list:
    """Driver planning pass (mirrors sources_pbf.scan_blobs): walk the
    .shp record headers only — (record_no, offset, content_bytes) per
    record, a seek + 8 bytes each, no geometry parsing."""
    import os
    import struct
    recs = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(100)  # fixed 100-byte file header (ESRI whitepaper p.3)
        pos = 100
        while pos + 8 <= size:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            recno, words = struct.unpack(">ii", hdr)
            recs.append((recno, pos + 8, words * 2))
            pos += 8 + words * 2
            f.seek(pos)
    return recs


def _parse_shp_geometry(buf: bytes):
    """One .shp record content -> (geom_type, rings flat-list) or None
    for null shapes. Layout per the ESRI shapefile whitepaper."""
    import struct
    stype = struct.unpack_from("<i", buf, 0)[0]
    if stype == 0:
        return None
    if stype == _SHP_POINT:
        x, y = struct.unpack_from("<dd", buf, 4)
        return G.GEOM_POINT, [[x, y]]
    if stype == _SHP_MULTIPOINT:
        n = struct.unpack_from("<i", buf, 36)[0]
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=40)
        return G.GEOM_POINT, [pts.tolist()]
    if stype in (_SHP_POLYLINE, _SHP_POLYGON):
        nparts, npts = struct.unpack_from("<ii", buf, 36)
        parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts,
                            offset=44 + 4 * nparts).reshape(-1, 2)
        bounds = list(parts) + [npts]
        rings = [pts[bounds[i]:bounds[i + 1]].reshape(-1).tolist()
                 for i in range(nparts)
                 if bounds[i + 1] > bounds[i]]
        return _SHP_TYPE_MAP[stype], rings
    raise ValueError(f"unsupported shape type {stype}")


def _read_dbf_fields(path: str):
    """DBF (dBASE III) header -> (n_records, header_size, record_size,
    [(name, type, length), ...])."""
    import struct
    with open(path, "rb") as f:
        head = f.read(32)
        n_rec, hdr_size, rec_size = struct.unpack_from("<ihh", head, 4)
        fields = []
        while True:
            fd = f.read(32)
            if not fd or fd[0] == 0x0D:
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii", "replace")
            ftype = chr(fd[11])
            flen = fd[16]
            fields.append((name, ftype, flen))
    return n_rec, hdr_size, rec_size, fields


def _decode_dbf_record(buf: bytes, fields) -> dict:
    out = {}
    pos = 1  # skip deletion flag
    for name, ftype, flen in fields:
        raw = buf[pos:pos + flen]
        pos += flen
        v = raw.decode("latin-1").strip()
        out[name] = v
    return out


def read_shapefile(spark: SparkSession, shp_path: str, layer: str,
                   name_column: str | None = None,
                   source_columns: list | None = None,
                   chunk_records: int = 4096) -> DataFrame:
    """S3 — REAL binary .shp + .dbf scan (reference shapelib reader,
    src/shp_processor.cpp:110-279), Spark-first:

      1. the driver walks only the .shp record headers (8 bytes each) to
         build a record index — the same planning pass as the PBF blob
         scan;
      2. record ranges become a DataFrame; executors parse their range's
         geometry (numpy frombuffer — no per-point Python) and the
         corresponding fixed-width .dbf rows via mapInPandas.

    source_columns projects DBF attributes (F9); name_column feeds the
    `name` output column (defaults to the first DBF field). Polygon ring
    winding is normalized through _orient_rings (G11 dissolve included).
    """
    dbf_path = shp_path[:-4] + ".dbf"
    recs = _scan_shp_records(shp_path)
    n_rec, hdr_size, rec_size, fields = _read_dbf_fields(dbf_path)
    field_names = [f[0] for f in fields]
    name_col = name_column or (field_names[0] if field_names else None)
    attr_cols = (source_columns if source_columns is not None
                 else [c for c in field_names if c != name_col])

    chunks = [(i, min(i + chunk_records, len(recs)))
              for i in range(0, len(recs), chunk_records)] or [(0, 0)]
    rec_index = [r for r in recs]  # (recno, offset, length)
    chunk_df = spark.createDataFrame(chunks, "lo int, hi int")

    def parse(batches):
        with open(shp_path, "rb") as fs, open(dbf_path, "rb") as fd:
            for pdf in batches:
                rows = []
                for lo, hi in zip(pdf["lo"], pdf["hi"]):
                    for i in range(int(lo), int(hi)):
                        recno, off, ln = rec_index[i]
                        fs.seek(off)
                        g = _parse_shp_geometry(fs.read(ln))
                        if g is None:
                            continue
                        gt, rings = g
                        if i < n_rec:
                            fd.seek(hdr_size + i * rec_size)
                            attrs_all = _decode_dbf_record(
                                fd.read(rec_size), fields)
                        else:
                            attrs_all = {}
                        nm = attrs_all.get(name_col, str(recno)) \
                            if name_col else str(recno)
                        if gt == G.GEOM_POLYGON:
                            rings = _orient_rings(gt, rings)
                        rows.append((layer, nm, int(gt), rings,
                                     {k: attrs_all.get(k, "")
                                      for k in attr_cols}))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["layer", "name", "geom_type",
                                       "rings", "attrs"])

    n_parts = max(1, min(len(chunks),
                         spark.sparkContext.defaultParallelism))
    return chunk_df.repartition(n_parts).mapInPandas(
        parse, schema=LAYER_SCHEMA)


# ------------------------------------------------ pages table (catalog)

PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_pages_table(spark: SparkSession, table: str | None = None,
                     path: str | None = None, fmt: str = "parquet",
                     snapshot_id: int | None = None,
                     as_of_timestamp: int | None = None,
                     branch: str | None = None,
                     columns: list[str] | None = None,
                     id_col: str = "doc_id") -> DataFrame:
    """Read the mandated pages input table
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

    Production shape: ``table="catalog.db.pages"`` resolves through the
    session catalog — with an Iceberg catalog configured on the session
    (``spark.sql.catalog.<name>`` = org.apache.iceberg.spark.SparkCatalog)
    this IS the Iceberg scan, and the time-travel read options pass
    through untouched: ``snapshot-id``, ``as-of-timestamp`` and
    ``branch`` are Iceberg read options (file-source providers ignore
    them), so a pipeline can pin a crawl snapshot for reproducible
    reruns. Sandbox/tests: ``path=`` reads a file-based table of the
    same shape (default parquet) — exactly one of ``table``/``path`` is
    required.

    A deterministic 64-bit ``id_col`` is derived as ``xxhash64(url)``
    when the table lacks one (the engine's geo-derivation, spatial
    joins and dedup key on it); a table that already carries the column
    passes it through byte-identical. xxhash64 is a pure per-row
    projection — no ``monotonically_increasing_id`` (partition-layout
    dependent, not reproducible across reruns) and no global
    ``row_number`` window (a single-partition bottleneck at scale).

    ``columns`` prunes the scan to ``[id_col] + columns`` — with a
    columnar source the projection reaches the reader (ReadSchema shows
    only the requested payload columns plus ``url`` when ``id_col`` is
    derived from it).
    """
    if (table is None) == (path is None):
        raise ValueError("exactly one of table= / path= is required")
    reader = spark.read
    for key, val in (("snapshot-id", snapshot_id),
                     ("as-of-timestamp", as_of_timestamp),
                     ("branch", branch)):
        if val is not None:
            reader = reader.option(key, val)
    df = reader.table(table) if table is not None \
        else reader.format(fmt).load(path)
    if id_col not in df.columns:
        df = df.withColumn(id_col, F.xxhash64(F.col("url")))
    if columns is not None:
        df = df.select(id_col, *[c for c in columns if c != id_col])
    return df


def write_pages_spatial(pages: DataFrame, path: str, level: int = 4,
                        lon_col: str = "lon", lat_col: str = "lat",
                        fmt: str = "parquet", mode: str = "overwrite",
                        target_partitions: int | None = None) -> None:
    """Spatially-partitioned pages layout: partition directories by
    (cx, cy) web-mercator tile coordinates at ``level``, rows inside
    each partition z-order-clustered at ``level+8`` for row-group
    skipping.

    This is the 100-TB half of bbox pruning: the pipeline's F6 tile
    filter prunes COMPUTE, but against a flat layout a regional extract
    still scans the whole corpus. Against this layout,
    :func:`read_pages_spatial` turns the bbox into a (cx, cy) range
    predicate on the partition columns, so Spark's partition pruning
    drops non-intersecting directories before any IO — scan cost is
    O(region), not O(corpus). At level 4 the world is 256 partitions
    (≈ city-region granularity); raise it for denser corpora.

    Pages lacking lon/lat are geo-derived from ``doc_id`` first (the
    engine's deterministic geocode). A ``_spatial_layout.json`` sidecar
    records the level so readers need no out-of-band knowledge.
    """
    import json as _json
    import os as _os

    from tilemaker_spark.functions.coords import (lat2tiley_col,
                                                  lon2tilex_col,
                                                  zorder_key_col)
    if lon_col not in pages.columns or lat_col not in pages.columns:
        from tilemaker_spark.operators.geocode import geocode_pages
        pages = geocode_pages(pages)
    elif "doc_id" in pages.columns:
        # per-ROW fallback too: ungeocoded pages carry NULL lon/lat, and
        # greatest/least skip nulls — unguarded they'd clamp into the
        # corner cell (n-1, n-1), silently misplaced
        from tilemaker_spark.operators.geocode import derive_lat, derive_lon
        did = F.col("doc_id")
        pages = (pages
                 .withColumn(lon_col, F.coalesce(F.col(lon_col),
                                                 derive_lon(did)))
                 .withColumn(lat_col, F.coalesce(F.col(lat_col),
                                                 derive_lat(did))))
    n = 1 << level
    # null-preserving clamp: any remaining null coordinate yields NULL
    # cx/cy (the
    # visible __HIVE_DEFAULT_PARTITION__ directory), never a corner cell
    clamp = lambda c: F.when(  # noqa: E731
        c.isNull(), F.lit(None)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(n - 1), c)))
    df = (pages
          .withColumn("cx", clamp(lon2tilex_col(F.col(lon_col), level)))
          .withColumn("cy", clamp(lat2tiley_col(F.col(lat_col), level))))
    zkey = zorder_key_col(lon2tilex_col(F.col(lon_col), level + 8),
                          lat2tiley_col(F.col(lat_col), level + 8))
    # repartitionByRange over (cx, cy, zkey) — NOT repartition(cx, cy),
    # which would force every row of a cell into ONE task (a dense city
    # cell at corpus scale = one giant write task). Range partitioning
    # splits big cells across contiguous z-ordered chunks while
    # partitionBy still routes rows into per-cell directories, so a hot
    # cell gets many right-sized files and empty ranges cost nothing.
    num = target_partitions or \
        pages.sparkSession.sparkContext.defaultParallelism * 2
    (df.withColumn("_zkey", zkey)
       .repartitionByRange(num, "cx", "cy", "_zkey")
       .sortWithinPartitions("cx", "cy", "_zkey")
       .drop("_zkey")
       .write.partitionBy("cx", "cy").mode(mode).format(fmt).save(path))
    with open(_os.path.join(path, "_spatial_layout.json"), "w") as f:
        _json.dump({"level": level, "partition_cols": ["cx", "cy"]}, f)


def read_pages_spatial(spark: SparkSession, path: str,
                       bbox: tuple | None = None,
                       fmt: str = "parquet") -> DataFrame:
    """Read a :func:`write_pages_spatial` layout, partition-pruned to
    ``bbox = (minlon, minlat, maxlon, maxlat)`` when given.

    The bbox becomes a literal range predicate on the (cx, cy)
    partition columns, which Catalyst evaluates against directory
    values at planning time (PartitionFilters in the scan node) — files
    outside the intersecting cells are never opened. The result is the
    full content of every INTERSECTING cell (a superset of the exact
    bbox rows); exact trimming stays with the consumer, which the
    pipeline's own bbox gates already do.
    """
    import json as _json
    import os as _os

    from tilemaker_spark.functions.coords import lat2tiley_np, lon2tilex_np
    df = spark.read.format(fmt).load(path)
    if bbox is None:
        return df
    with open(_os.path.join(path, "_spatial_layout.json")) as f:
        level = _json.load(f)["level"]
    minlon, minlat, maxlon, maxlat = bbox
    n = 1 << level
    cl = lambda v: max(0, min(n - 1, int(v)))  # noqa: E731
    x0, x1 = cl(lon2tilex_np(minlon, level)), cl(lon2tilex_np(maxlon, level))
    # tile y grows southward: maxlat -> smallest y
    y0, y1 = cl(lat2tiley_np(maxlat, level)), cl(lat2tiley_np(minlat, level))
    return df.filter((F.col("cx") >= x0) & (F.col("cx") <= x1) &
                     (F.col("cy") >= y0) & (F.col("cy") <= y1))


# -------------------------------------- bucketed OSM node-store layout

def write_osm_bucketed(nodes: DataFrame, ways: DataFrame, path: str,
                       buckets: int = 16, suffix: str = "") -> tuple:
    """Bucketed node-resolution layout — the Spark-native analog of the
    reference's sorted_node_store / sorted_way_store
    (include/sorted_node_store.h, include/sorted_way_store.h: node
    coords sorted by id for random access during way assembly).

    Three external parquet tables registered in the session catalog:
    ``osm_nodes_b{suffix}`` (ref=node id, lon, lat) bucketed+sorted by
    ref; ``osm_way_refs_b{suffix}`` (way_id, pos, ref) — the way→node
    membership PRE-EXPLODED — bucketed+sorted by ref into the SAME
    bucket count; ``osm_ways_b{suffix}`` (way_id, tags, refs) for
    reassembly. Because both join sides share the bucket layout on
    ``ref``, :func:`resolve_ways_bucketed`'s sort-merge join runs with
    ZERO exchange on either input — the node-resolution shuffle (the
    largest in the OSM path: |way refs| ≈ 10× |ways|, nodes ≈ 10⁹ rows
    planet-scale) is paid once at layout time and amortized across
    every rebuild, config change, or regional extract that follows.
    Returns the three table names.
    """
    import os as _os
    nt, rt, wt = (f"osm_nodes_b{suffix}", f"osm_way_refs_b{suffix}",
                  f"osm_ways_b{suffix}")
    (nodes.select(F.col("id").alias("ref"), "lon", "lat")
     .write.bucketBy(buckets, "ref").sortBy("ref")
     .option("path", _os.path.join(path, "nodes"))
     .mode("overwrite").format("parquet").saveAsTable(nt))
    (ways.select(F.col("id").alias("way_id"),
                 F.posexplode("refs").alias("pos", "ref"))
     .write.bucketBy(buckets, "ref").sortBy("ref")
     .option("path", _os.path.join(path, "way_refs"))
     .mode("overwrite").format("parquet").saveAsTable(rt))
    (ways.select(F.col("id").alias("way_id"), "tags", "refs")
     .write.option("path", _os.path.join(path, "ways"))
     .mode("overwrite").format("parquet").saveAsTable(wt))
    return nt, rt, wt


def resolve_ways_bucketed(spark: SparkSession, nodes_table: str,
                          refs_table: str, ways_table: str) -> DataFrame:
    """Way→node resolution (J1) over a :func:`write_osm_bucketed`
    layout: refs ⋈ nodes is an exchange-free sort-merge join (both
    sides bucket-aligned on ref), then one groupBy(way_id) reassembles
    coordinate arrays. Output schema and missing-node semantics are
    identical to ``profile.assemble_way_geoms`` (ways referencing any
    missing node are dropped), so downstream profiles are oblivious to
    which path produced the geometry.
    """
    from tilemaker_spark.functions.coords import lat2latp_col
    refs = spark.read.table(refs_table)
    node_pos = (spark.read.table(nodes_table)
                .select("ref", F.col("lon").alias("n_lon"),
                        lat2latp_col(F.col("lat")).alias("n_latp")))
    joined = refs.join(node_pos, "ref", "left")
    agg = joined.groupBy("way_id").agg(
        F.sort_array(F.collect_list(
            F.struct("pos", "n_lon", "n_latp"))).alias("pts"),
        F.max(F.col("n_lon").isNull().cast("int")).alias("has_missing"))
    coords = F.flatten(F.transform(
        "pts", lambda p: F.array(p.n_lon, p.n_latp)))
    ways = spark.read.table(ways_table)
    return (agg.filter(F.col("has_missing") == 0)
            .join(ways, "way_id")
            .select(F.col("way_id").alias("id"), "tags", "refs",
                    coords.alias("coords")))


# ------------------------------------------------------- WARC source

WARC_SCHEMA = "url string, warc_date string, rec_type string, body binary"


def write_warc(path: str, records, gzip_members: bool = True) -> int:
    """Test-fixture WARC writer: ``records`` is an iterable of
    (url, warc_date, body: bytes); each becomes a WARC/1.0 ``resource``
    record, individually gzip-compressed when ``gzip_members`` (the
    Common Crawl layout — one gzip member per record so readers can
    seek). A ``path + '.idx'`` sidecar records (offset, length) per
    record — the cdx-index analog :func:`read_warc` uses to
    parallelize. gzip mtime is pinned to 0 (byte-stable fixtures, the
    project's compress rule). Driver-side on purpose: fixtures are
    bounded; production corpora arrive as WARC, they aren't written."""
    import gzip as _gz

    offsets = []
    with open(path, "wb") as f:
        for url, date, body in records:
            hdr = (b"WARC/1.0\r\n"
                   b"WARC-Type: resource\r\n"
                   + f"WARC-Target-URI: {url}\r\n".encode()
                   + f"WARC-Date: {date}\r\n".encode()
                   + f"Content-Length: {len(body)}\r\n\r\n".encode())
            rec = hdr + body + b"\r\n\r\n"
            if gzip_members:
                rec = _gz.compress(rec, mtime=0)
            offsets.append((f.tell(), len(rec)))
            f.write(rec)
    with open(path + ".idx", "w") as f:
        for o, n in offsets:
            f.write(f"{o}\t{n}\n")
    return len(offsets)


def _warc_scan_offsets(path: str) -> list[tuple[int, int]]:
    """No-index fallback: one sequential driver pass locating record
    boundaries (gzip members via zlib ``unused_data``, plain records
    via Content-Length). At crawl scale the sidecar/cdx index makes
    this unnecessary — Common Crawl ships offset indexes precisely so
    nobody scans a petabyte to find record starts."""
    import zlib

    offsets = []
    size = __import__("os").path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            f.seek(pos)
            magic = f.read(2)
            if magic == b"\x1f\x8b":
                f.seek(pos)
                d = zlib.decompressobj(wbits=31)
                consumed = 0
                while not d.eof:
                    chunk = f.read(1 << 16)
                    if not chunk:
                        break
                    d.decompress(chunk)
                    consumed += len(chunk)
                end = pos + consumed - len(d.unused_data)
            else:
                f.seek(pos)
                head = f.read(1 << 16)
                sep = head.index(b"\r\n\r\n")
                hdrs = dict(
                    line.split(b": ", 1)
                    for line in head[:sep].split(b"\r\n")[1:] if b": " in line)
                end = pos + sep + 4 + \
                    int(hdrs[b"Content-Length"]) + 4
            offsets.append((pos, end - pos))
            pos = end
    return offsets


def read_warc(spark: SparkSession, path: str,
              partitions: int | None = None) -> DataFrame:
    """Distributed WARC scan (the Common Crawl ingest format): records
    located via the ``.idx`` sidecar (cdx analog) — or one driver
    boundary scan when absent — then fetched and parsed in parallel
    ``mapInPandas`` tasks that seek straight to their byte ranges,
    exactly the `read_pbf` blob-parallel shape. At 100 TB the real
    parallelism axis is ALSO per-file (CC ships ~10⁵ 1 GB files);
    within a file the index keeps every task O(its own records).

    Returns (url, warc_date, rec_type, body binary).
    """
    import os as _os

    idx = path + ".idx"
    if _os.path.exists(idx):
        with open(idx) as f:
            offsets = [tuple(int(x) for x in line.split("\t"))
                       for line in f if line.strip()]
    else:
        offsets = _warc_scan_offsets(path)
    n_part = partitions or min(
        len(offsets) or 1, spark.sparkContext.defaultParallelism * 2) or 1
    off_df = spark.createDataFrame(offsets, "offset long, nbytes long") \
        .repartition(n_part)

    def parse(batches):
        import gzip as _gz

        with open(path, "rb") as f:
            for pdf in batches:
                rows = []
                for off, n in zip(pdf["offset"], pdf["nbytes"]):
                    f.seek(int(off))
                    raw = f.read(int(n))
                    if raw[:2] == b"\x1f\x8b":
                        raw = _gz.decompress(raw)
                    sep = raw.index(b"\r\n\r\n")
                    hdrs = dict(
                        line.split(b": ", 1)
                        for line in raw[:sep].split(b"\r\n")[1:]
                        if b": " in line)
                    clen = int(hdrs[b"Content-Length"])
                    rows.append((
                        hdrs.get(b"WARC-Target-URI", b"").decode(),
                        hdrs.get(b"WARC-Date", b"").decode(),
                        hdrs.get(b"WARC-Type", b"").decode(),
                        raw[sep + 4:sep + 4 + clen]))
                yield pd.DataFrame(
                    rows, columns=["url", "warc_date", "rec_type", "body"])

    return off_df.mapInPandas(parse, schema=WARC_SCHEMA)


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """Mandated pages table (doc_id, url, warc_ts, html, text, lang)
    straight from a WARC crawl file — the Common Crawl ingest chain:
    :func:`read_warc` byte ranges → HTML body → JVM-side text
    extraction. ``doc_id`` is ``xxhash64(url)`` (the
    `read_pages_table` recipe: deterministic, per-row, no shuffle);
    ``lang`` is left ``'und'`` for `text_analysis.lang_id` downstream.
    This is what the CLI runs for a ``.warc`` / ``.warc.gz`` input, so
    the tile engine points directly at a crawl file."""
    from tilemaker_spark.operators.text_analysis import (
        extract_text_from_html)

    w = read_warc(spark, path).withColumnRenamed("body", "html")
    w = extract_text_from_html(w, html_col="html") \
        .withColumnRenamed("text_extracted", "text")
    return w.select(
        F.xxhash64("url").alias("doc_id"), "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("warc_ts"),
        "html", "text", F.lit("und").alias("lang"))
