"""S9 — tile HTTP server: serve z/x/y MVT tiles from an exported
tileset (MBTiles or PMTiles archive).

Reference analog: the built-in demo server (`tilemaker-server`,
/root/reference/server/server.cpp) that serves `/{z}/{x}/{y}.pbf` plus
a metadata endpoint from a generated .mbtiles. This is an EXPORT-side
convenience, not a distributed component: the engine's parallel output
is the tiles DataFrame/parquet; a single stdlib ThreadingHTTPServer in
front of the single-file archive matches the reference's role (local
preview), with zero extra dependencies.

Routes:
    /{z}/{x}/{y}.pbf   tile bytes (Content-Encoding: gzip when the
                       stored tile is gzip-compressed)
    /metadata.json     the tileset metadata (MBTiles metadata table /
                       PMTiles JSON metadata)
    /health            200 "ok"
"""

from __future__ import annotations

import gzip
import json
import sqlite3
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _MbtilesBackend:
    def __init__(self, path: str):
        self.path = path
        self._local = threading.local()

    def _con(self):
        con = getattr(self._local, "con", None)
        if con is None:
            con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
            self._local.con = con
        return con

    def tile(self, z: int, x: int, y: int) -> bytes | None:
        flipped = (1 << z) - 1 - y  # stored TMS, served XYZ
        row = self._con().execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
            "tile_column=? AND tile_row=?", (z, x, flipped)).fetchone()
        return bytes(row[0]) if row else None

    def metadata(self) -> dict:
        rows = self._con().execute(
            "SELECT name, value FROM metadata").fetchall()
        return {k: v for k, v in rows}


class _PmtilesBackend:
    """Reads the root-directory PMTiles layout written by sinks.write_pmtiles."""

    def __init__(self, path: str):
        from tilemaker_spark.sinks import _PM_MAGIC, _PM_VERSION
        with open(path, "rb") as f:
            self.buf = f.read()
        assert self.buf[:7] == _PM_MAGIC and self.buf[7] == _PM_VERSION
        (root_off, root_len, meta_off, meta_len, _lo, _ll,
         self.data_off, _dl) = struct.unpack_from("<QQQQQQQQ", self.buf, 8)
        self.meta = json.loads(
            gzip.decompress(self.buf[meta_off:meta_off + meta_len]) or b"{}")
        d = gzip.decompress(self.buf[root_off:root_off + root_len])
        self.index = {}  # tileid -> (off, len)
        pos = 0

        def rv():
            nonlocal pos
            shift = val = 0
            while True:
                b = d[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if not (b & 0x80):
                    return val
                shift += 7

        n = rv()
        tids, rls, lens, offs = [], [], [], []
        last = 0
        for _ in range(n):
            last += rv()
            tids.append(last)
        for _ in range(n):
            rls.append(rv())
        for _ in range(n):
            lens.append(rv())
        prev_off = prev_len = 0
        for i in range(n):
            v = rv()
            off = prev_off + prev_len if v == 0 else v - 1
            offs.append(off)
            prev_off, prev_len = off, lens[i]
        for tid, rl, ln, off in zip(tids, rls, lens, offs):
            for k in range(rl):
                self.index[tid + k] = (off, ln)

    def tile(self, z: int, x: int, y: int) -> bytes | None:
        from tilemaker_spark.sinks import zxy_to_tileid
        hit = self.index.get(zxy_to_tileid(z, x, y))
        if hit is None:
            return None
        off, ln = hit
        return bytes(self.buf[self.data_off + off:self.data_off + off + ln])

    def metadata(self) -> dict:
        return self.meta


def _make_handler(backend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            path = self.path.split("?", 1)[0]
            if path == "/health":
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path == "/metadata.json":
                body = json.dumps(backend.metadata()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            parts = path.strip("/").split("/")
            if len(parts) == 3 and parts[2].endswith(".pbf"):
                try:
                    z = int(parts[0])
                    x = int(parts[1])
                    y = int(parts[2][:-4])
                except ValueError:
                    self.send_error(400)
                    return
                tile = backend.tile(z, x, y)
                if tile is None:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type",
                                 "application/vnd.mapbox-vector-tile")
                if tile[:2] == b"\x1f\x8b":
                    self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(tile)))
                self.end_headers()
                self.wfile.write(tile)
                return
            self.send_error(404)

    return Handler


def serve_tiles(path: str, port: int = 0, host: str = "127.0.0.1"):
    """Start a (threaded, daemonized) tile server over an .mbtiles or
    .pmtiles archive. Returns the running HTTPServer — `.server_port`
    for the bound port, `.shutdown()` to stop."""
    backend = (_PmtilesBackend(path) if path.endswith(".pmtiles")
               else _MbtilesBackend(path))
    srv = ThreadingHTTPServer((host, port), _make_handler(backend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
