"""S9 tile HTTP server over MBTiles and PMTiles exports."""

import gzip
import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.server import serve_tiles
from tilemaker_spark.sinks import write_mbtiles, write_pmtiles


@pytest.fixture(scope="module")
def tiles_df(spark):
    rows = [
        (0, 0, 0, gzip.compress(b"tile-z0", mtime=0)),
        (1, 0, 0, b"tile-z1-raw"),
        (1, 1, 1, gzip.compress(b"tile-z1-11", mtime=0)),
    ]
    return spark.createDataFrame(rows, "z int, x long, y long, tile binary")


def _get(url):
    req = urllib.request.Request(url)
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


@pytest.mark.parametrize("fmt", ["mbtiles", "pmtiles"])
def test_serve_tiles(tiles_df, tmp_path_factory, fmt):
    d = tmp_path_factory.mktemp("srv")
    path = str(d / f"t.{fmt}")
    if fmt == "mbtiles":
        write_mbtiles(tiles_df, path, metadata={"name": "t", "format": "pbf"})
    else:
        write_pmtiles(tiles_df, path, metadata={"name": "t", "format": "pbf"})
    srv = serve_tiles(path)
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        st, _, body = _get(f"{base}/health")
        assert st == 200 and body == b"ok"

        # gzip tile served with Content-Encoding (urllib auto-decodes
        # nothing; raw bytes compare against the stored blob)
        st, hdr, body = _get(f"{base}/0/0/0.pbf")
        assert st == 200
        assert hdr.get("Content-Encoding") == "gzip"
        assert gzip.decompress(body) == b"tile-z0"

        st, hdr, body = _get(f"{base}/1/0/0.pbf")
        assert st == 200 and body == b"tile-z1-raw"
        assert "Content-Encoding" not in hdr

        st, _, body = _get(f"{base}/1/1/1.pbf")
        assert gzip.decompress(body) == b"tile-z1-11"

        st, _, body = _get(f"{base}/metadata.json")
        meta = json.loads(body)
        assert meta.get("name") == "t"

        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/5/0/0.pbf")
        assert e.value.code == 404
    finally:
        srv.shutdown()
