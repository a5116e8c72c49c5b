"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over mapInPandas.

Training-data-pipeline extension (no reference analog). Real-image
codecs (PIL/ffmpeg) are not in this container, so payloads use a
deterministic FAKE container format (seeded, byte-stable) and the
decoders parse it with numpy — the Spark-side plumbing (schemas,
partitioning, UDF signatures, Arrow batch shapes) is exactly what a
real deployment would use; only the innermost parse would swap for
PIL.Image.open / soundfile.read. If PIL is importable it is used for
real PNG payloads transparently (import-gated).

Fake formats (all little-endian):
  image: b'FIMG' u16 width u16 height | width*height u8 gray pixels
  audio: b'FAUD' u32 sample_rate u32 n_samples | n_samples i16 PCM
  video: b'FVID' u16 width u16 height u16 n_frames | frames of
         width*height u8, concatenated
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MEDIA_SCHEMA = ("doc_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "n_frames:int, format:string>")


# ----------------------------------------------------------- fixtures

def _fake_image(seed: int, w: int, h: int) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h, dtype=np.uint8)
    return b"FIMG" + struct.pack("<HH", w, h) + px.tobytes()


def _fake_image_linear(seed: int, w: int, h: int) -> bytes:
    """Arithmetic pixel ramp — pixel j = (seed*31 + j*7) % 256. Same
    container as _fake_image but reproducible in ANSI SQL, so pipelines
    built on it (decode -> embed -> knn) can be oracle-checked
    end-to-end in DuckDB rather than rows-only."""
    idx = np.arange(w * h, dtype=np.int64)
    px = ((seed * 31 + idx * 7) % 256).astype(np.uint8)
    return b"FIMG" + struct.pack("<HH", w, h) + px.tobytes()


def _fake_audio(seed: int, sr: int, n: int) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = (np.sin(np.arange(n) * (seed % 7 + 1) * 0.01) * 8000
           + rng.integers(-100, 100, size=n)).astype(np.int16)
    return b"FAUD" + struct.pack("<II", sr, n) + pcm.tobytes()


def _fake_video(seed: int, w: int, h: int, frames: int) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8)
    return b"FVID" + struct.pack("<HHH", w, h, frames) + px.tobytes()


def make_media(spark: SparkSession, n: int = 300,
               linear_px: bool = False) -> DataFrame:
    """Deterministic media table, generated distributed (mapInPandas over
    spark.range — no driver materialization). linear_px=True swaps the
    RNG image pixels for the SQL-expressible arithmetic ramp (audio and
    video payloads are unaffected)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                if kind == "image":
                    w, h = 16 + did % 48, 16 + (did * 7) % 48
                    mk = _fake_image_linear if linear_px else _fake_image
                    rows.append((did, kind, mk(did, w, h),
                                 (w, h, None, None, "fimg")))
                elif kind == "audio":
                    sr, ns = 16000, 1000 + (did * 37) % 4000
                    rows.append((did, kind, _fake_audio(did, sr, ns),
                                 (None, None, sr, None, "faud")))
                else:
                    w, h, fr = 16, 16, 4 + did % 12
                    rows.append((did, kind, _fake_video(did, w, h, fr),
                                 (w, h, None, fr, "fvid")))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "payload",
                                              "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------ decoders

def _decode_image_np(payload: bytes) -> np.ndarray:
    if payload[:4] == b"FIMG":
        w, h = struct.unpack_from("<HH", payload, 4)
        return np.frombuffer(payload, dtype=np.uint8,
                             offset=8).reshape(h, w)
    try:  # real codec path, import-gated (not in this container)
        from io import BytesIO

        from PIL import Image
        return np.asarray(Image.open(BytesIO(payload)).convert("L"))
    except ImportError as e:
        raise NotImplementedError(
            "real image codecs unavailable; payload is not FIMG") from e


def decode_images(media: DataFrame) -> DataFrame:
    """image rows -> (doc_id, width, height, mean_intensity, std_intensity).

    mapInPandas: one Arrow batch in, one out; numpy decode per row (the
    payloads are ragged), no per-row Python at the API level.
    """

    def run(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_image_np(bytes(payload))
                rows.append((int(did), img.shape[1], img.shape[0],
                             float(img.mean()), float(img.std())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "mean_intensity",
                                              "std_intensity"])

    return (media.filter(F.col("kind") == "image")
            .select("doc_id", "payload")
            .mapInPandas(run, schema="doc_id long, width int, height int, "
                                     "mean_intensity double, "
                                     "std_intensity double"))


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); returns the resized
    payload re-encoded in the same container format."""

    def run(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_image_np(bytes(payload))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[np.ix_(ys, xs)]
                blob = (b"FIMG" + struct.pack("<HH", out_w, out_h)
                        + small.astype(np.uint8).tobytes())
                rows.append((int(did), blob))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return (media.filter(F.col("kind") == "image")
            .select("doc_id", "payload")
            .mapInPandas(run, schema="doc_id long, payload binary"))


def image_embeddings(media: DataFrame, grid: int = 4,
                     dtype: str = "float") -> DataFrame:
    """Feature extraction: grid x grid mean-pooled intensity vector
    (array<float> by default) — joins the similarity-search operators
    downstream. dtype="double" pools in float64 (exact integer sums, so
    the values are bit-reproducible by a SQL AVG over the same pixels —
    the oracle path for linear_px media)."""
    np_dtype = np.float64 if dtype == "double" else np.float32

    def run(batches):
        for pdf in batches:
            ids, vecs = [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_image_np(bytes(payload)).astype(np_dtype)
                h, w = img.shape
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                feat = [float(img[i * gh:(i + 1) * gh,
                                  j * gw:(j + 1) * gw].mean())
                        for i in range(grid) for j in range(grid)]
                ids.append(int(did))
                vecs.append(feat)
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return (media.filter(F.col("kind") == "image")
            .select("doc_id", "payload")
            .mapInPandas(run, schema=f"doc_id long, embedding array<{dtype}>"))


def audio_stats(media: DataFrame) -> DataFrame:
    """audio rows -> (doc_id, sample_rate, n_samples, duration_ms, rms)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"FAUD":
                    raise NotImplementedError("real audio codecs unavailable")
                sr, n = struct.unpack_from("<II", b, 4)
                pcm = np.frombuffer(b, dtype=np.int16, offset=12)
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                rows.append((int(did), sr, n, 1000.0 * n / sr, rms))
            yield pd.DataFrame(rows, columns=["doc_id", "sample_rate",
                                              "n_samples", "duration_ms",
                                              "rms"])

    return (media.filter(F.col("kind") == "audio")
            .select("doc_id", "payload")
            .mapInPandas(run, schema="doc_id long, sample_rate int, "
                                     "n_samples long, duration_ms double, "
                                     "rms double"))


def sample_video_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: every k-th frame re-emitted as an image row —
    one input row explodes to ceil(n_frames/k) rows."""

    def run(batches):
        for pdf in batches:
            ids, fids, blobs = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"FVID":
                    raise NotImplementedError("real video codecs unavailable")
                w, h, frames = struct.unpack_from("<HHH", b, 4)
                px = np.frombuffer(b, dtype=np.uint8,
                                   offset=10).reshape(frames, h, w)
                for fi in range(0, frames, every):
                    blob = (b"FIMG" + struct.pack("<HH", w, h)
                            + px[fi].tobytes())
                    ids.append(int(did))
                    fids.append(fi)
                    blobs.append(blob)
            yield pd.DataFrame({"doc_id": ids, "frame": fids,
                                "payload": blobs})

    return (media.filter(F.col("kind") == "video")
            .select("doc_id", "payload")
            .mapInPandas(run, schema="doc_id long, frame int, payload binary"))
