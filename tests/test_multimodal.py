"""Multimodal plumbing: schemas, determinism, decode/resize/sample."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.make_media(spark, 60).cache()


def test_media_schema_and_counts(media):
    assert media.count() == 60
    kinds = {r.kind: r.cnt for r in
             media.groupBy("kind").agg(F.count("*").alias("cnt")).collect()}
    assert kinds == {"image": 20, "audio": 20, "video": 20}
    assert dict(media.dtypes)["payload"] == "binary"


def test_determinism(spark, media):
    a = {r.doc_id: bytes(r.payload) for r in media.collect()}
    b = {r.doc_id: bytes(r.payload)
         for r in MM.make_media(spark, 60).collect()}
    assert a == b


def test_decode_images(media):
    out = {r.doc_id: r for r in MM.decode_images(media).collect()}
    assert len(out) == 20
    r = out[0]  # doc 0: w=16, h=16
    assert (r.width, r.height) == (16, 16)
    assert 0 <= r.mean_intensity <= 255
    # cross-check one row against a local decode
    img = MM._decode_image_np(MM._fake_image(0, 16, 16))
    assert r.mean_intensity == pytest.approx(float(img.mean()))


def test_resize_roundtrip(media):
    out = MM.resize_images(media, 8, 8).collect()
    assert len(out) == 20
    for r in out:
        img = MM._decode_image_np(bytes(r.payload))
        assert img.shape == (8, 8)


def test_image_embeddings_shape(media):
    out = MM.image_embeddings(media, grid=4).collect()
    assert len(out) == 20
    assert all(len(r.embedding) == 16 for r in out)


def test_audio_stats(media):
    out = {r.doc_id: r for r in MM.audio_stats(media).collect()}
    assert len(out) == 20
    r = out[1]  # doc 1: sr=16000, n=1000+37
    assert r.sample_rate == 16000
    assert r.n_samples == 1000 + 37 % 4000
    assert r.duration_ms == pytest.approx(1000.0 * r.n_samples / 16000)
    assert r.rms > 0


def test_video_frame_sampling(media):
    out = MM.sample_video_frames(media, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame)
    # doc 2: frames = 4 + 2%12 = 6 -> sampled 0,2,4
    assert sorted(by_doc[2]) == [0, 2, 4]
    for r in out:
        img = MM._decode_image_np(bytes(r.payload))
        assert img.shape == (16, 16)
