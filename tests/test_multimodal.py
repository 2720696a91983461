"""Multimodal binary-column plumbing: schema, Arrow batch shape, byte-budget
partitioning, fake-decoder end-to-end, and the driver-gate integer
projection (feature_histogram_counts)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.multimodal import (
    chunk_frame_splitter,
    default_decoder,
    extract_features,
    fake_decoder,
    feature_histogram_counts,
    media_from_documents,
    media_repartition,
    nearest_neighbor_resizer,
    resize_images,
    sample_frames,
    synth_media,
)


def test_chunk_splitter_and_resizer_properties():
    """Property checks over random payload sizes: chunks exactly cover the
    payload in order; resized rasters always have out_w*out_h bytes."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 500), st.integers(1, 64))
    def check_split(L, n):
        p = bytes(i % 251 for i in range(L))
        chunks = chunk_frame_splitter(p, n)
        assert len(chunks) == n
        assert b"".join(chunks) == p

    @settings(max_examples=50, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 16), st.integers(1, 16))
    def check_resize(w, h, ow, oh):
        p = bytes((i * 7) % 256 for i in range(w * h))
        out = nearest_neighbor_resizer(p, w, h, ow, oh)
        assert len(out) == ow * oh

    check_split()
    check_resize()


def test_chunk_frame_splitter_spec():
    p = bytes(range(100))
    chunks = chunk_frame_splitter(p, 30)
    assert len(chunks) == 30
    assert b"".join(chunks) == p  # exact cover, no overlap
    # boundaries are floor(i*L/n)
    assert chunks[0] == p[0 : 100 // 30]


def test_sample_frames_plumbing(spark):
    media = synth_media(spark, n=30)  # 10 video rows, meta.n_frames=30
    rows = sample_frames(media, stride=5).collect()
    vids = {r["media_id"] for r in rows}
    assert len(vids) == 10
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    payloads = {r["media_id"]: r["payload"] for r in media.collect() if r["kind"] == "video"}
    for mid, frs in by_id.items():
        assert sorted(r["frame_idx"] for r in frs) == [0, 5, 10, 15, 20, 25]
        # each frame is the exact chunk of the source payload
        chunks = chunk_frame_splitter(bytes(payloads[mid]), 30)
        for r in frs:
            assert bytes(r["frame"]) == chunks[r["frame_idx"]]
            assert r["n_bytes"] == len(chunks[r["frame_idx"]])


def test_nearest_neighbor_resizer_golden():
    # 2x2 raster [[0,1],[2,3]] upsampled to 4x4 nearest-neighbor
    out = nearest_neighbor_resizer(bytes([0, 1, 2, 3]), 2, 2, 4, 4)
    assert list(out) == [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3]


def test_resize_images_null_safety(spark):
    """Rows that cannot be resized survive untouched: NULL kind is not
    dropped by the image/non-image split, and NULL meta (or NULL raster
    dims) passes the payload through instead of destroying it."""
    from engine.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"abcd", None),  # no meta -> passthrough
        (2, None, b"keep", {"mime": None, "width": None, "height": None,
                            "sample_rate": None, "n_frames": None}),  # NULL kind
        (3, "image", b"wxyz", {"mime": "image/png", "width": 2, "height": None,
                               "sample_rate": None, "n_frames": None}),  # no height
        (4, "image", b"abcd", {"mime": "image/png", "width": 2, "height": 2,
                               "sample_rate": None, "n_frames": None}),  # resizable
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, out_w=4, out_h=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert bytes(out[1]["payload"]) == b"abcd"
    assert bytes(out[2]["payload"]) == b"keep"
    assert bytes(out[3]["payload"]) == b"wxyz"
    assert len(out[4]["payload"]) == 16
    assert out[4]["meta"]["width"] == 4


def test_resize_images_plumbing(spark):
    media = synth_media(spark, n=30)
    out = resize_images(media, out_w=8, out_h=8)
    rows = out.collect()
    assert len(rows) == 30  # non-image rows pass through
    for r in rows:
        if r["kind"] == "image":
            assert len(r["payload"]) == 64
            assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
        else:
            assert r["meta"]["width"] != 8 or r["meta"]["width"] is None


def test_default_decoder_is_honest_stub():
    with pytest.raises(NotImplementedError):
        default_decoder(b"\x00\x01", "image")


def test_fake_decoder_histogram():
    payload = bytes([0x00, 0x10, 0x10, 0xFF])
    hist = fake_decoder(payload, "image")
    assert hist.shape == (16,)
    assert hist[0] == pytest.approx(0.25)
    assert hist[1] == pytest.approx(0.5)
    assert hist[15] == pytest.approx(0.25)
    assert hist.sum() == pytest.approx(1.0)


def test_extract_features_synth_media(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, decoder=fake_decoder).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        assert sum(r["feature"]) == pytest.approx(1.0, abs=1e-5)


def test_extract_features_null_payload(spark):
    pdf = pd.DataFrame(
        {"media_id": [1, 2], "kind": ["image", "audio"], "payload": [b"abc", None]}
    )
    media = spark.createDataFrame(pdf, "media_id long, kind string, payload binary")
    rows = {r["media_id"]: r for r in extract_features(media, decoder=fake_decoder).collect()}
    assert rows[1]["n_bytes"] == 3 and rows[1]["feature"] is not None
    assert rows[2]["n_bytes"] == 0 and rows[2]["feature"] is None


def test_media_repartition_byte_budget(spark):
    media = synth_media(spark, n=50)
    total = media.agg(F.sum(F.length("payload"))).collect()[0][0]
    out = media_repartition(media, target_bytes=max(1, total // 4))
    assert 4 <= out.rdd.getNumPartitions() <= 6
    assert out.count() == 50


def test_media_from_documents_histogram_counts(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["AB ab", "0123456789", None, ""]}
    )
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    media = media_from_documents(docs)
    rows = media.collect()
    # null/empty text filtered; kind round-robins by doc_id
    assert {r["media_id"] for r in rows} == {0, 1}
    assert {r["media_id"]: r["kind"] for r in rows} == {0: "image", 1: "audio"}
    assert bytes(next(r for r in rows if r["media_id"] == 0)["payload"]) == b"AB ab"

    out = feature_histogram_counts(extract_features(media, decoder=fake_decoder))
    got = {(r["media_id"], r["dim"]): r["cnt"] for r in out.collect()}
    # 'AB ab': nibbles 4,4,2,6,6 -> dim2:1, dim4:2, dim6:2
    assert got[(0, 2)] == 1 and got[(0, 4)] == 2 and got[(0, 6)] == 2
    assert got[(0, 0)] == 0
    # digits are 0x30-0x39 -> all in dim 3
    assert got[(1, 3)] == 10
    # per-media counts sum to n_bytes; 16 dims per media
    sums = (
        out.groupBy("media_id")
        .agg(F.sum("cnt").alias("s"), F.count("*").alias("n"), F.first("n_bytes").alias("b"))
        .collect()
    )
    for r in sums:
        assert r["s"] == r["b"] and r["n"] == 16


def test_feature_counts_exact_under_float32(spark):
    """cnt = round(float32(cnt/n)*n) must be exact for realistic sizes."""
    rng = np.random.default_rng(0)
    for n in (7, 100, 4096):
        counts = rng.multinomial(n, np.ones(16) / 16)
        f32 = (counts / counts.sum()).astype(np.float32)
        back = np.round(f32.astype(np.float64) * n).astype(np.int64)
        assert (back == counts).all()


def test_media_repartition_metadata_sizing(spark, tmp_path, monkeypatch):
    """Parquet-backed media frames must be sized from file metadata — no
    aggregate scan of the fat payload column before the real work."""
    from pyspark.sql import DataFrame

    p = str(tmp_path / "media.parquet")
    synth_media(spark, n=50).write.parquet(p)
    df = spark.read.parquet(p)

    def boom(self, *a, **kw):
        raise AssertionError("media_repartition scanned the payload column")

    monkeypatch.setattr(DataFrame, "agg", boom)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
    )
    out = media_repartition(df, target_bytes=max(1, total // 4))
    assert 4 <= out.rdd.getNumPartitions() <= 6
    monkeypatch.undo()
    assert out.count() == 50
