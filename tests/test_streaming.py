"""Streaming ingest + segment merge: the merged index must answer queries
identically (per url) to a one-shot batch build over the same corpus."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from engine import synth
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk
from engine.streaming import merge_segments, stream_ingest

N_DOCS = 1200
N_FILES = 3


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_src")
    t = synth.generate_pages(N_DOCS)
    step = N_DOCS // N_FILES
    for i in range(N_FILES):
        pq.write_table(
            t.slice(i * step, step if i < N_FILES - 1 else N_DOCS - i * step),
            str(root / f"part-{i:03d}.parquet"),
        )
    return str(root)


def test_stream_ingest_then_merge_matches_batch(spark, split_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_idx") / "idx")
    q = stream_ingest(spark, split_corpus, out, n_shards=4, n_buckets=8)
    q.awaitTermination(300)
    assert not q.isActive

    seg_root = os.path.join(out, "segments")
    segs = [d for d in os.listdir(seg_root) if d.startswith("seg=")]
    assert len(segs) == N_FILES  # maxFilesPerTrigger=1 -> one segment per file

    # ST1 telemetry: one progress-row set per committed segment
    m = spark.read.parquet(os.path.join(out, "metrics"))
    seg_jobs = {
        r["job_id"]
        for r in m.filter(m.metric == "stage:segment:docs").select("job_id").collect()
    }
    assert seg_jobs == {f"seg-{i}" for i in range(N_FILES)}
    assert m.filter(m.metric == "stage:segment:docs_per_sec").count() == N_FILES

    manifest = merge_segments(spark, out, n_shards=4, n_buckets=8)

    batch_out = str(tmp_path_factory.mktemp("batch_idx") / "idx")
    batch_manifest = build_index(
        spark, spark.read.parquet(split_corpus), batch_out, n_shards=4, n_buckets=8
    )
    assert manifest["n_docs"] == batch_manifest["n_docs"]
    assert manifest["avgdl"] == pytest.approx(batch_manifest["avgdl"], rel=1e-12)

    merged = IndexReader(spark, out)
    batch = IndexReader(spark, batch_out)
    for fq in synth.frozen_queries()[:8]:
        mode = synth.MODE_BY_KIND[fq["kind"]]
        a = bm25_topk(merged, fq["terms"], k=10, mode=mode).collect()
        b = bm25_topk(batch, fq["terms"], k=10, mode=mode).collect()
        # urls + scores identical; doc ids may differ only in assignment
        assert [(r["url"], round(r["score"], 9)) for r in a] == [
            (r["url"], round(r["score"], 9)) for r in b
        ], fq


def test_stream_ingest_idempotent_redelivery(spark, split_corpus, tmp_path_factory):
    """foreachBatch may redeliver a batch after a crash — same seg_id must
    be a no-op (state file is the commit point)."""
    from engine.streaming import _read_state, ingest_batch

    out = str(tmp_path_factory.mktemp("stream_idx2") / "idx")
    batch = spark.read.parquet(split_corpus)
    s1 = ingest_batch(spark, batch, out, seg_id=0, n_shards=4, n_buckets=8)
    n1 = s1["n_docs"]
    s2 = ingest_batch(spark, batch, out, seg_id=0, n_shards=4, n_buckets=8)
    assert s2["n_docs"] == n1
    assert len(_read_state(out, 4)["segments"]) == 1


def test_stream_percolate_matches_batch(spark, split_corpus, tmp_path_factory):
    """Streaming percolator over micro-batched docs == batch percolate
    over the full corpus (stateless operator, alert rows append)."""
    import pyarrow.parquet as pq

    from engine.query import percolate
    from engine.streaming import stream_percolate

    src = split_corpus
    out = str(tmp_path_factory.mktemp("perc") / "run")
    queries = spark.createDataFrame(
        [("alert_or", ["if", "line"], "or"), ("alert_and", ["if", "line"], "and")],
        "query_id string, terms array<string>, mode string",
    )
    q = stream_percolate(spark, src, queries, out)
    q.awaitTermination(180)
    got = {
        (r["query_id"], r["doc_id"]): r["hits"]
        for r in spark.read.parquet(os.path.join(out, "alerts")).collect()
    }
    docs = spark.read.parquet(src).selectExpr("url as doc_id", "text")
    want = {
        (r["query_id"], r["doc_id"]): r["hits"]
        for r in percolate(queries, docs).collect()
    }
    assert got == want and got
