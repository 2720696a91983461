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


def test_positional_stream_ingest_merge_serves_phrases(spark, tmp_path_factory):
    """Positional segments (ingest_batch index_options='positions') merge
    into a positional index whose match_phrase results are score-identical
    to a one-shot positional batch build over the union corpus; mixing
    index_options within one stream is rejected."""
    import pytest

    from engine.index_build import build_index
    from engine.query import IndexReader, match_phrase_topk
    from engine.streaming import ingest_batch, merge_segments

    docs = [
        ("s1", "quick brown fox jumps high"),
        ("s2", "brown fox quick reversed text"),
        ("s3", "the quick brown fox again quick brown fox"),
        ("s4", "no animals in this one"),
        ("s5", "quick brown fox tail content words"),
        ("s6", "fox quick brown shuffled every time"),
    ]
    work = tmp_path_factory.mktemp("posstream")
    out = str(work / "stream")
    df = spark.createDataFrame(docs, "url string, text string")
    ingest_batch(spark, df.filter("url <= 's3'"), out, seg_id=0,
                 n_shards=2, n_buckets=4, index_options="positions")
    ingest_batch(spark, df.filter("url > 's3'"), out, seg_id=1,
                 n_shards=2, n_buckets=4, index_options="positions")
    with pytest.raises(ValueError, match="index_options"):
        ingest_batch(spark, df.limit(1), out, seg_id=2,
                     n_shards=2, n_buckets=4)  # freqs into a positional stream
    m = merge_segments(spark, out, n_shards=2, n_buckets=4)
    assert m["index_options"] == "positions"

    batch_idx = str(work / "batch")
    build_index(spark, df, batch_idx, n_shards=2, n_buckets=4,
                index_options="positions")
    for phrase in ("quick brown fox", "brown fox", "fox quick"):
        a = [
            (x["url"], round(x["score"], 9))
            for x in match_phrase_topk(IndexReader(spark, out), phrase, k=10).collect()
        ]
        b = [
            (x["url"], round(x["score"], 9))
            for x in match_phrase_topk(
                IndexReader(spark, batch_idx), phrase, k=10
            ).collect()
        ]
        assert sorted(a, key=lambda t: (-t[1], t[0])) == sorted(
            b, key=lambda t: (-t[1], t[0])
        ), (phrase, a, b)
