"""Head-term skew handling (north_rule): doc-sharding IS the term salt —
a stopword appearing in EVERY doc must split across all shards so no
reducer group exceeds its shard's bound, and lineage must expose balance."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from engine import synth
from engine.index_build import build_index

N_DOCS = 2000
N_SHARDS = 8


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    # every doc gets the stopword 'ubiquitousterm' appended 3x — an extreme
    # head term (df = corpus size, cf = 3x corpus size)
    t = synth.generate_pages(N_DOCS)
    texts = [
        (x + " ubiquitousterm ubiquitousterm ubiquitousterm") if x else x
        for x in t.column("text").to_pylist()
    ]
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts, pa.string()))
    src = tmp_path_factory.mktemp("skew") / "pages.parquet"
    import pyarrow.parquet as pq

    pq.write_table(t, str(src), row_group_size=512)
    out = str(tmp_path_factory.mktemp("skewidx") / "idx")
    manifest = build_index(spark, str(src), out, n_shards=N_SHARDS, n_buckets=8)
    return out, manifest


def test_head_term_splits_across_all_shards(spark, skewed_index):
    out, manifest = skewed_index
    post = spark.read.parquet(os.path.join(out, "postings"))
    rows = post.filter(F.col("term") == "ubiquitousterm").select(
        "shard", "df_local", "cf_local"
    ).collect()
    # one posting group per shard — never a single global list
    assert len(rows) == N_SHARDS
    assert sum(r["df_local"] for r in rows) == manifest["n_docs"]
    assert sum(r["cf_local"] for r in rows) == 3 * manifest["n_docs"]
    # each shard's slice is bounded by its shard size (hash-balanced):
    # no slice exceeds 2x the mean
    mean = manifest["n_docs"] / N_SHARDS
    assert max(r["df_local"] for r in rows) < 2 * mean


def test_lineage_exposes_balanced_cells(spark, skewed_index):
    out, _ = skewed_index
    lin = spark.read.parquet(os.path.join(out, "lineage")).collect()
    sizes = [r["bytes"] for r in lin]
    assert len(sizes) == 8 * N_SHARDS  # every (bucket, shard) cell present
    # the head term must not create a dominant cell: max cell within 4x of
    # the mean (buckets hold different vocab slices, so some spread exists)
    assert max(sizes) < 4 * (sum(sizes) / len(sizes))


def test_head_term_query_correct(spark, skewed_index):
    from engine.query import IndexReader, bm25_topk

    out, manifest = skewed_index
    reader = IndexReader(spark, out)
    got = bm25_topk(reader, ["ubiquitousterm"], k=5).collect()
    assert len(got) == 5
    # df == N => idf = ln(1 + 0.5/(N+0.5)) tiny but positive; scores sane
    assert all(r["score"] > 0 for r in got)