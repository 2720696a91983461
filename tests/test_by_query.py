"""delete_by_query / update_by_query (ES housekeeping calls the reference
delegates to Elasticsearch): DSL matched-set selection composed with the
tombstone writer and the replace-by-url upsert."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.deletes import delete_by_query, list_snapshots
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk
from engine.upsert import update_by_query

DOCS = [
    ("a1", "apple banana cherry", 10),
    ("a2", "apple banana", 20),
    ("a3", "banana cherry date", 30),
    ("a4", "cherry date elder", 40),
    ("a5", "date elder fig", 50),
    ("a6", "elder fig grape", 60),
]


def _build(spark, out, **kw):
    df = spark.createDataFrame(DOCS, "url string, text string, num long")
    return build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        docvalue_cols=["num"], **kw,
    )


def test_delete_by_query_match(spark, tmp_path):
    out = str(tmp_path / "idx")
    _build(spark, out)
    n = delete_by_query(spark, out, {"query": {"match": {"text": "apple"}}})
    assert n == 2  # a1, a2
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["banana"], k=10).collect()}
    assert hits == {"a3"}  # a1/a2 tombstoned
    assert list_snapshots(out)[-1]["operation"] == "delete"
    # idempotent re-delete: matched docs are already tombstone-masked in
    # the kernels, so the matched LIVE set is empty
    assert delete_by_query(spark, out, {"query": {"match": {"text": "apple"}}}) == 0


def test_delete_by_query_filter_context(spark, tmp_path):
    out = str(tmp_path / "idx")
    _build(spark, out)
    n = delete_by_query(
        spark, out,
        {"query": {"bool": {
            "must": [{"match": {"text": "cherry"}}],
            "filter": [{"range": {"num": {"gte": 35}}}],
        }}},
    )
    assert n == 1  # only a4 (cherry AND num >= 35)
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["cherry"], k=10).collect()}
    assert hits == {"a1", "a3"}


def test_delete_by_query_match_all_filter(spark, tmp_path):
    out = str(tmp_path / "idx")
    _build(spark, out)
    n = delete_by_query(
        spark, out,
        {"query": {"bool": {"must": [{"match_all": {}}],
                            "filter": [{"range": {"num": {"gte": 50}}}]}}},
    )
    assert n == 2  # a5, a6


def test_update_by_query_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _build(spark, src, store_source=["text"])
    man = update_by_query(
        spark, src, {"query": {"match": {"text": "fig"}}},
        lambda df: df.withColumn("text", F.concat(F.col("text"), F.lit(" marked"))),
        out,
    )
    assert man["n_docs"] == len(DOCS)  # replace, not grow
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["marked"], k=10).collect()}
    assert hits == {"a5", "a6"}
    # unmatched docs unchanged; stored source rewritten for matched
    src_map = r.get_source(["a1", "a5"])
    assert src_map["a1"]["text"] == "apple banana cherry"
    assert src_map["a5"]["text"] == "date elder fig marked"
    # docvalues carried through the merge
    from engine.query import mget

    got = {x["url"]: x["num"] for x in mget(r, ["a5", "a1"], fields=["num"]).collect()}
    assert got == {"a5": 50, "a1": 10}
    # source dir untouched (build-aside)
    assert os.path.exists(os.path.join(src, "MANIFEST.json"))
    r_src = IndexReader(spark, src)
    assert not bm25_topk(r_src, ["marked"], k=5).collect()


def test_update_by_query_needs_stored_text(spark, tmp_path):
    src = str(tmp_path / "src")
    _build(spark, src)  # no store_source
    with pytest.raises(ValueError, match="store_source"):
        update_by_query(
            spark, src, {"query": {"match": {"text": "fig"}}},
            lambda df: df, str(tmp_path / "out"),
        )
