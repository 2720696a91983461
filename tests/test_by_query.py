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


def test_delete_by_query_phrase(spark, tmp_path):
    """delete_by_query matches a match_phrase query context (positional
    matcher): only docs holding the exact adjacency are tombstoned."""
    out = str(tmp_path / "idx")
    _build(spark, out, index_options="positions")
    n = delete_by_query(
        spark, out, {"query": {"match_phrase": {"text": "banana cherry"}}}
    )
    assert n == 2  # a1 ("...banana cherry"), a3 ("banana cherry...")
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["banana"], k=10).collect()}
    assert hits == {"a2"}


def test_delete_by_query_multifield(spark, tmp_path):
    """delete_by_query matches a multi_match query context over a
    two-field index: the union matched set (field-centric best_fields)
    is tombstoned; a title-only match counts."""
    out = str(tmp_path / "idx")
    rows = [(u, t, ("kiwi topic" if u == "a6" else "plain"), n)
            for u, t, n in DOCS]
    df = spark.createDataFrame(rows, "url string, text string, title string, num long")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], docvalue_cols=["num"],
    )
    n = delete_by_query(spark, out, {"query": {"multi_match": {
        "query": "apple kiwi", "fields": ["text", "title"],
    }}})
    assert n == 3  # a1, a2 (apple in text) + a6 (kiwi in title)
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["elder"], k=10).collect()}
    assert hits == {"a4", "a5"}  # a6 tombstoned via its title


def test_update_by_query_phrase(spark, tmp_path):
    """update_by_query selects via a match_phrase context and rewrites
    only the matched docs."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _build(spark, src, index_options="positions", store_source=["text"])
    update_by_query(
        spark, src,
        {"query": {"match_phrase": {"text": "banana cherry"}}},
        lambda d: d.withColumn("text", F.concat(F.col("text"), F.lit(" zzyx"))),
        out,
    )
    r = IndexReader(spark, out)
    hits = {x["url"] for x in bm25_topk(r, ["zzyx"], k=10).collect()}
    assert hits == {"a1", "a3"}


def test_update_by_query_multifield(spark, tmp_path):
    """update_by_query over a TWO-field index (round-5 lift): the merge
    re-encodes EVERY field's postings against that field's own
    post-upsert avgdl; the result is (url, score)-identical per field to
    a fresh two-field build over the updated corpus."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = [(u, t, ("kiwi topic" if u == "a6" else "plain topic"), n)
            for u, t, n in DOCS]
    df = spark.createDataFrame(
        rows, "url string, text string, title string, num long"
    )
    build_index(
        spark, df, src, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], docvalue_cols=["num"],
        store_source=["text", "title"],
    )
    update_by_query(
        spark, src,
        {"query": {"multi_match": {"query": "kiwi",
                                   "fields": ["text", "title"]}}},
        lambda d: d.withColumn(
            "title", F.concat(F.col("title"), F.lit(" zzyx"))
        ),
        out,
    )
    r = IndexReader(spark, out)
    rt = r.for_field("title")
    assert {x["url"] for x in bm25_topk(rt, ["zzyx"], k=10).collect()} == {"a6"}
    # only the matched doc was rewritten; text field untouched
    assert {x["url"] for x in bm25_topk(r, ["apple"], k=10).collect()} == {
        "a1", "a2"
    }

    # fresh-build identity: both fields score identically to a from-
    # scratch build over the post-update corpus (per-field avgdl exact)
    fresh = str(tmp_path / "fresh")
    rows2 = [(u, t, (ti + " zzyx" if u == "a6" else ti), n)
             for u, t, ti, n in rows]
    df2 = spark.createDataFrame(
        rows2, "url string, text string, title string, num long"
    )
    build_index(
        spark, df2, fresh, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], docvalue_cols=["num"],
    )
    fr = IndexReader(spark, fresh)
    ft = fr.for_field("title")
    for view_u, view_f, terms in (
        (r, fr, ["banana", "date"]),
        (rt, ft, ["topic", "kiwi", "zzyx"]),
    ):
        got = {(x["url"], round(x["score"], 9))
               for x in bm25_topk(view_u, terms, k=20).collect()}
        want = {(x["url"], round(x["score"], 9))
                for x in bm25_topk(view_f, terms, k=20).collect()}
        assert got == want, terms
