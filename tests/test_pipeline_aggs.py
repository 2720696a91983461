"""rare_terms, single-metric aggs, pipeline aggs, and the filter-ish
query-context queries (constant_score / ids / exists / range / term on
docvalues) + multi_match — engine kernels and the _search DSL."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF001
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk
from engine.dsl import search


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipeidx") / "idx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"),
        "text", "lang", "source", "n_chars",
    )
    build_index(
        spark, d, out, n_shards=4, n_buckets=8,
        docvalue_cols=["lang", "source", "n_chars"],
        index_options="positions",  # multi_match type=phrase test
    )
    return out


def _buckets(resp, name="a"):
    return resp["aggregations"][name]["buckets"]


# ---------------------------------------------------------------- rare_terms

def test_rare_terms_matches_terms_filter(spark, pidx):
    """rare_terms == (untruncated terms) filtered to doc_count <= max,
    reordered doc_count asc / key asc — on both the kernel path and the
    match_all docmap path."""
    from engine.aggs import RareTermsAgg, TermsAgg, search_aggs

    r = IndexReader(spark, pidx)
    for q in (["hash", "join"], None):
        for mx in (1, 3):
            got = [
                (x["key"], x["doc_count"])
                for x in search_aggs(r, q, RareTermsAgg("source", mx)).collect()
            ]
            allb = [
                (x["key"], x["doc_count"])
                for x in search_aggs(r, q, TermsAgg("source", 10_000)).collect()
            ]
            want = sorted(
                [(k, c) for k, c in allb if c <= mx], key=lambda t: (t[1], t[0])
            )
            assert got == want, (q, mx)


def test_rare_terms_dsl(spark, pidx):
    r = IndexReader(spark, pidx)
    resp = search(
        r,
        {"query": {"match": {"text": "hash"}}, "size": 0,
         "aggs": {"a": {"rare_terms": {"field": "source",
                                       "max_doc_count": 2}}}},
    )
    assert all(b["doc_count"] <= 2 for b in _buckets(resp))
    counts = [b["doc_count"] for b in _buckets(resp)]
    assert counts == sorted(counts)


# ----------------------------------------------------------- metric aggs

def test_single_metric_aggs_match_stats(spark, pidx):
    r = IndexReader(spark, pidx)
    stats = _buckets(
        search(
            r,
            {"query": {"match": {"text": "hash"}}, "size": 0,
             "aggs": {"a": {"stats": {"field": "n_chars"}}}},
        )
    )[0]
    for kind, want in [
        ("avg", stats["v_avg"]), ("sum", stats["v_sum"]),
        ("min", stats["v_min"]), ("max", stats["v_max"]),
        ("value_count", stats["v_count"]),
    ]:
        got = _buckets(
            search(
                r,
                {"query": {"match": {"text": "hash"}}, "size": 0,
                 "aggs": {"a": {kind: {"field": "n_chars"}}}},
            )
        )
        assert got == [{"value": want}], kind


# --------------------------------------------------------- pipeline aggs

def _hist_body(sub):
    return {
        "query": {"match": {"text": "hash"}}, "size": 0,
        "aggs": {"a": {"histogram": {"field": "n_chars", "interval": 100},
                       "aggs": sub}},
    }


def test_cumulative_sum_and_derivative(spark, pidx):
    r = IndexReader(spark, pidx)
    plain = _buckets(
        search(r, {"query": {"match": {"text": "hash"}}, "size": 0,
                   "aggs": {"a": {"histogram": {"field": "n_chars",
                                                "interval": 100}}}})
    )
    got = _buckets(search(r, _hist_body(
        {"cs": {"cumulative_sum": {"buckets_path": "_count"}},
         "dv": {"derivative": {"buckets_path": "_count"}}})))
    run = 0
    for i, b in enumerate(got):
        assert b["bucket"] == plain[i]["bucket"]
        run += b["doc_count"]
        assert b["cs"] == run
        want_dv = None if i == 0 else float(
            b["doc_count"] - got[i - 1]["doc_count"]
        )
        assert b["dv"] == want_dv


def test_bucket_sort_and_script_and_selector(spark, pidx):
    r = IndexReader(spark, pidx)
    plain = _buckets(
        search(r, {"query": {"match": {"text": "hash"}}, "size": 0,
                   "aggs": {"a": {"histogram": {"field": "n_chars",
                                                "interval": 100}}}})
    )
    top2 = _buckets(search(r, _hist_body(
        {"bs": {"bucket_sort": {"sort": [{"doc_count": {"order": "desc"}}],
                                "size": 2}}})))
    want = sorted(plain, key=lambda b: -b["doc_count"])[:2]
    assert [(b["bucket"], b["doc_count"]) for b in top2] == [
        (b["bucket"], b["doc_count"]) for b in want
    ]
    scripted = _buckets(search(r, _hist_body(
        {"double_cnt": {"bucket_script": {
            "buckets_path": {"c": "_count"},
            "script": "params.c * 2"}}})))
    assert all(b["double_cnt"] == b["doc_count"] * 2 for b in scripted)
    kept = _buckets(search(r, _hist_body(
        {"sel": {"bucket_selector": {
            "buckets_path": {"c": "_count"},
            "script": "params.c >= 5"}}})))
    assert [(b["bucket"], b["doc_count"]) for b in kept] == [
        (b["bucket"], b["doc_count"]) for b in plain if b["doc_count"] >= 5
    ]


def test_sibling_bucket_aggs(spark, pidx):
    r = IndexReader(spark, pidx)
    body = {
        "query": {"match": {"text": "hash"}}, "size": 0,
        "aggs": {
            "h": {"histogram": {"field": "n_chars", "interval": 100}},
            "m": {"max_bucket": {"buckets_path": "h>_count"}},
            "s": {"stats_bucket": {"buckets_path": "h>_count"}},
        },
    }
    resp = search(r, body)
    counts = [b["doc_count"] for b in _buckets(resp, "h")]
    assert _buckets(resp, "m") == [{"value": float(max(counts))}]
    st = _buckets(resp, "s")[0]
    assert st["count"] == len(counts)
    assert st["sum"] == float(sum(counts))
    assert st["min"] == float(min(counts))
    assert st["max"] == float(max(counts))


def test_sequential_pipeline_requires_histogram_parent(spark, pidx):
    r = IndexReader(spark, pidx)
    with pytest.raises(ValueError, match="histogram-family parent"):
        search(r, {"query": {"match": {"text": "hash"}}, "size": 0,
                   "aggs": {"a": {"terms": {"field": "lang"},
                                  "aggs": {"cs": {"cumulative_sum": {
                                      "buckets_path": "_count"}}}}}})


# ------------------------------------------------- filter-ish query context

def test_constant_score_and_bare_filter_queries(spark, pidx):
    from engine.aggs import live_docmap

    r = IndexReader(spark, pidx)
    want_urls = [
        x["url"]
        for x in live_docmap(r)
        .filter(F.col("lang") == "de")
        .select("url").orderBy("url").limit(5).collect()
    ]
    resp = search(r, {"query": {"constant_score": {
        "filter": {"term": {"lang": "de"}}, "boost": 1.5}}, "size": 5})
    assert [h["_id"] for h in resp["hits"]["hits"]] == want_urls
    assert all(h["_score"] == 1.5 for h in resp["hits"]["hits"])
    # bare term-on-docvalue == constant_score boost 1
    resp2 = search(r, {"query": {"term": {"lang": "de"}}, "size": 5})
    assert [h["_id"] for h in resp2["hits"]["hits"]] == want_urls
    assert all(h["_score"] == 1.0 for h in resp2["hits"]["hits"])
    # bare range
    resp3 = search(r, {"query": {"range": {"n_chars": {"gte": 300,
                                                       "lt": 400}}},
                       "size": 5})
    got = resp3["hits"]["hits"]
    want3 = [
        x["url"]
        for x in live_docmap(r)
        .filter((F.col("n_chars") >= 300) & (F.col("n_chars") < 400))
        .select("url").orderBy("url").limit(5).collect()
    ]
    assert [h["_id"] for h in got] == want3


def test_ids_query(spark, pidx):
    r = IndexReader(spark, pidx)
    resp = search(r, {"query": {"ids": {"values": ["7", "11", "42",
                                                   "nonexistent"]}}})
    assert [h["_id"] for h in resp["hits"]["hits"]] == ["11", "42", "7"]
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])


def test_multi_match_degenerates_to_match(spark, pidx):
    r = IndexReader(spark, pidx)
    for typ in ("best_fields", "most_fields", "cross_fields"):
        resp = search(r, {"query": {"multi_match": {
            "query": "hash join", "fields": ["text"], "type": typ}},
            "size": 7})
        want = [
            (x["url"], round(x["score"], 9))
            for x in bm25_topk(r, ["hash", "join"], k=7).collect()
        ]
        got = [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]]
        assert got == want, typ
    # phrase type == match_phrase
    from engine.query import match_phrase_topk

    resp = search(r, {"query": {"multi_match": {
        "query": "hash join", "fields": ["text"], "type": "phrase"}},
        "size": 5})
    want = [
        (x["url"], round(x["score"], 9))
        for x in match_phrase_topk(r, "hash join", k=5).collect()
    ]
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == want
