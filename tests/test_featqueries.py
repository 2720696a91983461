"""terms_set / match_bool_prefix / completion suggester / rank_feature /
distance_feature (engine/query.py, engine/aggs.py) — brute-twin oracles
over sf0.001 plus DSL dispatch identity.

Frozen semantics under test:
- terms_set (Lucene CoveringQuery): doc matches when it contains at least
  max(1, doc[minimum_should_match_field]) of the query terms; score = BM25
  sum of the matching terms.
- match_bool_prefix: leading tokens are exact should clauses, the last
  token expands df-ordered against the dictionary; one ranked OR union.
- completion suggester: dictionary terms with the prefix, weight (= df)
  desc then term asc.
- rank_feature: boost * v / (v + pivot) over a positive docvalue.
- distance_feature: boost * pivot / (pivot + |v - origin|).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.index_build import build_index
from engine.oracle import Bm25Oracle, analyze_query_py
from engine.query import (
    IndexReader,
    bm25_topk,
    match_bool_prefix_topk,
    suggest_complete,
    terms_set_topk,
)

from tests.conftest import SF001

TS_TERMS = ["hash", "join", "table", "key", "fast", "scan", "sort", "stream"]


@pytest.fixture(scope="module")
def docs_pdf():
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(SF001, "documents.parquet")).to_pandas()


@pytest.fixture(scope="module")
def feat_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("featidx") / "idx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"),
        "text", "lang", "n_chars",
        ((F.col("n_chars") % 7) + 1).cast("long").alias("weight"),
    )
    build_index(
        spark, d, out, n_shards=4, n_buckets=8,
        docvalue_cols=["lang", "n_chars", "weight"],
    )
    return out


@pytest.fixture(scope="module")
def oracle(docs_pdf):
    valid = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    return Bm25Oracle(list(zip(valid["doc_id"], valid["text"])))


def _brute_terms_set(docs_pdf, oracle: Bm25Oracle, terms, k):
    req = {
        int(r.doc_id): max(1, int(r.n_chars) % 7 + 1)
        for r in docs_pdf.itertuples()
    }
    idfs = {t: oracle.idf(t) for t in terms if oracle.df.get(t)}
    scored = []
    for i in range(oracle.n_docs):
        tf, did = oracle.tfs[i], oracle.doc_ids[i]
        hit = [t for t in idfs if t in tf]
        if len(hit) < req[int(did)]:
            continue
        dl = oracle.dls[i]
        norm = oracle.k1 * (1.0 - oracle.b + oracle.b * dl / oracle.avgdl)
        s = sum(idfs[t] * tf[t] / (tf[t] + norm) for t in hit)
        scored.append((s, did))
    scored.sort(key=lambda p: (-p[0], p[1]))
    return [(str(d), round(s, 9)) for s, d in scored[:k]]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_terms_set_vs_brute(spark, feat_index, docs_pdf, oracle, execution):
    r = IndexReader(spark, feat_index)
    got = [
        (x["url"], round(x["score"], 9))
        for x in terms_set_topk(
            r, TS_TERMS, "weight", k=15, execution=execution
        ).collect()
    ]
    assert got == _brute_terms_set(docs_pdf, oracle, TS_TERMS, 15)
    assert got, "fixture must produce matches"


def test_terms_set_guards(spark, feat_index):
    r = IndexReader(spark, feat_index)
    with pytest.raises(ValueError, match="docvalues"):
        terms_set_topk(r, TS_TERMS, "nope", k=5)
    assert terms_set_topk(r, ["zzzqqq"], "weight", k=5).count() == 0


def test_match_bool_prefix_is_or_union_over_expansion(spark, feat_index, oracle):
    r = IndexReader(spark, feat_index)
    got = [
        (x["url"], round(x["score"], 9))
        for x in match_bool_prefix_topk(r, "hash join s", k=12).collect()
    ]
    terms = list(dict.fromkeys(["hash", "join"] + oracle.expand_prefix("s")))
    want = [(str(d), round(s, 9)) for d, s in oracle.topk(terms, k=12)]
    assert got == want

    # dead prefix: the leading terms still rank alone
    got2 = [
        (x["url"], round(x["score"], 9))
        for x in match_bool_prefix_topk(r, "hash join zzzqqq", k=12).collect()
    ]
    want2 = [(str(d), round(s, 9)) for d, s in oracle.topk(["hash", "join"], k=12)]
    assert got2 == want2

    assert match_bool_prefix_topk(r, "", k=5).count() == 0


def test_suggest_complete_vs_brute(spark, feat_index, oracle):
    r = IndexReader(spark, feat_index)
    got = [
        (x["suggestion"], x["weight"])
        for x in suggest_complete(r, "s", size=8).collect()
    ]
    pairs = [(t, oracle.df[t]) for t in oracle.vocab if t.startswith("s")]
    pairs.sort(key=lambda x: (-x[1], x[0]))
    assert got == pairs[:8]
    assert suggest_complete(r, "", size=5).count() == 0
    assert suggest_complete(r, "zzzqqq", size=5).count() == 0


def _valid(docs_pdf) -> pd.DataFrame:
    return docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]


def test_rank_feature_vs_brute(spark, feat_index, docs_pdf):
    from engine.aggs import rank_feature_topk

    r = IndexReader(spark, feat_index)
    got = [
        (x["url"], round(x["score"], 9))
        for x in rank_feature_topk(r, "weight", pivot=3.0, boost=2.0, k=9).collect()
    ]
    v = _valid(docs_pdf).copy()
    v["w"] = (v["n_chars"] % 7 + 1).astype(float)
    v["score"] = 2.0 * v["w"] / (v["w"] + 3.0)
    v["url"] = v["doc_id"].astype(str)
    want = [
        (u, round(s, 9))
        for u, s in v.sort_values(["score", "url"], ascending=[False, True])[
            ["url", "score"]
        ].itertuples(index=False)
    ][:9]
    assert got == want
    with pytest.raises(ValueError, match="pivot"):
        rank_feature_topk(r, "weight", pivot=0.0)


def test_distance_feature_vs_brute(spark, feat_index, docs_pdf):
    from engine.aggs import distance_feature_topk

    r = IndexReader(spark, feat_index)
    got = [
        (x["url"], round(x["score"], 9))
        for x in distance_feature_topk(
            r, "n_chars", origin=500, pivot=120.0, boost=1.5, k=9
        ).collect()
    ]
    v = _valid(docs_pdf).copy()
    v["score"] = 1.5 * 120.0 / (120.0 + (v["n_chars"].astype(float) - 500).abs())
    v["url"] = v["doc_id"].astype(str)
    want = [
        (u, round(s, 9))
        for u, s in v.sort_values(["score", "url"], ascending=[False, True])[
            ["url", "score"]
        ].itertuples(index=False)
    ][:9]
    assert got == want
    with pytest.raises(ValueError, match="pivot"):
        distance_feature_topk(r, "n_chars", origin=0, pivot=-1.0)


def test_dsl_dispatch_feature_queries(spark, feat_index):
    from engine.dsl import search

    r = IndexReader(spark, feat_index)

    def ids(resp):
        return [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]]

    def rows(df):
        return [(x["url"], round(x["score"], 9)) for x in df.collect()]

    resp = search(r, {"query": {"terms_set": {"text": {
        "terms": TS_TERMS, "minimum_should_match_field": "weight"}}}, "size": 7})
    assert ids(resp) == rows(terms_set_topk(r, TS_TERMS, "weight", k=7))

    resp = search(r, {"query": {"match_bool_prefix": {"text": "hash join s"}},
                      "size": 7})
    assert ids(resp) == rows(match_bool_prefix_topk(r, "hash join s", k=7))

    from engine.aggs import distance_feature_topk, rank_feature_topk

    resp = search(r, {"query": {"rank_feature": {
        "field": "weight", "saturation": {"pivot": 3.0}, "boost": 2.0}}, "size": 7})
    assert ids(resp) == rows(rank_feature_topk(r, "weight", pivot=3.0, boost=2.0, k=7))

    resp = search(r, {"query": {"distance_feature": {
        "field": "n_chars", "origin": 500, "pivot": 120.0, "boost": 1.5}}, "size": 7})
    assert ids(resp) == rows(
        distance_feature_topk(r, "n_chars", origin=500, pivot=120.0, boost=1.5, k=7)
    )

    with pytest.raises(ValueError, match="pivot"):
        search(r, {"query": {"rank_feature": {"field": "weight"}}})
