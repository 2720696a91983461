"""ES _rank_eval endpoint: precision/recall@k, MRR, (n)DCG, ERR graded
against the real dispatcher's ranked hits, verified by independent
recomputation from the same ranked lists."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from engine.dsl import rank_eval, search
from engine.index_build import build_index
from engine.query import IndexReader

from tests.conftest import SF001


@pytest.fixture(scope="module")
def re_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reidx") / "idx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"), "text", "lang",
    )
    build_index(spark, d, out, n_shards=4, n_buckets=8,
                docvalue_cols=["lang"])
    return out


def _ranked(spark, idx, query, k):
    r = IndexReader(spark, idx)
    resp = search(r, {"query": query, "size": k})
    return [h["_id"] for h in resp["hits"]["hits"]]


def test_rank_eval_precision_recall_mrr(spark, re_index):
    r = IndexReader(spark, re_index)
    q1 = {"match": {"text": "hash join"}}
    q2 = {"match": {"text": "table"}}
    r1 = _ranked(spark, re_index, q1, 5)
    r2 = _ranked(spark, re_index, q2, 5)
    assert r1 and r2
    # rate: alternate relevant(1)/irrelevant(0) down each list, plus one
    # rated doc that is NOT retrieved (exercises recall's denominator)
    ratings1 = [{"_id": i, "rating": pos % 2} for pos, i in enumerate(r1)]
    ratings1.append({"_id": "never-retrieved-doc", "rating": 1})
    ratings2 = [{"_id": i, "rating": 1} for i in r2[:2]]
    body = {
        "requests": [
            {"id": "q1", "request": {"query": q1}, "ratings": ratings1},
            {"id": "q2", "request": {"query": q2}, "ratings": ratings2},
        ],
        "metric": {"precision": {"k": 5, "relevant_rating_threshold": 1}},
    }
    resp = rank_eval(r, body)
    rel1 = sum(1 for pos in range(len(r1)) if pos % 2 == 1)
    p1 = rel1 / len(r1)
    p2 = 2 / len(r2)
    assert resp["details"]["q1"]["metric_score"] == pytest.approx(p1)
    assert resp["details"]["q2"]["metric_score"] == pytest.approx(p2)
    assert resp["metric_score"] == pytest.approx((p1 + p2) / 2)
    assert not resp["failures"]
    # unlabeled hits counted irrelevant by default; excluded when asked
    d2 = resp["details"]["q2"]
    assert len(d2["unrated_docs"]) == len(r2) - 2
    body["metric"] = {"precision": {"k": 5, "ignore_unlabeled": True}}
    resp = rank_eval(r, body)
    assert resp["details"]["q2"]["metric_score"] == pytest.approx(1.0)

    # recall@k: retrieved-relevant / all-relevant (incl. the unretrieved)
    body["metric"] = {"recall": {"k": 5}}
    resp = rank_eval(r, body)
    assert resp["details"]["q1"]["metric_score"] == pytest.approx(
        rel1 / (rel1 + 1))
    assert resp["details"]["q1"]["metric_details"]["recall"][
        "relevant_docs"] == rel1 + 1

    # MRR: first relevant is rank 2 in q1 (pos 0 rated 0), rank 1 in q2
    body["metric"] = {"mean_reciprocal_rank": {"k": 5}}
    resp = rank_eval(r, body)
    assert resp["details"]["q1"]["metric_score"] == pytest.approx(0.5)
    assert resp["details"]["q2"]["metric_score"] == pytest.approx(1.0)
    # nothing relevant -> 0, first_relevant = -1
    body2 = {
        "requests": [{"id": "q", "request": {"query": q1},
                      "ratings": [{"_id": r1[0], "rating": 0}]}],
        "metric": {"mean_reciprocal_rank": {"k": 5}},
    }
    resp = rank_eval(r, body2)
    assert resp["details"]["q"]["metric_score"] == 0.0
    assert resp["details"]["q"]["metric_details"][
        "mean_reciprocal_rank"]["first_relevant"] == -1


def test_rank_eval_dcg_err(spark, re_index):
    r = IndexReader(spark, re_index)
    q = {"match": {"text": "hash join"}}
    rk = _ranked(spark, re_index, q, 5)
    rates = {i: (3 - pos) % 4 for pos, i in enumerate(rk)}
    ratings = [{"_id": i, "rating": v} for i, v in rates.items()]
    body = {
        "requests": [{"id": "q", "request": {"query": q},
                      "ratings": ratings}],
        "metric": {"dcg": {"k": 5}},
    }
    resp = rank_eval(r, body)
    dcg = sum((2.0 ** rates[i] - 1) / math.log2(pos + 1)
              for pos, i in enumerate(rk, 1))
    assert resp["details"]["q"]["metric_score"] == pytest.approx(dcg)

    body["metric"] = {"dcg": {"k": 5, "normalize": True}}
    resp = rank_eval(r, body)
    ideal = sum((2.0 ** v - 1) / math.log2(pos + 1)
                for pos, v in enumerate(
                    sorted(rates.values(), reverse=True)[: len(rk)], 1))
    assert resp["details"]["q"]["metric_score"] == pytest.approx(dcg / ideal)

    body["metric"] = {"expected_reciprocal_rank": {
        "k": 5, "maximum_relevance": 3}}
    resp = rank_eval(r, body)
    err, p_stay = 0.0, 1.0
    for pos, i in enumerate(rk, 1):
        ri = (2.0 ** rates[i] - 1) / 2.0 ** 3
        err += p_stay * ri / pos
        p_stay *= 1 - ri
    assert resp["details"]["q"]["metric_score"] == pytest.approx(err)


def test_rank_eval_templates_k_and_failures(spark, re_index):
    r = IndexReader(spark, re_index)
    q = {"match": {"text": "table"}}
    rk = _ranked(spark, re_index, q, 3)
    body = {
        "templates": [{
            "id": "t1",
            "template": {"query": {"match": {"text": "{{qterm}}"}},
                         "size": 50},
        }],
        "requests": [
            {"id": "tq", "template_id": "t1", "params": {"qterm": "table"},
             "ratings": [{"_id": rk[0], "rating": 1}]},
            {"id": "bad", "request": {"query": {"no_such_kind": {}}},
             "ratings": []},
        ],
        "metric": {"precision": {"k": 3}},
    }
    resp = rank_eval(r, body)
    # metric k overrides the template's size: exactly 3 hits graded
    assert len(resp["details"]["tq"]["hits"]) == 3
    assert [h["hit"]["_id"] for h in resp["details"]["tq"]["hits"]] == rk
    assert resp["details"]["tq"]["metric_score"] == pytest.approx(1 / 3)
    # the bad request lands in failures, not details; average skips it
    assert "bad" in resp["failures"] and "bad" not in resp["details"]
    assert resp["metric_score"] == pytest.approx(1 / 3)
