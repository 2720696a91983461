"""ES `boosting` query: positive BM25 ranking with negative-match
demotion (score * negative_boost) — demoted docs stay in the ranking,
unlike bool must_not exclusion. Brute-force twin + path identity."""

from __future__ import annotations

import math
import re
import shutil
import tempfile

import pytest

from engine import postings as P
from engine.index_build import build_index
from engine.query import IndexReader, bm25_boosting_topk, bm25_topk

K1, B = P.K1, P.B

CORPUS = [
    ("u01", "hash table lookup is fast"),
    ("u02", "table hash reversed merge both terms"),
    ("u03", "hash join beats sort merge join"),
    ("u04", "the hash table of contents hash table"),
    ("u05", "table of figures and tables merge"),
    ("u06", "hash only hashing things hash hash"),
    ("u07", "join the table club table table"),
    ("u08", "gardens and rain"),
    ("u09", "hash table"),
    ("u10", "a hash a table a hash table merge"),
]


def _tok(s):
    return re.findall(r"\w+", s.lower())


@pytest.fixture(scope="module")
def boost_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string")
    out = tempfile.mkdtemp(prefix="sparkft_test_boosting_")
    build_index(spark, df, out, n_shards=3, n_buckets=4)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _brute(pos, neg, nb, k, did):
    toks = {u: _tok(t) for u, t in CORPUS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n

    def idf(t):
        df = sum(1 for v in toks.values() if t in v)
        return math.log(1 + (n - df + 0.5) / (df + 0.5)) if df else 0.0

    out = []
    for u, v in toks.items():
        s = 0.0
        for t in set(pos):
            tf = v.count(t)
            if tf:
                s += idf(t) * tf / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if s == 0.0:
            continue
        if any(t in v for t in neg):
            s *= nb
        out.append((u, s))
    out.sort(key=lambda x: (-round(x[1], 6), did[x[0]]))
    return [(u, round(s, 6)) for u, s in out[:k]]


def test_boosting_matches_brute(spark, boost_index):
    r = IndexReader(spark, boost_index)
    did = {
        x["url"]: x["doc_id"]
        for x in bm25_topk(r, ["hash", "table", "join"], k=50).collect()
    }
    for pos, neg, nb in (
        (["hash", "table"], ["merge"], 0.4),
        (["hash", "table"], ["merge"], 0.0),
        (["table"], ["hash", "join"], 0.7),
        (["hash"], ["zzzmissing"], 0.5),
    ):
        want = _brute(pos, neg, nb, 10, did)
        got = [
            (x["url"], round(x["score"], 6))
            for x in bm25_boosting_topk(r, pos, neg, nb, k=10).collect()
        ]
        assert got == want, (pos, neg, nb, got, want)


def test_boosting_demotes_not_excludes(spark, boost_index):
    r = IndexReader(spark, boost_index)
    plain = {x["url"] for x in bm25_topk(r, ["hash", "table"], k=20).collect()}
    boosted = {
        x["url"]
        for x in bm25_boosting_topk(
            r, ["hash", "table"], ["merge"], 0.1, k=20
        ).collect()
    }
    assert boosted == plain  # same matched set, different order


def test_boosting_paths_and_validation(spark, boost_index):
    r = IndexReader(spark, boost_index)
    a = [
        (x["url"], round(x["score"], 9))
        for x in bm25_boosting_topk(
            r, ["hash", "table"], ["merge"], 0.4, k=6, execution="local"
        ).collect()
    ]
    b = [
        (x["url"], round(x["score"], 9))
        for x in bm25_boosting_topk(
            r, ["hash", "table"], ["merge"], 0.4, k=6, execution="spark"
        ).collect()
    ]
    assert a == b and a
    with pytest.raises(ValueError, match="negative_boost"):
        bm25_boosting_topk(r, ["hash"], ["merge"], 1.5)


def test_dsl_boosting_dispatch(spark, boost_index):
    from engine.dsl import search

    r = IndexReader(spark, boost_index)
    resp = search(
        r,
        {"query": {"boosting": {
            "positive": {"match": {"text": "hash table"}},
            "negative": {"match": {"text": "merge"}},
            "negative_boost": 0.3,
        }}, "size": 5},
    )
    want = [
        (x["url"], round(x["score"], 9))
        for x in bm25_boosting_topk(
            r, ["hash", "table"], ["merge"], 0.3, k=5
        ).collect()
    ]
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == want
