"""ES `collapse`: best-scoring doc per docvalue group, top-k groups.
Frozen spec: selection + ranking on 6-dp rounded score with doc_id
tiebreak; null values form one group; verified against a brute-force
twin and for local/Spark execution identity."""

from __future__ import annotations

import math
import re
import shutil
import tempfile

import pytest

from engine import postings as P
from engine.aggs import collapse_topk
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk

K1, B = P.K1, P.B

CORPUS = [
    ("u01", "hash table lookup is fast", "en"),
    ("u02", "table hash reversed both terms", "en"),
    ("u03", "hash join beats sort merge join", "de"),
    ("u04", "the hash table of contents hash table", "de"),
    ("u05", "table of figures and tables", "fr"),
    ("u06", "hash only hashing things hash hash", "fr"),
    ("u07", "join the table club table table", None),
    ("u08", "gardens and rain", "en"),
    ("u09", "hash table", None),
    ("u10", "a hash a table a hash table", "en"),
    ("u11", "sort merge join with a small table", "de"),
    ("u12", "fast hash table open addressing hash table", "fr"),
]


def _tok(s):
    return re.findall(r"\w+", s.lower())


@pytest.fixture(scope="module")
def col_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string, lang string")
    out = tempfile.mkdtemp(prefix="sparkft_test_collapse_")
    build_index(spark, df, out, n_shards=3, n_buckets=4, docvalue_cols=["lang"])
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _brute_collapse(terms, k, did, mode="or"):
    toks = {u: _tok(t) for u, t, _l in CORPUS}
    lang = {u: l for u, _t, l in CORPUS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n

    def idf(t):
        df = sum(1 for v in toks.values() if t in v)
        return math.log(1 + (n - df + 0.5) / (df + 0.5)) if df else 0.0

    scored = []
    for u, v in toks.items():
        s, hits = 0.0, 0
        for t in set(terms):
            tf = v.count(t)
            if tf:
                hits += 1
                s += idf(t) * tf / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if hits and (mode == "or" or hits == len(set(terms))):
            scored.append((u, round(s, 6)))
    scored.sort(key=lambda x: (-x[1], did[x[0]]))
    seen, out = set(), []
    for u, s in scored:
        key = lang[u]  # None is one group
        if key in seen:
            continue
        seen.add(key)
        out.append((u, s, key))
    return out[:k]


def test_collapse_matches_brute(spark, col_index):
    r = IndexReader(spark, col_index)
    did = {
        x["url"]: x["doc_id"]
        for x in bm25_topk(r, ["hash", "table", "join", "gardens"], k=50).collect()
    }
    for terms, mode in ((["hash", "table"], "or"), (["hash", "table"], "and"),
                        (["join"], "or")):
        want = _brute_collapse(terms, 10, did, mode)
        got = [
            (x["url"], round(x["score"], 6), x["collapse_val"])
            for x in collapse_topk(r, terms, "lang", k=10, mode=mode).collect()
        ]
        assert got == want, (terms, mode, got, want)
        # one group per value, best-of-group semantics
        vals = [g[2] for g in got]
        assert len(vals) == len(set(vals))


def test_collapse_local_spark_identical(spark, col_index):
    r = IndexReader(spark, col_index)
    a = [
        (x["url"], round(x["score"], 9), x["collapse_val"])
        for x in collapse_topk(
            r, ["hash", "table"], "lang", k=5, execution="local"
        ).collect()
    ]
    b = [
        (x["url"], round(x["score"], 9), x["collapse_val"])
        for x in collapse_topk(
            r, ["hash", "table"], "lang", k=5, execution="spark"
        ).collect()
    ]
    assert a == b and a


def test_collapse_unknown_field_rejected(spark, col_index):
    r = IndexReader(spark, col_index)
    with pytest.raises(ValueError, match="docvalues"):
        collapse_topk(r, ["hash"], "nope", k=5)


def test_dsl_collapse_dispatch(spark, col_index):
    from engine.dsl import search

    r = IndexReader(spark, col_index)
    resp = search(
        r,
        {"query": {"match": {"text": "hash table"}},
         "collapse": {"field": "lang"}, "size": 4},
    )
    want = [
        (x["url"], round(x["score"], 9), x["collapse_val"])
        for x in collapse_topk(r, ["hash", "table"], "lang", k=4).collect()
    ]
    got = [
        (h["_id"], round(h["_score"], 9), h["fields"]["lang"][0])
        for h in resp["hits"]["hits"]
    ]
    assert got == want
