"""ES `rescore` (phrase rescorer, score_mode=total) over the positional
index: blend a match_phrase precision score into the top-window of a cheap
recall query. Frozen spec on engine/query.py rescore_topk: GLOBAL window
selected by 6-dp rounded base score with doc_id tiebreak; window docs the
phrase does not match keep query_weight * base; docs outside the window are
never re-ranked or returned.

Reference parity: the ES _search `rescore` block (window_size,
query_weight, rescore_query_weight) — the standard two-phase ranking a
reference-index user runs for phrase-precision on top of BM25 recall.
"""

from __future__ import annotations

import math
import re
import shutil
import tempfile

import pytest

from engine import postings as P
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk, match_phrase_topk, rescore_topk

K1, B = P.K1, P.B

CORPUS = [
    ("u01", "hash table lookup is fast and the hash table wins"),
    ("u02", "table hash reversed so no phrase here but both terms"),
    ("u03", "hash join beats sort merge join on a good hash function"),
    ("u04", "the hash table of contents lists every hash table chapter"),
    ("u05", "table of figures and a table of tables no hashing"),
    ("u06", "hash only document about hashing things with hash hash"),
    ("u07", "join the table club table table table"),
    ("u08", "completely unrelated text about gardens and rain"),
    ("u09", "hash table"),
    ("u10", "a hash a table a hash table a perfect pair"),
    ("u11", "sort merge join explained with a small table example"),
    ("u12", "fast hash table implementations use open addressing hash table"),
]


def _tok(s: str) -> list[str]:
    return re.findall(r"\w+", s.lower())


def _brute_rescore(
    docs, base_terms, phrase, k, window_size, qw, rw, did, mode="or"
) -> list[tuple[str, float]]:
    """`did` maps url -> the index's doc_id (the engine's tiebreak key for
    both the window cut and the final ranking)."""
    toks = {u: _tok(t) for u, t in docs if t}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n

    def idf(t):
        df = sum(1 for v in toks.values() if t in v)
        return math.log(1 + (n - df + 0.5) / (df + 0.5)) if df else 0.0

    base = []
    for u, v in toks.items():
        dl = len(v)
        s, hits = 0.0, 0
        for t in set(base_terms):
            tf = v.count(t)
            if tf:
                hits += 1
                s += idf(t) * tf / (tf + K1 * (1 - B + B * dl / avgdl))
        if hits and (mode == "or" or hits == len(set(base_terms))):
            base.append((u, s))
    base.sort(key=lambda x: (-round(x[1], 6), did[x[0]]))
    window = base[:window_size]
    idf_sum = sum(idf(t) for t in phrase)
    m = len(phrase)
    out = []
    for u, s in window:
        v = toks[u]
        pf = sum(1 for i in range(len(v) - m + 1) if v[i : i + m] == phrase)
        ph = idf_sum * pf / (pf + K1 * (1 - B + B * len(v) / avgdl)) if pf else 0.0
        out.append((u, qw * s + rw * ph))
    out.sort(key=lambda x: (-round(x[1], 6), did[x[0]]))
    return [(u, round(s, 6)) for u, s in out[:k]]


@pytest.fixture(scope="module")
def res_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string")
    out = tempfile.mkdtemp(prefix="sparkft_test_rescore_")
    build_index(spark, df, out, n_shards=2, n_buckets=4, index_options="positions")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_rescore_matches_brute(spark, res_index):
    r = IndexReader(spark, res_index)
    did = {
        x["url"]: x["doc_id"]
        for x in bm25_topk(r, ["hash", "table"], k=50).collect()
    }
    for window, qw, rw in ((50, 1.0, 1.0), (5, 0.7, 1.5), (3, 1.0, 2.0)):
        kk = min(10, window)
        want = _brute_rescore(
            CORPUS, ["hash", "table"], ["hash", "table"], kk, window, qw, rw, did
        )
        got = [
            (x["url"], round(x["score"], 6))
            for x in rescore_topk(
                r, ["hash", "table"], ["hash", "table"], k=kk,
                window_size=window, query_weight=qw, rescore_weight=rw,
            ).collect()
        ]
        assert got == want, (window, qw, rw, got, want)


def test_rescore_window_excludes_tail(spark, res_index):
    """A doc outside the window is never returned even if its blended
    score would beat a window doc's (ES: rescore only re-ranks the
    window)."""
    r = IndexReader(spark, res_index)
    base = {x["url"] for x in bm25_topk(r, ["hash", "table"], k=3).collect()}
    got = {
        x["url"]
        for x in rescore_topk(
            r, ["hash", "table"], ["hash", "table"], k=3, window_size=3,
            rescore_weight=100.0,
        ).collect()
    }
    assert got <= base


def test_rescore_absent_phrase_is_pure_base(spark, res_index):
    r = IndexReader(spark, res_index)
    base = [
        (x["url"], round(x["score"], 6))
        for x in bm25_topk(r, ["hash", "table"], k=10).collect()
    ]
    got = [
        (x["url"], round(x["score"], 6))
        for x in rescore_topk(
            r, ["hash", "table"], ["nonexistent", "phrase"], k=10
        ).collect()
    ]
    assert got == base  # bm25_topk order IS (score desc, doc_id asc)


def test_rescore_sloppy_phrase(spark, res_index):
    """slop>0 rescoring uses the sloppy kernel: 'table hash' at slop=2
    also credits the swapped 'hash table' occurrences — blended scores
    must match the sloppy phrase engine exactly on window docs."""
    r = IndexReader(spark, res_index)
    ph = {
        x["url"]: x["score"]
        for x in match_phrase_topk(r, "table hash", k=50, slop=2).collect()
    }
    rows = bm25_topk(r, ["hash", "table"], k=50).collect()
    did = {x["url"]: x["doc_id"] for x in rows}
    want = sorted(
        ((x["url"], x["score"] + ph.get(x["url"], 0.0)) for x in rows),
        key=lambda t: (-round(t[1], 6), did[t[0]]),
    )[:10]
    got = rescore_topk(
        r, ["hash", "table"], "table hash", k=10, window_size=50, slop=2
    ).collect()
    assert [(x["url"], round(x["score"], 6)) for x in got] == [
        (u, round(s, 6)) for u, s in want
    ]


def test_rescore_k_beyond_window_rejected(spark, res_index):
    r = IndexReader(spark, res_index)
    with pytest.raises(ValueError, match="window_size"):
        rescore_topk(r, ["hash"], ["hash", "table"], k=20, window_size=10)


def test_dsl_rescore_dispatch_identity(spark, res_index):
    """The _search `rescore` block returns exactly rescore_topk's ranking
    (dispatch identity — the DSL computes nothing itself)."""
    from engine.dsl import search

    r = IndexReader(spark, res_index)
    body = {
        "query": {"match": {"text": "hash table"}},
        "rescore": {
            "window_size": 5,
            "query": {
                "rescore_query": {"match_phrase": {"text": {"query": "hash table"}}},
                "query_weight": 0.7,
                "rescore_query_weight": 1.5,
            },
        },
        "size": 4,
    }
    resp = search(r, body)
    want = [
        (x["url"], round(x["score"], 9))
        for x in rescore_topk(
            r, ["hash", "table"], "hash table", k=4, window_size=5,
            query_weight=0.7, rescore_weight=1.5,
        ).collect()
    ]
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == want
    # a list-shaped rescore (ES accepts a list) dispatches the same
    body["rescore"] = [body["rescore"]]
    resp2 = search(r, body)
    assert resp2["hits"]["hits"] == resp["hits"]["hits"]
