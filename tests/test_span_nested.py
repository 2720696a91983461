"""Nested span queries (round-5): span_or inside span_near (slots of
alternative terms), top-level span_or, and span_not (exclusion window),
checked against brute-force itertools oracles on both execution paths plus
DSL routing.

Frozen spec (engine/spans.py module docstring): or-clause = a slot of
alternatives; matches take pairwise-distinct positions (slots sharing an
alternative can collide — a position holds one token, so distinctness only
binds intersecting slots, which equals uniform distinctness); idf = sum of
every dictionary-live term in the tree; span_not drops matches with an
exclude occurrence inside [min_pos - pre, max_pos + post] and exclusion
never contributes to idf."""

from __future__ import annotations

import itertools
import math
import re
import shutil
import tempfile

import pytest

from engine import postings as P
from engine.index_build import build_index
from engine.query import IndexReader
from engine.spans import span_near_topk, span_not_topk, span_or_topk

K1, B = P.K1, P.B

CORPUS = [
    ("u1", "alpha beta gamma delta"),
    ("u2", "alpha gamma beta gamma delta beta"),
    ("u3", "beta beta alpha delta gamma alpha"),
    ("u4", "gamma delta alpha beta noise words here"),
    ("u5", "alpha noise beta noise gamma noise delta"),
    ("u6", "delta gamma beta alpha"),
    ("u7", "unrelated filler text with zeta eta theta"),
    ("u8", "alpha beta alpha beta alpha beta repeated pairs"),
]


def _tok(s):
    return re.findall(r"\w+", s.lower())


def _brute_span(docs, slots, slop, in_order, exclude=(), pre=0, post=0, k=10):
    toks = {u: _tok(t) for u, t in docs if t}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    idf_sum = 0.0
    for sl in slots:
        for t in sl:
            df = sum(1 for v in toks.values() if t in v)
            if df:
                idf_sum += math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    # conjunctive: every slot needs at least one live alternative
    for sl in slots:
        if not any(t in v for t in sl for v in toks.values()):
            return []
    n = len(slots)
    out = []
    for u, v in toks.items():
        occ = [[p for p, w in enumerate(v) if w in sl] for sl in slots]
        if any(not o for o in occ):
            continue
        exc = [p for p, w in enumerate(v) if w in exclude]
        tf = 0.0
        for combo in itertools.product(*occ):
            if len(set(combo)) < len(combo):
                continue
            if in_order and any(combo[i] >= combo[i + 1] for i in range(n - 1)):
                continue
            width = max(combo) - min(combo) - (n - 1)
            if width > slop:
                continue
            if any(min(combo) - pre <= e <= max(combo) + post for e in exc):
                continue
            tf += 1.0 / (1.0 + width)
        if tf > 0:
            dl = len(v)
            out.append((u, idf_sum * tf / (tf + K1 * (1 - B + B * dl / avgdl))))
    # k=10 >= the full matched set on this corpus, so comparing the whole
    # set sorted by (score, url) removes the doc_id-vs-url tie-order
    # dependence without weakening the score check
    out.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return [(u, round(s, 6)) for u, s in out[:k]]


@pytest.fixture(scope="module")
def pos_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string")
    out = tempfile.mkdtemp(prefix="sparkft_test_nested_spans_")
    build_index(spark, df, out, n_shards=2, n_buckets=4, index_options="positions")
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize(
    "slots,slop,in_order",
    [
        ([["alpha"], ["beta", "gamma"]], 0, True),
        ([["alpha"], ["beta", "gamma"]], 2, False),
        ([["alpha", "delta"], ["beta", "gamma"]], 1, True),
        ([["alpha", "beta"], ["beta", "gamma"]], 1, False),  # shared alt
        ([["alpha"], ["noise"], ["gamma", "delta"]], 3, True),
        ([["alpha", "zzz_dead"], ["beta"]], 1, True),  # dead alt dropped
    ],
)
def test_span_or_inside_near_matches_brute(spark, pos_index, slots, slop, in_order):
    r = IndexReader(spark, pos_index)
    want = _brute_span(CORPUS, slots, slop, in_order)
    for ex in ("local", "spark"):
        got = [
            (x["url"], round(x["score"], 6))
            for x in span_near_topk(
                r, slots, k=10, slop=slop, in_order=in_order, execution=ex,
            ).collect()
        ]
        assert sorted(got) == sorted(want), (slots, slop, in_order, ex, got, want)


def test_top_level_span_or_matches_brute(spark, pos_index):
    r = IndexReader(spark, pos_index)
    want = _brute_span(CORPUS, [["beta", "gamma", "theta"]], 0, False)
    got = [
        (x["url"], round(x["score"], 6))
        for x in span_or_topk(r, ["beta", "gamma", "theta"], k=10).collect()
    ]
    assert sorted(got) == sorted(want)


@pytest.mark.parametrize(
    "include,exclude,slop,in_order,pre,post",
    [
        ([["alpha"], ["beta"]], ["noise"], 2, True, 0, 0),
        ([["alpha"], ["gamma"]], ["beta"], 3, False, 0, 0),
        ([["alpha"]], ["beta"], 0, True, 1, 1),   # unit span with window
        ([["alpha"], ["beta", "gamma"]], ["delta"], 2, True, 1, 2),
        ([["alpha"], ["beta"]], ["zzz_absent"], 1, True, 0, 0),  # no-op excl
    ],
)
def test_span_not_matches_brute(spark, pos_index, include, exclude, slop,
                                in_order, pre, post):
    r = IndexReader(spark, pos_index)
    want = _brute_span(CORPUS, include, slop, in_order, exclude, pre, post)
    got = [
        (x["url"], round(x["score"], 6))
        for x in span_not_topk(
            r, include, exclude, k=10, slop=slop, in_order=in_order,
            pre=pre, post=post,
        ).collect()
    ]
    assert sorted(got) == sorted(want), (include, exclude, got, want)


def test_dsl_nested_span_routing(spark, pos_index):
    from engine.dsl import search

    r = IndexReader(spark, pos_index)
    body = {
        "query": {"span_near": {
            "clauses": [
                {"span_term": {"text": "alpha"}},
                {"span_or": {"clauses": [
                    {"span_term": {"text": "beta"}},
                    {"span_term": {"text": "gamma"}},
                ]}},
            ],
            "slop": 2, "in_order": False,
        }},
        "size": 10,
    }
    got = [(h["_id"], round(h["_score"], 6))
           for h in search(r, body)["hits"]["hits"]]
    want = _brute_span(CORPUS, [["alpha"], ["beta", "gamma"]], 2, False)
    assert sorted(got) == sorted(want)

    body_not = {
        "query": {"span_not": {
            "include": {"span_near": {
                "clauses": [
                    {"span_term": {"text": "alpha"}},
                    {"span_term": {"text": "beta"}},
                ], "slop": 2, "in_order": True,
            }},
            "exclude": {"span_term": {"text": "noise"}},
        }},
        "size": 10,
    }
    got = [(h["_id"], round(h["_score"], 6))
           for h in search(r, body_not)["hits"]["hits"]]
    want = _brute_span(CORPUS, [["alpha"], ["beta"]], 2, True, ["noise"])
    assert sorted(got) == sorted(want)
