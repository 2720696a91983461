"""Property law for the multi-field query-string evaluators: for ANY
query the grammar accepts, collapsing to ONE unboosted field must
reproduce the frozen single-field kernel exactly (ranks and scores).
Hypothesis drives random grammar strings over a fixed two-field corpus;
the single-field kernels are independently tested, so this pins the
multi-field evaluators' clause algebra to them."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from engine.index_build import build_index
from engine.query import IndexReader
from engine.querystring import (
    qs_multifield_topk,
    query_string_topk,
    simple_query_string_topk,
    sqs_multifield_topk,
)

WORDS = ["alpha", "beta", "gamma", "delta", "red", "green", "blue"]

ROWS = [
    ("d1", "alpha beta gamma delta alpha", "red green blue alpha"),
    ("d2", "beta alpha delta", "green blue green alpha"),
    ("d3", "alpha beta beta gamma", "alpha beta red"),
    ("d4", "gamma delta delta", "red red green alpha beta"),
    ("d5", "alpha beta", "blue alpha beta green"),
    ("d6", "delta gamma alpha", "alpha green red blue"),
    ("d7", "beta beta gamma red", "green gamma delta"),
    ("d8", "delta alpha red green", "beta blue gamma"),
]


@pytest.fixture(scope="module")
def prop_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "url string, text string, title string"
    )
    out = str(tmp_path_factory.mktemp("qsp") / "idx")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], index_options="positions",
    )
    return out


def _rows(df):
    return [(r["url"], round(r["score"], 9)) for r in df.collect()]


# sqs grammar: tokens are plain terms, -negations, "phrases", prefixes
_sqs_tok = st.one_of(
    st.sampled_from(WORDS),
    st.sampled_from(WORDS).map(lambda w: f"-{w}"),
    st.sampled_from(WORDS).map(lambda w: f"{w[:2]}*"),
    st.tuples(st.sampled_from(WORDS), st.sampled_from(WORDS)).map(
        lambda p: f'"{p[0]} {p[1]}"'
    ),
)
_sqs_query = st.lists(_sqs_tok, min_size=1, max_size=4).map(" ".join)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=_sqs_query, op=st.sampled_from(["or", "and"]))
def test_sqs_single_field_collapse_law(spark, prop_index, q, op):
    r = IndexReader(spark, prop_index)
    try:
        want = _rows(simple_query_string_topk(
            r, q, k=10, default_operator=op))
    except ValueError:
        # e.g. pure negation: the multi-field path must raise too
        with pytest.raises(ValueError):
            sqs_multifield_topk(r, q, ["text"], k=10, default_operator=op)
        return
    got = _rows(sqs_multifield_topk(
        r, q, ["text"], k=10, default_operator=op))
    assert got == want, (q, op)


# query_string grammar: AND/OR/NOT, grouping, phrases, prefixes
_qs_leaf = st.one_of(
    st.sampled_from(WORDS),
    st.sampled_from(WORDS).map(lambda w: f"{w[:2]}*"),
    st.tuples(st.sampled_from(WORDS), st.sampled_from(WORDS)).map(
        lambda p: f'"{p[0]} {p[1]}"'
    ),
)


@st.composite
def _qs_query(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for i in range(n):
        leaf = draw(_qs_leaf)
        if draw(st.booleans()) and i > 0:
            parts.append(draw(st.sampled_from(["AND", "OR"])))
        elif i > 0:
            parts.append("")
        if draw(st.integers(0, 4)) == 0:
            leaf = f"NOT {leaf}"
        parts.append(leaf)
    s = " ".join(p for p in parts if p)
    if draw(st.booleans()):
        s = f"({s}) OR {draw(st.sampled_from(WORDS))}"
    return s


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=_qs_query(), op=st.sampled_from(["or", "and"]),
       tb=st.sampled_from([0.0, 0.4]))
def test_qs_single_field_collapse_law(spark, prop_index, q, op, tb):
    r = IndexReader(spark, prop_index)
    try:
        want = _rows(query_string_topk(r, q, k=10, default_operator=op))
    except ValueError:
        with pytest.raises(ValueError):
            qs_multifield_topk(r, q, ["text"], k=10, default_operator=op,
                               tie_breaker=tb)
        return
    got = _rows(qs_multifield_topk(
        r, q, ["text"], k=10, default_operator=op, tie_breaker=tb))
    assert got == want, (q, op, tb)


# general dis_max law: random term/phrase legs over either field, random
# tie_breaker — the DSL blend equals a hand blend of the frozen kernels
_leg = st.one_of(
    st.tuples(st.just("match"), st.sampled_from(["text", "title"]),
              st.lists(st.sampled_from(WORDS), min_size=1, max_size=2)),
    st.tuples(st.just("match_phrase"), st.sampled_from(["text", "title"]),
              st.tuples(st.sampled_from(WORDS), st.sampled_from(WORDS))),
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(legs=st.lists(_leg, min_size=1, max_size=3),
       tb=st.sampled_from([0.0, 0.3, 1.0]))
def test_dismax_blend_law(spark, prop_index, legs, tb):
    from engine.dsl import search
    from engine.query import bm25_topk, match_phrase_topk

    r = IndexReader(spark, prop_index)
    views = {"text": r, "title": r.for_field("title")}
    clauses, hand = [], {}
    all_term_same_field = (
        all(k == "match" for k, _f, _p in legs)
        and len({f for _k, f, _p in legs}) == 1
    )
    if all_term_same_field:
        return  # the frozen scoring-variant fast path, tested elsewhere
    for kind, fld, payload in legs:
        if kind == "match":
            clauses.append({"match": {fld: " ".join(payload)}})
            leg_rows = bm25_topk(views[fld], list(payload), k=1 << 31).collect()
        else:
            clauses.append({"match_phrase": {fld: " ".join(payload)}})
            leg_rows = match_phrase_topk(
                views[fld], " ".join(payload), k=1 << 31).collect()
        for x in leg_rows:
            hand.setdefault(x["url"], []).append(x["score"])
    want = sorted(
        ((u, max(ss) + tb * (sum(ss) - max(ss))) for u, ss in hand.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    resp = search(r, {"query": {"dis_max": {
        "queries": clauses, "tie_breaker": tb}}, "size": 10})
    got = [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]]
    assert got == [(u, round(s, 9)) for u, s in want], (legs, tb)
