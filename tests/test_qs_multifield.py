"""Round-5 multi-field simple_query_string: Lucene SimpleQueryParser
field-weight semantics — per clause, the SUM over fields of boost_f x
that field's clause score, matched wherever ANY field matches; clause
algebra (or/and/negation) unchanged. Laws judged here: collapsing to one
unboosted field reproduces the frozen single-field kernel exactly, and
the cross-field blend equals a hand recomputation from the single
kernels."""

from __future__ import annotations

import pytest

from engine.dsl import search
from engine.index_build import build_index
from engine.query import IndexReader
from engine.querystring import simple_query_string_topk, sqs_multifield_topk

ROWS = [
    ("d1", "alpha beta gamma delta alpha", "red green blue alpha"),
    ("d2", "beta alpha delta", "green blue green alphax"),
    ("d3", "alpha beta beta gamma", "alpha beta red"),
    ("d4", "gamma delta delta", "red red green alpha beta"),
    ("d5", "alpha beta", "blue alpha beta green"),
    ("d6", "delta gamma alpha", "alpha green red blue"),
]

Q = '"alpha beta" gam* -blue'


@pytest.fixture(scope="module")
def qs_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, ti) for u, t, ti in ROWS],
        "url string, text string, title string",
    )
    out = str(tmp_path_factory.mktemp("qsmf") / "idx")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], index_options="positions",
    )
    return out


def _rows(df):
    return [(r["url"], round(r["score"], 9)) for r in df.collect()]


def test_single_field_law(spark, qs_index):
    """fields=[f] (unboosted) through the multi-field path must equal
    the frozen single-field kernel — ranks AND scores — for a query
    mixing phrase, prefix, term, and negation, both operators."""
    r = IndexReader(spark, qs_index)
    rt = r.for_field("title")
    for view, fld in ((r, "text"), (rt, "title")):
        for op in ("or", "and"):
            got = sqs_multifield_topk(
                r, Q, [fld], k=10, default_operator=op
            )
            want = simple_query_string_topk(
                view, Q, k=10, default_operator=op
            )
            assert _rows(got) == _rows(want), (fld, op)


def test_cross_field_hand_blend(spark, qs_index):
    """two fields, title^2: per-clause sum across fields recomputed by
    hand from the frozen kernels (phrase / prefix-expansion / term)."""
    from engine.query import bm25_topk, match_phrase_topk

    r = IndexReader(spark, qs_index)
    views = {"text": r, "title": r.for_field("title")}
    boosts = {"text": 1.0, "title": 2.0}

    def leg(kind, payload, name):
        v = views[name]
        if kind == "phrase":
            df = match_phrase_topk(v, payload, k=1 << 31)
        elif kind == "prefix":
            terms = v.expand_prefix(payload, 50)
            if not terms:
                return {}
            df = bm25_topk(v, terms, k=1 << 31)
        else:
            df = bm25_topk(v, [payload], k=1 << 31)
        return {x["url"]: x["score"] for x in df.collect()}

    clause_specs = [("phrase", ["alpha", "beta"]), ("prefix", "gam")]
    neg_specs = [("term", "blue")]
    pos_maps = []
    for kind, payload in clause_specs:
        per = {}
        for name in views:
            for u, s in leg(kind, payload, name).items():
                per[u] = per.get(u, 0.0) + boosts[name] * s
        pos_maps.append(per)
    excluded = set()
    for kind, payload in neg_specs:
        for name in views:
            excluded |= set(leg(kind, payload, name))
    total = {}
    for per in pos_maps:
        for u, s in per.items():
            total[u] = total.get(u, 0.0) + s
    for u in excluded:
        total.pop(u, None)
    want = sorted(total.items(), key=lambda t: (-t[1], t[0]))[:10]

    got = sqs_multifield_topk(r, Q, ["title^2", "text"], k=10)
    assert [(u, round(s, 9)) for u, s in _rows(got)] == [
        (u, round(s, 9)) for u, s in want
    ]
    assert want, "weak corpus — query matched nothing"


def test_and_mode_cross_field_conjunction(spark, qs_index):
    """operator=and: a doc matching clause A only in text and clause B
    only in title still matches (ANY-field clause match, ES), while a
    doc missing a clause in EVERY field drops."""
    r = IndexReader(spark, qs_index)
    # clauses: gamma (text-only term), red (title-only term)
    got = sqs_multifield_topk(
        r, "gamma red", ["text", "title"], k=10, default_operator="and"
    )
    ids = [u for u, _ in _rows(got)]
    # d1: gamma in text, red in title -> matches; d3: gamma in text,
    # red in title -> matches; d5: neither gamma nor red in text, red
    # absent? d5 title 'blue alpha beta green' has no red and text has
    # no gamma -> drops
    assert "d1" in ids and "d3" in ids and "d5" not in ids
    # single-field AND on text alone would drop every doc (red never
    # appears in text)
    assert _rows(sqs_multifield_topk(
        r, "gamma red", ["text"], k=10, default_operator="and")) == []


def test_dsl_routing(spark, qs_index):
    r = IndexReader(spark, qs_index)
    resp = search(r, {"query": {"simple_query_string": {
        "query": Q, "fields": ["title^2", "text"]}}, "size": 10})
    want = _rows(sqs_multifield_topk(r, Q, ["title^2", "text"], k=10))
    assert [h["_id"] for h in resp["hits"]["hits"]] == [u for u, _ in want]
    assert [round(h["_score"], 9) for h in resp["hits"]["hits"]] == [
        s for _, s in want
    ]
    with pytest.raises(ValueError, match="not indexed"):
        sqs_multifield_topk(r, Q, ["nope"], k=10)


QS_Q = '(alpha OR gam*) AND "alpha beta" -blue'


def test_qs_single_field_law(spark, qs_index):
    """query_string fields=[f] through the multi-field evaluator must
    equal the frozen single-field kernel for a grammar-rich query
    (grouping, AND/OR, prefix, phrase, negation), both operators and
    several tie_breakers (a single leg blends to itself)."""
    from engine.querystring import qs_multifield_topk, query_string_topk

    r = IndexReader(spark, qs_index)
    rt = r.for_field("title")
    for view, fld in ((r, "text"), (rt, "title")):
        for op in ("or", "and"):
            for tb in (0.0, 0.5):
                got = qs_multifield_topk(
                    r, QS_Q, [fld], k=10, default_operator=op,
                    tie_breaker=tb,
                )
                want = query_string_topk(view, QS_Q, k=10,
                                         default_operator=op)
                assert _rows(got) == _rows(want), (fld, op, tb)


def test_qs_cross_field_leaf_dismax(spark, qs_index):
    """two fields, title^2, tie_breaker 0.3: each LEAF blends dis_max
    across fields; the bool algebra combines blended leaves — verified
    by hand from the single kernels for 'alpha -blue'."""
    from engine.query import bm25_topk
    from engine.querystring import qs_multifield_topk

    r = IndexReader(spark, qs_index)
    views = {"text": (r, 1.0), "title": (r.for_field("title"), 2.0)}

    def leaf(term):
        per = {}
        for v, b in views.values():
            for x in bm25_topk(v, [term], k=1 << 31).collect():
                d = per.setdefault(x["url"], [])
                d.append(b * x["score"])
        return {u: max(ss) + 0.3 * (sum(ss) - max(ss)) for u, ss in per.items()}

    alpha, blue = leaf("alpha"), leaf("blue")
    want = sorted(
        ((u, s) for u, s in alpha.items() if u not in blue),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = qs_multifield_topk(
        r, "alpha -blue", ["title^2", "text"], k=10, tie_breaker=0.3
    )
    assert _rows(got) == [(u, round(s, 9)) for u, s in want]
    assert want, "weak corpus"


def test_qs_dsl_routing_and_types(spark, qs_index):
    from engine.querystring import qs_multifield_topk

    r = IndexReader(spark, qs_index)
    body = {"query": {"query_string": {
        "query": QS_Q, "fields": ["title^2", "text"],
        "tie_breaker": 0.3}}, "size": 10}
    resp = search(r, body)
    want = _rows(qs_multifield_topk(
        r, QS_Q, ["title^2", "text"], k=10, tie_breaker=0.3))
    assert [h["_id"] for h in resp["hits"]["hits"]] == [u for u, _ in want]
    # most_fields == tie_breaker 1.0
    a = search(r, {"query": {"query_string": {
        "query": "alpha red", "fields": ["text", "title"],
        "type": "most_fields"}}, "size": 10})
    b = _rows(qs_multifield_topk(
        r, "alpha red", ["text", "title"], k=10, tie_breaker=1.0))
    assert [h["_id"] for h in a["hits"]["hits"]] == [u for u, _ in b]
    with pytest.raises(ValueError, match="cross_fields"):
        search(r, {"query": {"query_string": {
            "query": "alpha", "fields": ["text", "title"],
            "type": "cross_fields"}}, "size": 10})
    with pytest.raises(ValueError, match="default_field"):
        search(r, {"query": {"query_string": {
            "query": "alpha", "fields": ["text", "title"],
            "default_field": "text"}}, "size": 10})
