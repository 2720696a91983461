"""Round-5 field lift: every DSL query kind that was gated to the primary
`text` field now routes to ANY indexed text field via reader.for_field
(shared docmap => per-field doc_ids coincide). Invariant judged here: for
each kind, search() with the field named == the same kernel invoked
directly on the per-field reader view (independently tested elsewhere).
Unknown fields and cross-field span mixes must still raise."""

from __future__ import annotations

import pytest

from engine.dsl import scroll_next, scroll_search, search
from engine.index_build import build_index
from engine.query import IndexReader

ROWS = [
    ("d1", "alpha beta gamma delta alpha", "red green blue alpha"),
    ("d2", "beta alpha delta", "green blue green alphax"),
    ("d3", "alpha beta beta gamma", "alpha beta red"),
    ("d4", "gamma delta delta", "red red green alpha beta"),
    ("d5", "alpha beta", "blue alpha beta green"),
    ("d6", "delta gamma alpha", "alpha green red blue"),
]


@pytest.fixture(scope="module")
def lift_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, ti, len(t)) for u, t, ti in ROWS],
        "url string, text string, title string, nc long",
    )
    out = str(tmp_path_factory.mktemp("lift") / "idx")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], index_options="positions",
        docvalue_cols=["nc"],
    )
    return out


def _ids(resp):
    return [h["_id"] for h in resp["hits"]["hits"]]


def _scores(resp):
    return [round(h["_score"], 9) for h in resp["hits"]["hits"]]


def _want(df):
    rows = df.collect()
    return [r["url"] for r in rows], [round(r["score"], 9) for r in rows]


def test_rewrite_kinds_on_title(spark, lift_index):
    from engine.query import bm25_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    for kind, val in (
        ("prefix", "gre"),
        ("wildcard", "g*een"),
        ("regexp", "gr.en|blu."),
        ("fuzzy", "grean"),
    ):
        resp = search(r, {"query": {kind: {"title": {"value": val}}},
                          "size": 10})
        wid, ws = _want(bm25_topk(rt, val, k=10, mode=kind))
        assert _ids(resp) == wid and _scores(resp) == ws, kind


def test_term_union_kinds_on_title(spark, lift_index):
    from engine.query import (
        bm25_synonym_topk,
        match_bool_prefix_topk,
        terms_set_topk,
    )

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"match_bool_prefix": {"title": "red gr"}},
                      "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        match_bool_prefix_topk(rt, "red gr", k=10)
    )
    resp = search(r, {"query": {"terms_set": {"title": {
        "terms": ["red", "green", "blue"],
        "minimum_should_match_field": "nc"}}}, "size": 10})
    got = terms_set_topk(rt, ["red", "green", "blue"], "nc", k=10)
    assert (_ids(resp), _scores(resp)) == _want(got)
    resp = search(r, {"query": {"synonym_match": {"title": {
        "groups": [["red", "green"], ["blue"]]}}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        bm25_synonym_topk(rt, [["red", "green"], ["blue"]], k=10)
    )


def test_span_kinds_on_title(spark, lift_index):
    from engine.spans import (
        span_first_topk,
        span_near_topk,
        span_not_topk,
        span_or_topk,
    )

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"span_near": {
        "clauses": [{"span_term": {"title": "red"}},
                    {"span_term": {"title": "green"}}],
        "slop": 1, "in_order": False}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        span_near_topk(rt, [["red"], ["green"]], k=10, slop=1, in_order=False)
    )
    resp = search(r, {"query": {"span_or": {
        "clauses": [{"span_term": {"title": "red"}},
                    {"span_term": {"title": "blue"}}]}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        span_or_topk(rt, ["red", "blue"], k=10)
    )
    resp = search(r, {"query": {"span_not": {
        "include": {"span_term": {"title": "green"}},
        "exclude": {"span_term": {"title": "blue"}},
        "dist": 1}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        span_not_topk(rt, [["green"]], ["blue"], k=10, pre=1, post=1)
    )
    resp = search(r, {"query": {"span_first": {
        "match": {"span_term": {"title": "green"}}, "end": 2}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        span_first_topk(rt, "green", end=2, k=10)
    )
    # intervals routes onto the span engine
    resp = search(r, {"query": {"intervals": {"title": {"match": {
        "query": "red green", "max_gaps": 1, "ordered": False}}}},
        "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        span_near_topk(rt, [["red"], ["green"]], k=10, slop=1, in_order=False)
    )
    with pytest.raises(ValueError, match="ONE field"):
        search(r, {"query": {"span_near": {
            "clauses": [{"span_term": {"title": "red"}},
                        {"span_term": {"text": "alpha"}}]}}, "size": 10})


def test_querystring_kinds_on_title(spark, lift_index):
    from engine.querystring import query_string_topk, simple_query_string_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"simple_query_string": {
        "query": "red | blue", "fields": ["title"]}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        simple_query_string_topk(rt, "red | blue", k=10)
    )
    resp = search(r, {"query": {"query_string": {
        "query": "red OR blue", "default_field": "title"}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        query_string_topk(rt, "red OR blue", k=10)
    )


def test_rescore_sort_aggs_count_scroll_on_title(spark, lift_index):
    from engine.query import rescore_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    # rescore: base match on title + phrase rescorer on title
    resp = search(r, {
        "query": {"match": {"title": "alpha green"}},
        "rescore": {"window_size": 5, "query": {
            "rescore_query": {"match_phrase": {"title": "alpha beta"}},
            "query_weight": 1.0, "rescore_query_weight": 2.0}},
        "size": 5})
    assert (_ids(resp), _scores(resp)) == _want(rescore_topk(
        rt, ["alpha", "green"], "alpha beta", k=5, window_size=5,
        query_weight=1.0, rescore_weight=2.0))
    with pytest.raises(ValueError, match="must equal the rescorer"):
        search(r, {"query": {"match": {"text": "alpha"}},
                   "rescore": {"query": {"rescore_query": {
                       "match_phrase": {"title": "alpha beta"}}}},
                   "size": 5})
    # sort path over a title phrase (the _agg_context lift)
    resp = search(r, {"query": {"match_phrase": {"title": "alpha beta"}},
                      "sort": [{"nc": {"order": "desc"}}], "size": 10})
    phrase_docs = {u for u, t, ti in ROWS if "alpha beta" in ti}
    assert set(_ids(resp)) == phrase_docs
    ncs = {u: len(t) for u, t, ti in ROWS}
    assert _ids(resp) == sorted(phrase_docs, key=lambda u: (-ncs[u], u))
    # track_total_hits + aggs under a title phrase
    resp = search(r, {"query": {"match_phrase": {"title": "alpha beta"}},
                      "track_total_hits": True,
                      "aggs": {"s": {"stats": {"field": "nc"}}},
                      "size": 0})
    assert resp["hits"]["total"]["value"] == len(phrase_docs)
    st = resp["aggregations"]["s"]["buckets"][0]
    assert st["v_count"] == len(phrase_docs)
    assert st["v_sum"] == sum(ncs[u] for u in phrase_docs)
    # scroll over a title phrase
    page = scroll_search(
        r, {"query": {"match_phrase": {"title": "alpha beta"}},
            "sort": [{"nc": {"order": "asc"}}]}, size=1)
    seen = [h["_id"] for h in page["hits"]["hits"]]
    while page.get("_scroll_id") and page["hits"]["hits"]:
        page = scroll_next(spark, page["_scroll_id"])
        seen += [h["_id"] for h in page["hits"]["hits"]]
    assert seen == sorted(phrase_docs, key=lambda u: (ncs[u], u))


def test_suggesters_on_title(spark, lift_index):
    from engine.query import suggest_complete, suggest_phrase, suggest_terms

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"suggest": {
        "s1": {"text": "gren", "term": {"field": "title"}},
        "s2": {"text": "red gren", "phrase": {"field": "title"}},
        "s3": {"prefix": "gr", "completion": {"field": "title"}},
    }, "size": 0})
    assert resp["suggest"]["s1"][0]["options"] == [
        x.asDict() for x in suggest_terms(rt, "gren").collect()]
    assert resp["suggest"]["s2"][0]["options"] == [
        x.asDict() for x in suggest_phrase(rt, "red gren").collect()]
    assert resp["suggest"]["s3"][0]["options"] == [
        x.asDict() for x in suggest_complete(rt, "gr").collect()]


def test_unknown_field_raises(spark, lift_index):
    r = IndexReader(spark, lift_index)
    for body in (
        {"query": {"prefix": {"nope": {"value": "g"}}}},
        {"query": {"match_bool_prefix": {"nope": "red gr"}}},
        {"query": {"span_near": {"clauses": [
            {"span_term": {"nope": "red"}}]}}},
        {"query": {"simple_query_string": {"query": "red",
                                           "fields": ["nope"]}}},
    ):
        with pytest.raises(ValueError, match="not an indexed text field"):
            search(r, {**body, "size": 5})


@pytest.fixture(scope="module")
def stored_lift_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, ti, len(t)) for u, t, ti in ROWS],
        "url string, text string, title string, nc long",
    )
    out = str(tmp_path_factory.mktemp("lift_src") / "idx")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        text_fields=["text", "title"], index_options="positions",
        docvalue_cols=["nc"], store_source=["text", "title"],
    )
    return out


def test_highlight_named_fields(spark, stored_lift_index):
    r = IndexReader(spark, stored_lift_index)
    resp = search(r, {
        "query": {"match": {"text": "alpha"}},
        "highlight": {"fields": {"text": {}, "title": {}}},
        "size": 10})
    assert resp["hits"]["hits"], "weak corpus"
    by_id = {u: (t, ti) for u, t, ti in ROWS}
    for h in resp["hits"]["hits"]:
        t, ti = by_id[h["_id"]]
        hl = h.get("highlight", {})
        # every text hit contains alpha -> marked fragment present
        assert "<em>alpha</em>" in hl["text"][0]
        # title fragment present when the title contains the SUBSTRING
        # (the frozen locate() contract); the <em> mark needs a word-
        # boundary occurrence
        if "alpha" in ti.split():
            assert "<em>alpha</em>" in hl["title"][0]
        elif "alpha" in ti:
            assert "<em>" not in hl["title"][0]
        else:
            assert "title" not in hl
    # unknown / unstored field fails closed
    with pytest.raises(ValueError, match="needs the source text"):
        search(r, {"query": {"match": {"text": "alpha"}},
                   "highlight": {"fields": {"nope": {}}}, "size": 5})


def test_significant_text_named_field(spark, stored_lift_index):
    """significant_text on the NON-query field: foreground = query-field
    matched docs; background df + re-analysis from the named field.
    Brute twin recomputes JLH from ROWS."""
    r = IndexReader(spark, stored_lift_index)
    resp = search(r, {
        "query": {"match": {"text": "gamma"}},
        "aggs": {"sig": {"significant_text": {"field": "title", "size": 5}}},
        "size": 0})
    buckets = resp["aggregations"]["sig"]["buckets"]
    # brute: fg = docs whose TEXT holds gamma; per-term fg df over TITLE
    fg = [ti for u, t, ti in ROWS if "gamma" in t.split()]
    n_fg, n_docs = len(fg), len(ROWS)
    fg_df: dict = {}
    for ti in fg:
        for w in set(ti.split()):
            fg_df[w] = fg_df.get(w, 0) + 1
    bg_df: dict = {}
    for u, t, ti in ROWS:
        for w in set(ti.split()):
            bg_df[w] = bg_df.get(w, 0) + 1
    want = []
    for w, c in fg_df.items():
        fr, br = c / n_fg, bg_df[w] / n_docs
        sc = (fr - br) * (fr / br)
        if sc > 0:
            want.append((w, c, bg_df[w], round(sc, 6)))
    want.sort(key=lambda x: (-x[3], x[0]))
    got = [(b["term"], b["doc_count"], b["bg_count"], b["score"])
           for b in buckets]
    assert got == want[:5]


def test_multi_match_fuzziness_routes(spark, lift_index):
    """multi_match + fuzziness: one field degenerates to match+fuzziness
    (identical hits/scores); several fields blend per-field fuzzy legs —
    best_fields = dis_max (max + tie_breaker * rest), most_fields = sum
    — each leg being exactly the single-field match+fuzziness query."""
    r = IndexReader(spark, lift_index)
    a = search(r, {"query": {"multi_match": {
        "query": "alpa", "fields": ["title"], "fuzziness": "AUTO"}},
        "size": 10})
    b = search(r, {"query": {"match": {"title": {
        "query": "alpa", "fuzziness": "AUTO"}}}, "size": 10})
    assert _ids(a) == _ids(b) and _scores(a) == _scores(b)
    assert _ids(a), "weak corpus — fuzzy matched nothing"

    def _leg(fld):
        resp = search(r, {"query": {"match": {fld: {
            "query": "alpa", "fuzziness": "AUTO"}}}, "size": 1000})
        return {h["_id"]: h["_score"] for h in resp["hits"]["hits"]}

    legs = [_leg("title"), _leg("text")]
    for mtype, blend in (
        ("best_fields", lambda ss: max(ss) + 0.3 * (sum(ss) - max(ss))),
        ("most_fields", lambda ss: sum(ss)),
    ):
        got = search(r, {"query": {"multi_match": {
            "query": "alpa", "fields": ["title", "text"],
            "fuzziness": "AUTO", "type": mtype, "tie_breaker": 0.3}},
            "size": 10})
        by: dict[str, list[float]] = {}
        for lg in legs:
            for u, s in lg.items():
                by.setdefault(u, []).append(s)
        want = sorted(((u, blend(ss)) for u, ss in by.items()),
                      key=lambda t: (-t[1], t[0]))[:10]
        assert _ids(got) == [u for u, _ in want], mtype
        assert _scores(got) == [round(s, 9) for _, s in want], mtype
    with pytest.raises(ValueError, match="cross_fields"):
        search(r, {"query": {"multi_match": {
            "query": "alpa", "fields": ["title", "text"],
            "fuzziness": "AUTO", "type": "cross_fields"}}, "size": 10})


def test_post_filter(spark, lift_index):
    """ES post_filter: hits restricted (exact, pre-top-k), aggs and
    hits.total keep the unfiltered query scope."""
    r = IndexReader(spark, lift_index)
    ncs = {u: len(t) for u, t, ti in ROWS}
    cut = sorted(ncs.values())[len(ncs) // 2]
    body = {
        "query": {"match": {"text": "alpha"}},
        "post_filter": {"range": {"nc": {"gte": cut}}},
        "track_total_hits": True,
        "aggs": {"s": {"stats": {"field": "nc"}}},
        "size": 10,
    }
    resp = search(r, body)
    alpha_docs = {u for u, t, ti in ROWS if "alpha" in t.split()}
    kept = {u for u in alpha_docs if ncs[u] >= cut}
    assert set(_ids(resp)) == kept
    # unfiltered query scope for total + aggs
    assert resp["hits"]["total"]["value"] == len(alpha_docs)
    st = resp["aggregations"]["s"]["buckets"][0]
    assert st["v_count"] == len(alpha_docs)
    assert st["v_sum"] == sum(ncs[u] for u in alpha_docs)
    # scores of survivors equal the unfiltered query's scores (ES)
    base = search(r, {"query": {"match": {"text": "alpha"}}, "size": 10})
    base_s = dict(zip(_ids(base), _scores(base)))
    for h in resp["hits"]["hits"]:
        assert round(h["_score"], 9) == base_s[h["_id"]]
    # match_all + post_filter pages the filtered docmap
    resp = search(r, {"query": {"match_all": {}},
                      "post_filter": {"range": {"nc": {"gte": cut}}},
                      "size": 10})
    assert set(_ids(resp)) == {u for u in ncs if ncs[u] >= cut}
    # sort path composes (collapse / rescore composition has its own tests)
    resp = search(r, {"query": {"match": {"text": "alpha"}},
                      "post_filter": {"range": {"nc": {"gte": cut}}},
                      "sort": [{"nc": "asc"}], "size": 10})
    assert _ids(resp) == sorted(kept, key=lambda u: (ncs[u], u))


def test_post_filter_collapse(spark, lift_index):
    """post_filter + collapse (Lucene: the filter wraps the hit
    collector, so group representatives are chosen among FILTERED docs,
    with unfiltered filter-context scores). Brute: survivors = query
    matches passing the filter; per-nc group keep the best base score;
    groups ranked by that score."""
    r = IndexReader(spark, lift_index)
    ncs = {u: len(t) for u, t, ti in ROWS}
    base = search(r, {"query": {"match": {"text": "delta"}}, "size": 10})
    base_s = dict(zip(_ids(base), _scores(base)))  # unfiltered scores

    resp = search(r, {"query": {"match": {"text": "delta"}},
                      "post_filter": {"range": {"nc": {"gte": 16}}},
                      "collapse": {"field": "nc"}, "size": 10})
    survivors = [u for u in base_s if ncs[u] >= 16]
    groups: dict = {}
    for u in survivors:
        b = groups.get(ncs[u])
        if b is None or round(base_s[u], 6) > round(base_s[b], 6):
            groups[ncs[u]] = u
    want = sorted(groups.values(), key=lambda u: -round(base_s[u], 6))
    assert _ids(resp) == want
    # survivor scores are the unfiltered query's scores (filter context;
    # collapse_topk's frozen spec rounds to 6 dp)
    for h in resp["hits"]["hits"]:
        assert round(h["_score"], 6) == round(base_s[h["_id"]], 6)
    # the nc=17 group has two members (d4, d6); both pass the filter and
    # exactly one representative (the higher tf) must surface
    assert "d4" in want and "d6" not in want
    # a term post_filter narrows to one group
    resp = search(r, {"query": {"match": {"text": "delta"}},
                      "post_filter": {"term": {"nc": 17}},
                      "collapse": {"field": "nc"}, "size": 10})
    assert _ids(resp) == ["d4"]


def test_post_filter_rescore(spark, lift_index):
    """post_filter + rescore: the rescore window is cut from the
    FILTERED base ranking (Lucene applies post_filter at collection,
    before the rescore phase). Cross-check against two independently
    tested kernels: the filtered base ranking (bm25_topk + filters)
    picks the window; an all-docs-window rescore_topk supplies the
    per-doc blended score."""
    from engine.dsl import _clause_filters
    from engine.query import bm25_topk, rescore_topk

    r = IndexReader(spark, lift_index)
    flt = _clause_filters([{"range": {"nc": {"gte": 16}}}])
    qw, rw, window = 0.7, 1.5, 3

    fb = [x["url"] for x in
          bm25_topk(r, ["alpha", "gamma"], k=10, filters=flt).collect()]
    assert len(fb) >= window + 1, "weak fixture — window must cut something"
    blend = {
        x["url"]: x["score"]
        for x in rescore_topk(
            r, ["alpha", "gamma"], ["alpha", "beta"], k=10, window_size=32,
            query_weight=qw, rescore_weight=rw,
        ).collect()
    }
    want = sorted(fb[:window], key=lambda u: -round(blend[u], 6))
    assert len({round(blend[u], 6) for u in want}) == len(want), "tie — weak fixture"

    resp = search(r, {
        "query": {"match": {"text": "alpha gamma"}},
        "post_filter": {"range": {"nc": {"gte": 16}}},
        "rescore": {"window_size": window, "query": {
            "rescore_query": {"match_phrase": {"text": {"query": "alpha beta"}}},
            "query_weight": qw, "rescore_query_weight": rw}},
        "size": window})
    assert _ids(resp) == want
    for h in resp["hits"]["hits"]:
        assert round(h["_score"], 6) == round(blend[h["_id"]], 6)
    # a doc outside the filtered window never enters the rescore phase
    dropped = [u for u in blend if u not in fb]
    assert set(_ids(resp)).isdisjoint(dropped)


def test_boosting_dismax_mlt_pinned_on_title(spark, lift_index):
    from engine.aggs import pinned_topk
    from engine.query import bm25_boosting_topk, bm25_dismax_topk, mlt_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"boosting": {
        "positive": {"match": {"title": "green"}},
        "negative": {"match": {"title": "blue"}},
        "negative_boost": 0.4}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        bm25_boosting_topk(rt, ["green"], ["blue"], negative_boost=0.4, k=10)
    )
    with pytest.raises(ValueError, match="ONE\n?\\s*field|ONE field"):
        search(r, {"query": {"boosting": {
            "positive": {"match": {"title": "green"}},
            "negative": {"match": {"text": "alpha"}}}}, "size": 10})
    resp = search(r, {"query": {"dis_max": {
        "queries": [{"match": {"title": "red"}},
                    {"match": {"title": "blue"}}],
        "tie_breaker": 0.3}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        bm25_dismax_topk(rt, ["red", "blue"], k=10, tie_breaker=0.3)
    )
    # cross-field legs no longer raise: they follow ES per-LEG dis_max
    # (full blend laws in test_dismax_general) — tie_breaker=0 is max
    resp = search(r, {"query": {"dis_max": {"queries": [
        {"match": {"title": "red"}}, {"match": {"text": "alpha"}}]}},
        "size": 10})
    from engine.query import bm25_topk

    by_doc: dict[str, list[float]] = {}
    for leg_df in (bm25_topk(rt, ["red"], k=1 << 31),
                   bm25_topk(r, ["alpha"], k=1 << 31)):
        for x in leg_df.collect():
            by_doc.setdefault(x["url"], []).append(x["score"])
    want_rows = sorted(
        ((u, max(ss)) for u, ss in by_doc.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert _ids(resp) == [u for u, _ in want_rows]
    assert _scores(resp) == [round(s, 9) for _, s in want_rows]
    resp = search(r, {"query": {"more_like_this": {
        "like": "red green blue", "fields": ["title"],
        "max_query_terms": 3}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        mlt_topk(rt, "red green blue", max_query_terms=3, k=10)
    )
    resp = search(r, {"query": {"pinned": {
        "ids": ["d6"], "organic": {"match": {"title": "green"}}}},
        "size": 10})
    want = pinned_topk(rt, ["d6"], ["green"], k=10).collect()
    assert _ids(resp) == [x["url"] for x in want]


def test_bool_and_agg_contexts_on_title(spark, lift_index):
    from engine.query import bm25_bool_topk, bm25_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    # bool must/should/must_not all on title == the kernel on the view
    resp = search(r, {"query": {"bool": {
        "must": [{"match": {"title": "green"}}],
        "should": [{"match": {"title": "red"}}],
        "must_not": [{"match": {"title": "alphax"}}]}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(bm25_bool_topk(
        rt, must=["green"], should=["red"], must_not=["alphax"], k=10))
    with pytest.raises(ValueError, match="ONE field"):
        search(r, {"query": {"bool": {
            "must": [{"match": {"title": "green"}},
                     {"match": {"text": "alpha"}}]}}, "size": 10})
    # sort / aggs / count over a TERM query on title (the
    # _query_terms_or_none lift through _agg_context)
    green_docs = {u for u, t, ti in ROWS if "green" in ti.split()}
    ncs = {u: len(t) for u, t, ti in ROWS}
    resp = search(r, {"query": {"match": {"title": "green"}},
                      "sort": [{"nc": "asc"}], "size": 10})
    assert _ids(resp) == sorted(green_docs, key=lambda u: (ncs[u], u))
    resp = search(r, {"query": {"match": {"title": "green"}},
                      "track_total_hits": True,
                      "aggs": {"s": {"stats": {"field": "nc"}}}, "size": 0})
    assert resp["hits"]["total"]["value"] == len(green_docs)
    st = resp["aggregations"]["s"]["buckets"][0]
    assert st["v_count"] == len(green_docs)
    assert st["v_sum"] == sum(ncs[u] for u in green_docs)


def test_script_function_score_on_title(spark, lift_index):
    from engine.query import bm25_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"script_score": {
        "query": {"match": {"title": "green"}},
        "script": {"source": "_score * 2"}}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        bm25_topk(rt, ["green"], k=10, script="_score * 2"))
    resp = search(r, {"query": {"function_score": {
        "query": {"match": {"title": "green"}},
        "field_value_factor": {"field": "nc", "factor": 0.5}}}, "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(
        bm25_topk(rt, ["green"], k=10, boost=("nc", 0.5)))


def test_term_query_on_title_scores_bm25(spark, lift_index):
    from engine.query import bm25_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"term": {"title": {"value": "green"}}},
                      "size": 10})
    assert (_ids(resp), _scores(resp)) == _want(bm25_topk(rt, ["green"], k=10))
    # docvalue term still constant-scores
    ncs = {u: len(t) for u, t, ti in ROWS}
    some = next(iter(ncs.values()))
    resp = search(r, {"query": {"term": {"nc": some}}, "size": 10})
    assert set(_ids(resp)) == {u for u, v in ncs.items() if v == some}
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])


def test_delete_by_query_on_title(spark, tmp_path_factory):
    """delete_by_query with the match on a NON-primary field: the matched
    set comes from that field's postings."""
    from engine.deletes import delete_by_query
    from engine.query import bm25_topk

    df = spark.createDataFrame(
        [(u, t, ti, len(t)) for u, t, ti in ROWS],
        "url string, text string, title string, nc long",
    )
    out = str(tmp_path_factory.mktemp("dbq_t") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4,
                text_fields=["text", "title"])
    delete_by_query(spark, out, {"query": {"match": {"title": "blue"}}})
    r = IndexReader(spark, out)
    live = {x["url"] for x in bm25_topk(r, ["alpha"], k=100).collect()}
    blue = {u for u, t, ti in ROWS if "blue" in ti.split()}
    alpha = {u for u, t, ti in ROWS if "alpha" in t.split()}
    assert live == alpha - blue


def test_scroll_term_query_on_title(spark, lift_index):
    r = IndexReader(spark, lift_index)
    ncs = {u: len(t) for u, t, ti in ROWS}
    green = {u for u, t, ti in ROWS if "green" in ti.split()}
    page = scroll_search(
        r, {"query": {"match": {"title": "green"}},
            "sort": [{"nc": {"order": "asc"}}]}, size=1)
    seen = [h["_id"] for h in page["hits"]["hits"]]
    while page.get("_scroll_id") and page["hits"]["hits"]:
        page = scroll_next(spark, page["_scroll_id"])
        seen += [h["_id"] for h in page["hits"]["hits"]]
    assert seen == sorted(green, key=lambda u: (ncs[u], u))


def test_collapse_on_title(spark, lift_index):
    from engine.aggs import collapse_topk

    r = IndexReader(spark, lift_index)
    rt = r.for_field("title")
    resp = search(r, {"query": {"match": {"title": "green"}},
                      "collapse": {"field": "nc"}, "size": 10})
    want = collapse_topk(rt, ["green"], "nc", k=10).collect()
    assert _ids(resp) == [x["url"] for x in want]
    assert _scores(resp) == [round(x["score"], 9) for x in want]
