"""Filter context composed with every scoring query kind (round-5 lift).

ES semantics under test, uniform across kinds: filter clauses restrict
the matched set WITHOUT touching surviving docs' scores — the filtered
result must equal the unfiltered full result restricted to the docs the
filter admits, score-identical. Kernel plumbing:

- bool / minimum_should_match -> _bool_shard_topk local_filter
- simple_query_string / query_string -> _sqs/_qs_shard_topk local_filter
- match_phrase / sloppy / prefix -> _phrase_slots_topk post-kernel mask
  (exact: the kernel runs unbounded, mask + truncate on ordered output)
- prefix/wildcard/regexp/fuzzy -> bm25_topk's existing TAAT mask
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest

from engine.docvalues import RangeFilter, TermFilter
from engine.dsl import search
from engine.index_build import build_index
from engine.query import IndexReader

VOCAB = [
    "hash", "table", "join", "sort", "merge", "scan", "index", "fast",
    "query", "plan", "tree", "leaf", "page", "disk", "cache", "hit",
]


def _mk_corpus(n: int = 90):
    rng = random.Random(3)
    rows = []
    for i in range(n):
        words = rng.choices(VOCAB, k=rng.randint(6, 40))
        if i % 4 == 0:
            # seed exact phrases so phrase queries have real matches
            p = rng.randint(0, len(words) - 2)
            words[p : p + 2] = ["hash", "table"]
        text = " ".join(words)
        # req: small per-doc terms_set threshold (1..3, deterministic)
        rows.append((f"u{i:04d}", text, "abc"[i % 3], len(text), i % 3 + 1))
    return rows


@pytest.fixture(scope="module")
def fc_index(spark):
    rows = _mk_corpus()
    df = spark.createDataFrame(
        rows, "url string, text string, grp string, nc long, req long"
    )
    out = tempfile.mkdtemp(prefix="sparkft_test_fc_")
    build_index(
        spark, df, out, n_shards=3, n_buckets=4,
        index_options="positions", docvalue_cols=["grp", "nc", "req"],
    )
    yield out, rows
    shutil.rmtree(out, ignore_errors=True)


FILTER_BODY = [{"term": {"grp": "b"}}, {"range": {"nc": {"gte": 60, "lt": 200}}}]


def _allowed(rows):
    return {u for u, _t, g, nc, _r in rows if g == "b" and 60 <= nc < 200}


def _hits(reader, query: dict, filt: bool, k: int = 300):
    q = dict(query)
    if filt:
        inner = q.pop("__wrap__", None)
        if inner is None:
            q = {"bool": {"must": [query], "filter": FILTER_BODY}}
    body = {"query": q, "size": k}
    return search(reader, body)["hits"]["hits"]


QUERIES = [
    ("bool_should", {"bool": {
        "must": [{"match": {"text": "hash"}}],
        "should": [{"match": {"text": "join"}}, {"match": {"text": "sort"}}],
        "must_not": [{"match": {"text": "scan"}}],
    }}),
    ("msm", {"match": {"text": {
        "query": "hash join sort merge", "minimum_should_match": 2}}}),
    ("prefix", {"prefix": {"text": {"value": "ha"}}}),
    ("wildcard", {"wildcard": {"text": {"value": "ta*e"}}}),
    ("fuzzy", {"fuzzy": {"text": {"value": "hashh"}}}),
    ("phrase", {"match_phrase": {"text": "hash table"}}),
    ("phrase_slop", {"match_phrase": {"text": {"query": "hash join", "slop": 3}}}),
    ("phrase_prefix", {"match_phrase_prefix": {"text": "hash ta"}}),
    ("sqs", {"simple_query_string": {
        "query": '"hash table" join -scan me*', "fields": ["text"]}}),
    ("query_string", {"query_string": {
        "query": '(hash AND table) OR "sort merge" -scan', "fields": ["text"]}}),
    # round-5 second batch: spans / intervals / terms_set / boosting /
    # pinned / ids / match_bool_prefix / synonym_match
    ("span_near", {"span_near": {"clauses": [
        {"span_term": {"text": "hash"}}, {"span_term": {"text": "table"}}],
        "slop": 1, "in_order": True}}),
    ("span_first", {"span_first": {
        "match": {"span_term": {"text": "hash"}}, "end": 5}}),
    ("intervals", {"intervals": {"text": {"match": {
        "query": "hash table", "max_gaps": 2, "ordered": True}}}}),
    ("terms_set", {"terms_set": {"text": {
        "terms": ["hash", "join", "sort"],
        "minimum_should_match_field": "req"}}}),
    ("boosting", {"boosting": {
        "positive": {"match": {"text": "hash table"}},
        "negative": {"match": {"text": "scan"}}, "negative_boost": 0.4}}),
    ("pinned", {"pinned": {
        "ids": ["u0004", "u0016", "u0001"],
        "organic": {"match": {"text": "hash table"}}}}),
    ("ids", {"ids": {"values": [f"u{i:04d}" for i in range(0, 60, 2)]}}),
    ("match_bool_prefix", {"match_bool_prefix": {"text": "join ta"}}),
    ("synonym_match", {"synonym_match": {"text": {
        "groups": [["hash", "index"], ["table"]]}}}),
]


@pytest.mark.parametrize("name,query", QUERIES, ids=[n for n, _ in QUERIES])
def test_filter_restricts_without_rescoring(spark, fc_index, name, query):
    out, rows = fc_index
    reader = IndexReader(spark, out)
    # filter composes via the ES body shape bool{must:[q], filter:[...]}
    # EXCEPT when q is itself a bool: then the filter merges into it
    if "bool" in query:
        q_f = {"bool": dict(query["bool"], filter=FILTER_BODY)}
        got = search(reader, {"query": q_f, "size": 300})["hits"]["hits"]
    else:
        got = _hits(reader, query, filt=True)
    full = _hits(reader, query, filt=False)
    allowed = _allowed(rows)
    want = [h for h in full if h["_id"] in allowed]
    assert [h["_id"] for h in got] == [h["_id"] for h in want], name
    assert [h["_score"] for h in got] == pytest.approx(
        [h["_score"] for h in want], rel=1e-12
    ), name
    # the filter is real: it must exclude at least one unfiltered hit
    assert len(want) < len(full), f"{name}: filter excluded nothing — weak test"
    assert got, f"{name}: zero filtered hits — weak test"


def test_kernel_api_filters_spark_path(spark, fc_index):
    """The Spark execution path applies the same per-shard mask (shard id
    is threaded through applyInPandas)."""
    from engine.query import bm25_bool_topk, match_phrase_topk
    from engine.querystring import simple_query_string_topk

    out, rows = fc_index
    reader = IndexReader(spark, out)
    filters = [TermFilter("grp", "b"), RangeFilter("nc", 60, 200)]
    for fn in (
        lambda ex: bm25_bool_topk(
            reader, must=["hash"], should=["join", "sort"], k=300,
            filters=filters, execution=ex),
        lambda ex: match_phrase_topk(
            reader, "hash table", k=300, filters=filters, execution=ex),
        lambda ex: simple_query_string_topk(
            reader, '"hash table" join', k=300, filters=filters, execution=ex),
    ):
        loc = [(r["url"], round(r["score"], 9)) for r in fn("local").collect()]
        spk = [(r["url"], round(r["score"], 9)) for r in fn("spark").collect()]
        assert loc == spk and loc


def test_aggs_and_count_under_phrase(spark, fc_index):
    """Round-5 composition: {"query": {"match_phrase": ...}, "aggs"/
    "track_total_hits"} — the matched set comes from the per-shard
    positional phrase matcher (docs with phrase freq > 0), computed next
    to the postings, then feeds the same docvalue agg/count machinery."""
    out, rows = fc_index
    reader = IndexReader(spark, out)

    def brute_matched(slop=0):
        got = set()
        for u, t, _g, _nc, _r in rows:
            toks = t.split()
            if slop == 0:
                if any(toks[i:i + 2] == ["hash", "table"]
                       for i in range(len(toks) - 1)):
                    got.add(u)
            else:
                # sloppy: hash at i, table at j, |(j-1) - i| <= slop
                hs = [i for i, w in enumerate(toks) if w == "hash"]
                ts = [j for j, w in enumerate(toks) if w == "table"]
                if any(abs((j - 1) - i) <= slop for i in hs for j in ts):
                    got.add(u)
        return got

    for slop in (0, 2):
        q = {"match_phrase": {"text": {"query": "hash table", "slop": slop}}}
        resp = search(reader, {
            "query": q, "size": 0, "track_total_hits": True,
            "aggs": {"by_grp": {"terms": {"field": "grp", "size": 10}}},
        })
        want = brute_matched(slop)
        assert resp["hits"]["total"]["value"] == len(want), f"slop={slop}"
        from collections import Counter
        grp_of = {u: g for u, _t, g, _nc, _r in rows}
        want_counts = Counter(grp_of[u] for u in want)
        got_counts = {
            b["key"]: b["doc_count"]
            for b in resp["aggregations"]["by_grp"]["buckets"]
        }
        assert got_counts == dict(want_counts), f"slop={slop}"

    # phrase + filter context + aggs compose together
    resp = search(reader, {
        "query": {"bool": {"must": [
            {"match_phrase": {"text": "hash table"}}], "filter": FILTER_BODY}},
        "size": 0, "aggs": {"g": {"terms": {"field": "grp", "size": 10}}},
    })
    want = brute_matched(0) & _allowed(rows)
    got = {b["key"]: b["doc_count"]
           for b in resp["aggregations"]["g"]["buckets"]}
    assert sum(got.values()) == len(want) and set(got) <= {"b"}

    # a dead slot term: empty buckets, zero total (conjunctive semantics)
    resp = search(reader, {
        "query": {"match_phrase": {"text": "hash zzzznope"}},
        "size": 0, "track_total_hits": True,
        "aggs": {"g": {"terms": {"field": "grp"}}},
    })
    assert resp["hits"]["total"]["value"] == 0
    assert resp["aggregations"]["g"]["buckets"] == []

    # sampler under a phrase query composes via the SCORED phrase
    # matcher (round-5 lift): sample = global top shard_size docs by
    # 6-dp-rounded TRUE phrase BM25 (url asc ties), then terms-bucketed
    from engine.query import match_phrase_topk

    full = match_phrase_topk(reader, "hash table", k=1 << 31).collect()
    grp_of = {u: g for u, _t, g, _nc, _r in rows}
    ranked = sorted(
        ((x["url"], round(x["score"], 6)) for x in full),
        key=lambda t: (-t[1], t[0]),
    )
    assert len(ranked) > 5, "weak corpus — need > shard_size matches"
    sample = [u for u, _s in ranked[:5]]
    from collections import Counter

    want_counts = Counter(grp_of[u] for u in sample)
    resp = search(reader, {
        "query": {"match_phrase": {"text": "hash table"}}, "size": 0,
        "aggs": {"s": {"sampler": {"shard_size": 5},
                       "aggs": {"t": {"terms": {"field": "grp"}}}}},
    })
    got = {b["key"]: b["doc_count"]
           for b in resp["aggregations"]["s"]["buckets"]}
    assert got == dict(want_counts)

    # diversified_sampler under the phrase: greedy per-value cap before
    # the size cut, same score order
    per_grp: dict[str, int] = {}
    div_sample = []
    for u, _s in ranked:
        g = grp_of[u]
        if per_grp.get(g, 0) < 2:
            per_grp[g] = per_grp.get(g, 0) + 1
            div_sample.append(u)
        if len(div_sample) == 4:
            break
    resp = search(reader, {
        "query": {"match_phrase": {"text": "hash table"}}, "size": 0,
        "aggs": {"s": {"diversified_sampler": {
            "shard_size": 4, "field": "grp", "max_docs_per_value": 2},
            "aggs": {"t": {"terms": {"field": "grp"}}}}},
    })
    got = {b["key"]: b["doc_count"]
           for b in resp["aggregations"]["s"]["buckets"]}
    assert got == dict(Counter(grp_of[u] for u in div_sample))

    # phrase + filter context + sampler: the filter mask rides the
    # scored matched set before the cut
    allowed = _allowed(rows)
    frank = [u for u, _s in ranked if u in allowed][:5]
    resp = search(reader, {
        "query": {"bool": {"must": [
            {"match_phrase": {"text": "hash table"}}],
            "filter": FILTER_BODY}},
        "size": 0,
        "aggs": {"s": {"sampler": {"shard_size": 5},
                       "aggs": {"t": {"terms": {"field": "grp"}}}}},
    })
    got = {b["key"]: b["doc_count"]
           for b in resp["aggregations"]["s"]["buckets"]}
    assert got == dict(Counter(grp_of[u] for u in frank))


def test_sort_and_highlight_under_phrase(spark, fc_index):
    """sort + search_after and highlight compose with match_phrase: the
    sort path uses the positional matcher's matched set; highlight marks
    the phrase's slot terms (plain-highlighter behavior)."""
    out, rows = fc_index
    reader = IndexReader(spark, out)
    matched = {
        u for u, t, _g, _nc, _r in rows
        if any(t.split()[i:i + 2] == ["hash", "table"]
               for i in range(len(t.split()) - 1))
    }
    body = {"query": {"match_phrase": {"text": "hash table"}},
            "sort": [{"nc": {"order": "asc"}}], "size": 500}
    hits = search(reader, body)["hits"]["hits"]
    nc_of = {u: nc for u, _t, _g, nc, _r in rows}
    assert {h["_id"] for h in hits} == matched
    vals = [h["sort"][0] for h in hits]
    assert vals == sorted(vals)
    # search_after resumes exactly after the cursor
    cur = hits[2]["sort"]
    body2 = dict(body, search_after=cur, size=500)
    page2 = search(reader, body2)["hits"]["hits"]
    assert [h["_id"] for h in page2] == [h["_id"] for h in hits[3:]]
    # phrase + filter + sort
    body3 = {"query": {"bool": {"must": [
        {"match_phrase": {"text": "hash table"}}], "filter": FILTER_BODY}},
        "sort": [{"nc": {"order": "asc"}}], "size": 500}
    hits3 = search(reader, body3)["hits"]["hits"]
    assert {h["_id"] for h in hits3} == matched & _allowed(rows)
    assert all(nc_of[h["_id"]] == h["sort"][0] for h in hits3)
    # highlight marks the slot terms
    corpus = spark.createDataFrame(
        [(u, t) for u, t, _g, _nc, _r in rows], "url string, text string"
    )
    resp = search(reader, {
        "query": {"match_phrase": {"text": "hash table"}}, "size": 3,
        "highlight": {"fields": {"text": {}}},
    }, corpus=corpus)
    for h in resp["hits"]["hits"]:
        assert "<em>hash</em>" in h["highlight"]["text"][0] or \
               "<em>table</em>" in h["highlight"]["text"][0]


def test_scroll_under_phrase(spark, fc_index):
    """Scroll (stateless token) over a match_phrase query: the token
    carries the phrase spec; every page rebuilds the positional matcher
    and resumes exactly (concatenated pages == sorted matched set)."""
    from engine.dsl import scroll_next, scroll_search

    out, rows = fc_index
    reader = IndexReader(spark, out)
    matched = {
        u for u, t, _g, _nc, _r in rows
        if any(t.split()[i:i + 2] == ["hash", "table"]
               for i in range(len(t.split()) - 1))
    }
    nc_of = {u: nc for u, _t, _g, nc, _r in rows}
    want = sorted(matched, key=lambda u: (nc_of[u], u))
    resp = scroll_search(
        reader,
        {"query": {"match_phrase": {"text": "hash table"}},
         "sort": [{"nc": {"order": "asc"}}]},
        size=7,
    )
    got = [h["_id"] for h in resp["hits"]["hits"]]
    while resp.get("_scroll_id"):
        resp = scroll_next(spark, resp["_scroll_id"])
        got.extend(h["_id"] for h in resp["hits"]["hits"])
    assert got == want


def test_match_fuzziness(spark, fc_index):
    """match + fuzziness=AUTO: per-token dictionary expansion (df-ordered
    50-cap) then ranked OR union; composes with filter context; fuzziness
    with operator=and or minimum_should_match raises the documented
    divergence."""
    out, rows = fc_index
    reader = IndexReader(spark, out)
    # 'hashh' (1 edit from hash) + 'tablee' (1 edit from table)
    got = search(reader, {"query": {"match": {"text": {
        "query": "hashh tablee", "fuzziness": "AUTO"}}}, "size": 300,
    })["hits"]["hits"]
    want = search(reader, {"query": {"bool": {"should": [
        {"match": {"text": "hash"}}, {"match": {"text": "table"}},
    ]}}, "size": 300})["hits"]["hits"]
    # expansions on this vocab are exactly {hash} and {table}: identical
    # matched set with identical scores (per-expansion idf rewrite)
    assert {h["_id"]: round(h["_score"], 9) for h in got} == {
        h["_id"]: round(h["_score"], 9) for h in want
    } and got
    filt = search(reader, {"query": {"bool": {
        "must": [{"match": {"text": {"query": "hashh", "fuzziness": 1}}}],
        "filter": FILTER_BODY}}, "size": 300})["hits"]["hits"]
    assert {h["_id"] for h in filt} <= _allowed(rows) and filt
    with pytest.raises(ValueError, match="operator=or only"):
        search(reader, {"query": {"match": {"text": {
            "query": "hashh", "fuzziness": 1, "operator": "and"}}}})


def test_terms_filter(spark, fc_index):
    """ES `terms` filter: field IN a fixed value set. Laws: a one-value
    terms filter == the term filter; the matched set is the UNION of the
    per-value term-filter sets with scores untouched (restriction
    identity); composes on the scoring path, the match_all/agg path, and
    with the other clause kinds; unknown docvalue fields raise."""
    out, rows = fc_index
    reader = IndexReader(spark, out)
    # single-term match: the frozen bool flatten is conjunctive over the
    # must terms, so or/and coincide only for one token — keeps this a
    # pure filter law, not a flatten-semantics test
    q = {"match": {"text": "hash"}}

    one_terms = search(reader, {"query": {"bool": {
        "must": [q], "filter": [{"terms": {"grp": ["b"]}}]}}, "size": 300})
    one_term = search(reader, {"query": {"bool": {
        "must": [q], "filter": [{"term": {"grp": "b"}}]}}, "size": 300})
    assert [(h["_id"], h["_score"]) for h in one_terms["hits"]["hits"]] == [
        (h["_id"], h["_score"]) for h in one_term["hits"]["hits"]
    ] and one_terms["hits"]["hits"]

    both = search(reader, {"query": {"bool": {
        "must": [q], "filter": [{"terms": {"grp": ["a", "b"]}}]}}, "size": 300})
    unfiltered = search(reader, {"query": q, "size": 300})
    allowed = {u for u, _t, g, _nc, _r in rows if g in ("a", "b")}
    want = [(h["_id"], h["_score"]) for h in unfiltered["hits"]["hits"]
            if h["_id"] in allowed]
    assert [(h["_id"], h["_score"]) for h in both["hits"]["hits"]] == want
    # composes with a range clause (conjunctive)
    mix = search(reader, {"query": {"bool": {"must": [q], "filter": [
        {"terms": {"grp": ["a", "b"]}}, {"range": {"nc": {"gte": 60}}},
    ]}}, "size": 300})
    allowed2 = {u for u, _t, g, nc, _r in rows if g in ("a", "b") and nc >= 60}
    assert {h["_id"] for h in mix["hits"]["hits"]} == {
        u for u, _ in want if u in allowed2}
    # match_all path (Spark predicate) agrees with the python rows
    ma = search(reader, {"query": {"bool": {"filter": [
        {"terms": {"grp": ["a", "c"]}}]}}, "size": 300,
        "track_total_hits": True})
    assert ma["hits"]["total"]["value"] == sum(
        1 for _u, _t, g, _nc, _r in rows if g in ("a", "c"))
    with pytest.raises(ValueError, match="docvalue"):
        search(reader, {"query": {"bool": {
            "must": [q], "filter": [{"terms": {"nope": ["x"]}}]}}})
