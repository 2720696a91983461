"""simple_query_string: frozen grammar parsing + scoring identity against
a brute-force evaluator that applies the same frozen spec (term = BM25,
phrase = pseudo-term phrase score, prefix = scoring_boolean expansion,
positive-clause score sum, AND hit mask, must_not exclusion)."""

from __future__ import annotations

import math
import re
import shutil
import tempfile

import pytest

from engine import postings as P
from engine.index_build import build_index
from engine.query import IndexReader, bm25_topk
from engine.querystring import (
    Clause,
    parse_simple_query_string,
    simple_query_string_topk,
)

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
    ("u13", "hastily hasty hassle words sharing a prefix with hash"),
]


def _tok(s: str) -> list[str]:
    return re.findall(r"\w+", s.lower())


def test_parser_grammar():
    got = parse_simple_query_string('"hash table"~2 join -scan fa* -"sort merge"')
    assert got == [
        Clause(False, "phrase", ("hash", "table"), 2),
        Clause(False, "term", ("join",)),
        Clause(True, "term", ("scan",)),
        Clause(False, "prefix", ("fa",)),
        Clause(True, "phrase", ("sort", "merge"), 0),
    ]
    # operators outside the frozen flag set analyze away; 1-token phrase
    # degrades to a term; empty tokens drop; a.b* splits
    assert parse_simple_query_string('(a | b) +c "d" - * x.y*') == [
        Clause(False, "term", ("a",)),
        Clause(False, "term", ("b",)),
        Clause(False, "term", ("c",)),
        Clause(False, "term", ("d",)),
        Clause(False, "term", ("x",)),
        Clause(False, "prefix", ("y",)),
    ]


@pytest.fixture(scope="module")
def qs_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string")
    out = tempfile.mkdtemp(prefix="sparkft_test_qs_")
    build_index(spark, df, out, n_shards=3, n_buckets=4, index_options="positions")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _brute_sqs(query: str, and_mode: bool, k: int, did: dict) -> list:
    toks = {u: _tok(t) for u, t in CORPUS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    vocab = sorted({t for v in toks.values() for t in v})

    def idf(t):
        df = sum(1 for v in toks.values() if t in v)
        return math.log(1 + (n - df + 0.5) / (df + 0.5)) if df else 0.0

    def sat(tf, dl):
        return tf / (tf + K1 * (1 - B + B * dl / avgdl))

    def term_score(u, t):
        tf = toks[u].count(t)
        return idf(t) * sat(tf, len(toks[u])) if tf else None

    def phrase_score(u, terms, slop):
        v = toks[u]
        m = len(terms)
        if slop == 0:
            pf = float(
                sum(1 for i in range(len(v) - m + 1) if v[i : i + m] == list(terms))
            )
        else:
            # combinatorial span count, 1/(1+span) weights (frozen spec)
            import itertools

            pf = 0.0
            occs = [
                [p - i for p, w in enumerate(v) if w == t]
                for i, t in enumerate(terms)
            ]
            for combo in itertools.product(*occs):
                # pairwise-distinct absolute positions for duplicate terms
                abs_pos = [a + i for i, a in enumerate(combo)]
                if len(set(abs_pos)) < len(abs_pos):
                    dup = False
                    for i in range(m):
                        for j in range(i):
                            if terms[i] == terms[j] and abs_pos[i] == abs_pos[j]:
                                dup = True
                    if dup:
                        continue
                span = max(combo) - min(combo)
                if span <= slop:
                    pf += 1.0 / (1 + span)
            if pf == 0.0:
                return None
        if pf == 0.0:
            return None
        return sum(idf(t) for t in terms) * sat(pf, len(v))

    def clause_score(u, c: Clause):
        if c.kind == "term":
            return term_score(u, c.terms[0])
        if c.kind == "prefix":
            parts = [
                term_score(u, t) for t in vocab if t.startswith(c.terms[0])
            ]
            parts = [p for p in parts if p is not None]
            return sum(parts) if parts else None
        return phrase_score(u, c.terms, c.slop)

    clauses = parse_simple_query_string(query)
    pos = [c for c in clauses if not c.neg]
    neg = [c for c in clauses if c.neg]
    out = []
    for u in toks:
        ss = [clause_score(u, c) for c in pos]
        matched = [s for s in ss if s is not None]
        if not matched:
            continue
        if and_mode and len(matched) < len(pos):
            continue
        if any(clause_score(u, c) is not None for c in neg):
            continue
        out.append((u, sum(matched)))
    out.sort(key=lambda x: (-round(x[1], 6), did[x[0]]))
    return [(u, round(s, 6)) for u, s in out[:k]]


QUERIES = [
    ('"hash table" join', "or"),
    ('"hash table" join', "and"),
    ('"hash table"~2 -merge', "or"),
    ("hash -\"hash table\"", "or"),
    ("has* table", "or"),
    ("has* table", "and"),
    ("fast sort -join", "or"),
    ('"table of" merge', "and"),
]


@pytest.mark.parametrize("q,op", QUERIES)
def test_sqs_matches_brute(spark, qs_index, q, op):
    r = IndexReader(spark, qs_index)
    did = {
        x["url"]: x["doc_id"] for x in bm25_topk(r, ["hash", "table"], k=50).collect()
    }
    # docs without hash/table need ids too: use a second broad query
    for x in bm25_topk(r, ["join", "sort", "fast", "merge", "gardens"], k=50).collect():
        did.setdefault(x["url"], x["doc_id"])
    want = _brute_sqs(q, op == "and", 10, did)
    got = [
        (x["url"], round(x["score"], 6))
        for x in simple_query_string_topk(r, q, k=10, default_operator=op).collect()
    ]
    assert got == want, (q, op, got, want)


def test_sqs_local_spark_identical(spark, qs_index):
    r = IndexReader(spark, qs_index)
    q = '"hash table" join -merge has*'
    a = [
        (x["url"], round(x["score"], 9))
        for x in simple_query_string_topk(r, q, k=8, execution="local").collect()
    ]
    b = [
        (x["url"], round(x["score"], 9))
        for x in simple_query_string_topk(r, q, k=8, execution="spark").collect()
    ]
    assert a == b and a


def test_sqs_pure_negation_rejected(spark, qs_index):
    r = IndexReader(spark, qs_index)
    with pytest.raises(ValueError, match="positive clause"):
        simple_query_string_topk(r, "-hash -table")


def test_sqs_unknown_term_and_empties(spark, qs_index):
    r = IndexReader(spark, qs_index)
    # OR: unknown term drops, rest still scores
    got = simple_query_string_topk(r, "zzzmissing hash", k=5).collect()
    assert got
    # AND: unknown term -> empty
    assert (
        simple_query_string_topk(
            r, "zzzmissing hash", k=5, default_operator="and"
        ).count()
        == 0
    )
    # prefix with no expansion behaves the same
    assert (
        simple_query_string_topk(
            r, "zzz* hash", k=5, default_operator="and"
        ).count()
        == 0
    )


def test_dsl_sqs_dispatch_identity(spark, qs_index):
    from engine.dsl import search

    r = IndexReader(spark, qs_index)
    body = {
        "query": {
            "simple_query_string": {
                "query": '"hash table" -merge jo*',
                "default_operator": "or",
            }
        },
        "size": 6,
    }
    resp = search(r, body)
    want = [
        (x["url"], round(x["score"], 9))
        for x in simple_query_string_topk(
            r, '"hash table" -merge jo*', k=6
        ).collect()
    ]
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == want
