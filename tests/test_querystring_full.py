"""Full Lucene query_string: frozen grammar parsing + scoring identity
against a brute-force tree evaluator applying the same frozen semantics
(NOT > AND > OR precedence, must/should/must_not occurs, score = sum of
matching scoring clauses x boost, leaves = the engine's frozen BM25 /
phrase / prefix / wildcard / fuzzy rewrites)."""

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
    parse_query_string,
    query_string_topk,
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


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_parser_precedence_and_occurs():
    assert parse_query_string("a AND b OR c") == (
        "bool",
        (
            (
                "should",
                (
                    "bool",
                    (
                        ("must", ("term", "a", None, 1.0)),
                        ("must", ("term", "b", None, 1.0)),
                    ),
                    1.0,
                ),
            ),
            ("should", ("term", "c", None, 1.0)),
        ),
        1.0,
    )
    # +/-/NOT attach to one clause; boosts fold into nodes
    assert parse_query_string('+a -b NOT c d^2 "x y"~1^3') == (
        "bool",
        (
            ("must", ("term", "a", None, 1.0)),
            ("must_not", ("term", "b", None, 1.0)),
            ("must_not", ("term", "c", None, 1.0)),
            ("should", ("term", "d", None, 2.0)),
            ("should", ("phrase", "x y", 1, 3.0)),
        ),
        1.0,
    )
    # group boost multiplies; field prefix accepted on the text field only
    assert parse_query_string("(a b)^2") == (
        "bool",
        (
            ("should", ("term", "a", None, 1.0)),
            ("should", ("term", "b", None, 1.0)),
        ),
        2.0,
    )
    assert parse_query_string('text:a text:"x y"') == (
        "bool",
        (
            ("should", ("term", "a", None, 1.0)),
            ("should", ("phrase", "x y", 0, 1.0)),
        ),
        1.0,
    )
    # default_operator=and makes implicit joins MUST chains
    assert parse_query_string("a b", default_operator="and") == (
        "bool",
        (
            ("must", ("term", "a", None, 1.0)),
            ("must", ("term", "b", None, 1.0)),
        ),
        1.0,
    )
    # fuzzy / prefix / wildcard leaves
    assert parse_query_string("merge~1 ha* h?sh merge~") == (
        "bool",
        (
            ("should", ("term", "merge", 1, 1.0)),
            ("should", ("prefix", "ha", 1.0)),
            ("should", ("wild", "h?sh", 1.0)),
            ("should", ("term", "merge", "auto", 1.0)),
        ),
        1.0,
    )


def test_parser_errors():
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(a b")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("a ) b")
    with pytest.raises(ValueError, match="unknown field"):
        parse_query_string("title:foo")
    with pytest.raises(ValueError, match="fuzzy"):
        parse_query_string("a.b~1")


@pytest.fixture(scope="module")
def qsf_index(spark):
    df = spark.createDataFrame(CORPUS, "url string, text string")
    out = tempfile.mkdtemp(prefix="sparkft_test_qsf_")
    build_index(spark, df, out, n_shards=3, n_buckets=4, index_options="positions")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _brute_query_string(query: str, op: str, k: int, did: dict) -> list:
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
            import itertools

            pf = 0.0
            occs = [
                [p - i for p, w in enumerate(v) if w == t]
                for i, t in enumerate(terms)
            ]
            for combo in itertools.product(*occs):
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
        return sum(idf(t) for t in terms) * sat(pf, len(v))

    def sum_score(u, terms):
        parts = [term_score(u, t) for t in terms]
        parts = [p for p in parts if p is not None]
        return sum(parts) if parts else None

    def eval_node(u, node):
        kind = node[0]
        if kind == "term":
            _, t, fuzzy, boost = node
            if fuzzy is None:
                s = term_score(u, t)
            else:
                d = fuzzy if fuzzy != "auto" else (0 if len(t) <= 2 else 1 if len(t) <= 5 else 2)
                s = sum_score(u, [w for w in vocab if _lev(w, t) <= d])
            return None if s is None else boost * s
        if kind == "prefix":
            s = sum_score(u, [w for w in vocab if w.startswith(node[1])])
            return None if s is None else node[2] * s
        if kind == "wild":
            rx = re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in node[1]
                )
            )
            s = sum_score(u, [w for w in vocab if rx.fullmatch(w)])
            return None if s is None else node[2] * s
        if kind == "phrase":
            terms = _tok(node[1])
            if len(terms) == 1:
                s = term_score(u, terms[0])
            else:
                s = phrase_score(u, terms, node[2])
            return None if s is None else node[3] * s
        _, children, boost = node
        musts = [eval_node(u, ch) for occ, ch in children if occ == "must"]
        shoulds = [eval_node(u, ch) for occ, ch in children if occ == "should"]
        nots = [eval_node(u, ch) for occ, ch in children if occ == "must_not"]
        if any(m is None for m in musts):
            return None
        matched = musts + [s for s in shoulds if s is not None]
        if not musts and not matched:
            return None
        if not matched:
            return None
        if any(s is not None for s in nots):
            return None
        return boost * sum(matched)

    root = parse_query_string(query, op)
    out = []
    for u in toks:
        s = eval_node(u, root)
        if s is not None:
            out.append((u, s))
    out.sort(key=lambda x: (-round(x[1], 6), did[x[0]]))
    return [(u, round(s, 6)) for u, s in out[:k]]


QUERIES = [
    ('("hash table"^2 OR merge) AND (ha* OR join) -gardens', "or"),
    ("hash AND table OR merge", "or"),
    ("hash table -join", "or"),
    ("hash table -join", "and"),
    ('+"hash table" sort^3', "or"),
    ("(sort OR fast) AND NOT merge", "or"),
    ('"hash table"~2 OR h?sh', "or"),
    ("merge~1 table", "and"),
    ("(hash AND join) OR (table AND club)", "or"),
    ('text:"table of" text:figures', "and"),
]


@pytest.mark.parametrize("q,op", QUERIES)
def test_qs_matches_brute(spark, qsf_index, q, op):
    r = IndexReader(spark, qsf_index)
    did = {
        x["url"]: x["doc_id"] for x in bm25_topk(r, ["hash", "table"], k=50).collect()
    }
    for x in bm25_topk(
        r, ["join", "sort", "fast", "merge", "gardens", "club", "figures"], k=50
    ).collect():
        did.setdefault(x["url"], x["doc_id"])
    want = _brute_query_string(q, op, 10, did)
    got = [
        (x["url"], round(x["score"], 6))
        for x in query_string_topk(r, q, k=10, default_operator=op).collect()
    ]
    assert got == want, (q, op, got, want)


def test_qs_local_spark_identical(spark, qsf_index):
    r = IndexReader(spark, qsf_index)
    q = '("hash table" OR merge) AND ha* -gardens'
    a = [
        (x["url"], round(x["score"], 9))
        for x in query_string_topk(r, q, k=8, execution="local").collect()
    ]
    b = [
        (x["url"], round(x["score"], 9))
        for x in query_string_topk(r, q, k=8, execution="spark").collect()
    ]
    assert a == b and a


def test_qs_flat_or_matches_sqs(spark, qsf_index):
    # a flat OR of terms/phrase/prefix with a -term is exactly the
    # simple_query_string semantics: the two engines must rank-agree
    r = IndexReader(spark, qsf_index)
    q = '"hash table" join -merge has*'
    a = [
        (x["url"], round(x["score"], 9))
        for x in query_string_topk(r, q, k=8).collect()
    ]
    b = [
        (x["url"], round(x["score"], 9))
        for x in simple_query_string_topk(r, q, k=8).collect()
    ]
    assert a == b and a


def test_qs_boost_scales_scores(spark, qsf_index):
    r = IndexReader(spark, qsf_index)
    base = {x["url"]: x["score"] for x in query_string_topk(r, "merge", k=10).collect()}
    double = {
        x["url"]: x["score"]
        for x in query_string_topk(r, "merge^2", k=10).collect()
    }
    assert set(base) == set(double) and base
    for u, s in base.items():
        assert double[u] == pytest.approx(2 * s, rel=1e-12)


def test_qs_pure_negation_rejected(spark, qsf_index):
    r = IndexReader(spark, qsf_index)
    with pytest.raises(ValueError, match="positive clause"):
        query_string_topk(r, "-hash NOT table")


def test_qs_unknown_terms(spark, qsf_index):
    r = IndexReader(spark, qsf_index)
    # unknown SHOULD drops; unknown MUST empties
    assert query_string_topk(r, "zzzmissing OR hash", k=5).count() > 0
    assert query_string_topk(r, "zzzmissing AND hash", k=5).count() == 0
    assert query_string_topk(r, "zzz* AND hash", k=5).count() == 0


def test_dsl_query_string_dispatch(spark, qsf_index):
    from engine.dsl import search

    r = IndexReader(spark, qsf_index)
    q = '("hash table" OR merge) AND ha*'
    body = {"query": {"query_string": {"query": q}}, "size": 6}
    resp = search(r, body)
    want = [
        (x["url"], round(x["score"], 9))
        for x in query_string_topk(r, q, k=6).collect()
    ]
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == want
