"""ES `simple_query_string` — the search-box query language.

A reference-index user's free-text search box sends
`simple_query_string` bodies (reference parity: the ES _search endpoint
the loader's index serves — config/search_scheme.json declares the
analyzed fields such a search box queries). This module
parses the query text and evaluates it with the engine's existing
kernels — nothing here rescans postings its own way.

Frozen spec (the supported ES flag subset, all divergences explicit):

- flags = PHRASE | PREFIX | NOT | WHITESPACE. As in ES with the other
  flags disabled, the remaining operator characters (`+`, `|`, `(`,
  `)`, `~` outside a phrase) are NOT special: they go to the analyzer,
  which strips them. `default_operator` ("or"/"and") combines clauses
  exactly as in ES.
- clause grammar, per whitespace token: a leading `-` negates the
  clause (ES must_not: pure exclusion, never scores); `"quoted text"`
  with an optional `~N` suffix is a phrase clause with slop N;
  `token*` is a prefix clause; anything else analyzes into term
  clauses (one clause per analyzed token — the frozen analyzer can
  split a raw token, e.g. "a.b" -> two clauses, matching ES's
  per-token boolean expansion).
- scoring: term clause = BM25; phrase clause = the engine's frozen
  pseudo-term phrase score (match_phrase / sloppy-span semantics,
  engine/query.py _phrase_freqs); prefix clause = ranked union over
  the df-ordered dictionary expansion (scoring_boolean, the same
  frozen rewrite as bm25_topk mode="prefix", max_expansions-capped).
  A doc's score is the SUM of its matching positive clauses' scores;
  with default_operator "and" a doc must match EVERY positive clause.
- a query with no positive clause raises (ES rewrites `-foo` alone to
  match_all + must_not; an unscored full scan belongs to the
  docvalue/filter path, documented divergence).
- a prefix with no dictionary expansion, or a term absent from the
  dictionary, matches nothing: dropped under "or", empty result under
  "and" (ES conjunction semantics), always dropped when negated.

Scale shape: identical to the phrase/bool kernels — per-shard numpy
kernels over pruned posting reads (bucket partition filter + term
row-group pushdown), local in-process for small queries, ONE Spark
scatter-gather for head terms; only per-shard top-k rows leave the
executors, and the docmap lookup is pruned to the winners.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np
import pandas as pd

from engine import postings as P
from engine.query import (
    IndexReader,
    _empty_topk,
    _finalize_topk,
    _live_mask,
    _norm_blocks,
    _phrase_freqs,
    _require_positions,
    _topk_order,
)
from engine.textnorm import standard_tokenize_py


class Clause(NamedTuple):
    neg: bool
    kind: str  # "term" | "prefix" | "phrase"
    terms: tuple  # term clause: (term,); prefix: (stem,); phrase: slot terms
    slop: int = 0


_TOKEN_RE = re.compile(r'-?"[^"]*"(?:~\d+)?|\S+')
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')


def parse_simple_query_string(query: str) -> list[Clause]:
    """Tokenize the query text into clauses per the frozen grammar.
    Tokens that analyze to nothing (pure punctuation, lone operators)
    are dropped; a 1-token phrase degrades to a term clause (ES)."""
    out: list[Clause] = []
    for m in _TOKEN_RE.finditer(query):
        tok = m.group(0)
        neg = tok.startswith("-") and len(tok) > 1
        if neg:
            tok = tok[1:]
        pm = _PHRASE_RE.match(tok)
        if pm:
            toks = standard_tokenize_py(pm.group(1).lower())
            if not toks:
                continue
            if len(toks) == 1:
                out.append(Clause(neg, "term", (toks[0],)))
            else:
                out.append(
                    Clause(neg, "phrase", tuple(toks), int(pm.group(2) or 0))
                )
            continue
        is_prefix = tok.endswith("*") and len(tok) > 1
        if is_prefix:
            tok = tok[:-1]
        toks = standard_tokenize_py(tok.lower())
        if not toks:
            continue
        if is_prefix:
            # "a.b*" -> term clause 'a' + prefix clause 'b'
            out.extend(Clause(neg, "term", (t,)) for t in toks[:-1])
            out.append(Clause(neg, "prefix", (toks[-1],)))
        else:
            out.extend(Clause(neg, "term", (t,)) for t in toks)
    return out


# kernel-facing clause specs (plain tuples: picklable into applyInPandas)
#   ("sum", ((term, idf), ...))        term / prefix-expansion clause
#   ("phrase", slots, slop, idf_sum)   phrase clause; slots = ((t,), ...)


def _clause_eval(spec, by_row, freq, dels):
    """(docs, scores) of one clause within a shard — docs unique per
    clause (the AND hit-counting invariant). Empty arrays = no match."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if spec[0] == "sum":
        dparts, sparts = [], []
        for t, idf, k1, b, avgdl in spec[1]:
            got = freq(t)
            if got is None:
                continue
            d, tf, dl = got
            dparts.append(d)
            sparts.append(idf * P.bm25_impact(tf, dl, avgdl, k1, b))
        if not dparts:
            return empty
        if len(dparts) == 1:  # single term: postings are unique per doc
            return dparts[0], sparts[0]
        locs = np.concatenate(dparts)
        uniq, inv = np.unique(locs, return_inverse=True)
        return uniq, np.bincount(
            inv, weights=np.concatenate(sparts), minlength=uniq.size
        )
    _, slots, slop, idf_sum, k1, b, avgdl = spec
    terms = list(dict.fromkeys(t for s in slots for t in s))
    rows = [by_row[t] for t in terms if t in by_row]
    if len(rows) < len(terms):  # conjunctive: a slot term absent here
        return empty
    got = _phrase_freqs(rows, [list(s) for s in slots], slop, dels)
    if got is None:
        return empty
    by_term, match_docs, pf = got
    # dl lookup from the first slot term carrying each matched doc
    # (same scheme as engine/query.py _phrase_score_rows)
    dl = np.zeros(match_docs.size, dtype=np.float64)
    found = np.zeros(match_docs.size, dtype=bool)
    for t in terms:
        docs, _tfs, dls, _pos, _occ = by_term[t]
        j = np.searchsorted(docs, match_docs)
        np.minimum(j, docs.size - 1, out=j)
        hit = (~found) & (docs[j] == match_docs)
        dl[hit] = dls[j[hit]]
        found |= hit
        if found.all():
            break
    scores = idf_sum * (pf / (pf + k1 * (1.0 - b + b * dl / avgdl)))
    return match_docs, scores


def _sqs_shard_topk(
    rows, pos_specs, neg_specs, and_mode: bool, k: int, dels
) -> list[tuple[int, float]]:
    """Per-shard simple_query_string kernel: evaluate each clause with
    the shared decode/phrase cores, sum matching positive clause scores,
    apply the AND hit-count mask and the must_not exclusion, top-k.
    Vectorized like the bool kernel: np.unique/bincount accumulation,
    searchsorted hit counting, no per-doc Python."""
    by_row: dict[str, object] = {}
    for r in rows:
        by_row[r.term] = r
    cache: dict[str, tuple | None] = {}

    def freq(t):
        if t not in cache:
            r = by_row.get(t)
            if r is None:
                cache[t] = None
            else:
                d, tf, dl = P.decode_term_postings(
                    r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
                )
                keep = _live_mask(d, dels)
                if keep is not None:
                    d, tf, dl = d[keep], tf[keep], dl[keep]
                cache[t] = (d, tf, dl)
        return cache[t]

    doc_parts, score_parts = [], []
    for spec in pos_specs:
        d, s = _clause_eval(spec, by_row, freq, dels)
        if d.size == 0:
            if and_mode:  # docs live in one shard: conjunction dead here
                return []
            continue
        doc_parts.append(d)
        score_parts.append(s)
    if not doc_parts:
        return []
    locs = np.concatenate(doc_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    scores = np.bincount(
        inv, weights=np.concatenate(score_parts), minlength=uniq.size
    )
    keep = np.ones(uniq.size, dtype=bool)
    if and_mode and len(doc_parts) > 1:
        hits = np.zeros(uniq.size, dtype=np.int64)
        for d in doc_parts:
            hits[np.searchsorted(uniq, d)] += 1
        keep &= hits == len(doc_parts)
    excl_parts = []
    for spec in neg_specs:
        d, _s = _clause_eval(spec, by_row, freq, dels)
        if d.size:
            excl_parts.append(d)
    if excl_parts:
        keep &= ~np.isin(uniq, np.concatenate(excl_parts))
    uniq, scores = uniq[keep], scores[keep]
    if uniq.size == 0:
        return []
    order = _topk_order(uniq, scores, min(k, uniq.size))
    return [(int(uniq[i]), float(scores[i])) for i in order]


def simple_query_string_topk(
    reader: IndexReader,
    query: str,
    k: int = 10,
    default_operator: str = "or",
    max_expansions: int = 50,
    execution: str = "auto",
    lookup: str = "auto",
):
    """Top-k (url, doc_id, score) for a simple_query_string body — see
    the module docstring for the frozen grammar and scoring spec."""
    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be or/and, got {default_operator!r}")
    and_mode = default_operator == "and"
    clauses = parse_simple_query_string(query)
    if not any(not c.neg for c in clauses):
        raise ValueError(
            "simple_query_string needs at least one positive clause "
            "(pure negation is served by the filter path, frozen divergence)"
        )
    if any(c.kind == "phrase" for c in clauses):
        _require_positions(reader, "simple_query_string (phrase clause)")

    # dictionary work on the driver: prefix expansion + global idfs
    expanded: list[tuple[Clause, tuple[str, ...]]] = []
    for c in clauses:
        terms = (
            reader.expand_prefix(c.terms[0], max_expansions)
            if c.kind == "prefix"
            else list(c.terms)
        )
        expanded.append((c, tuple(terms)))
    stats = reader.term_stats(
        list(dict.fromkeys(t for _c, ts in expanded for t in ts))
    )
    n_docs, k1, b, avgdl = reader.n_docs, reader.k1, reader.b, reader.avgdl

    pos_specs, neg_specs = [], []
    for c, terms in expanded:
        if c.kind == "phrase":
            if any(t not in stats for t in terms):
                # a slot term absent from the dictionary: never matches
                if c.neg:
                    continue
                if and_mode:
                    return _empty_topk(reader.spark)
                continue
            idf_sum = float(sum(P.bm25_idf(stats[t], n_docs) for t in terms))
            spec = (
                "phrase", tuple((t,) for t in terms), c.slop, idf_sum,
                k1, b, avgdl,
            )
        else:
            known = [(t, float(P.bm25_idf(stats[t], n_docs)), k1, b, avgdl)
                     for t in terms if t in stats]
            if not known:
                if c.neg:
                    continue
                if and_mode:
                    return _empty_topk(reader.spark)
                continue
            spec = ("sum", tuple(known))
        (neg_specs if c.neg else pos_specs).append(spec)
    if not pos_specs:
        return _empty_topk(reader.spark)

    needs_pos = any(s[0] == "phrase" for s in pos_specs + neg_specs)
    distinct = list(dict.fromkeys(
        t
        for s in pos_specs + neg_specs
        for t in (
            [x[0] for x in s[1]] if s[0] == "sum"
            else [t for slot in s[1] for t in slot]
        )
    ))
    tomb = reader.tombstones()

    def run_kernel(rows: list, dels) -> list[tuple[int, float]]:
        return _sqs_shard_topk(rows, pos_specs, neg_specs, and_mode, k, dels)

    heap_rows: list[tuple[int, int, float]] | None = None
    total_postings = sum(stats.get(t, 0) for t in distinct)
    if execution == "local" or (
        execution == "auto" and total_postings <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = (
            reader.postings_pos_local(distinct)
            if needs_pos
            else reader.postings_local(distinct)
        )
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard))
            ]
    if heap_rows is None:

        def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            top = run_kernel(list(pdf.itertuples()), tomb.get(int(pdf_key[0])))
            return pd.DataFrame(
                {
                    "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                    "local_id": np.array([t[0] for t in top], dtype=np.int64),
                    "score": np.array([t[1] for t in top], dtype=np.float64),
                }
            )

        per_shard = (
            reader.postings(distinct)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return _empty_topk(reader.spark)
    return reader.spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )
