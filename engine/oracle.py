"""Pure-Python/numpy brute-force BM25 oracle (SURVEY.md 5.4).

This is the rank-identity judge for the Spark engine: exact dl (no lossy
norm byte), Lucene idf ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75, ties
broken by doc_id ascending. Shares the frozen analyzer with the engine
(engine.textnorm.standard_tokenize_py over lowercased text) so both sides
tokenize identically by construction.
"""

from __future__ import annotations

import math
from collections import Counter

from engine.textnorm import standard_tokenize_py

K1 = 1.2
B = 0.75


def analyze_query_py(text: str) -> list[str]:
    """Frozen query analyzer: standard tokenize over lowercase, dedupe
    preserving first-seen order (a repeated query term scores once)."""
    seen, out = set(), []
    for t in standard_tokenize_py(text.lower()):
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


class Bm25Oracle:
    def __init__(self, docs: list[tuple[int, str]], k1: float = K1, b: float = B):
        """docs: (doc_id, text) for VALID docs only (nulls/empties already
        filtered, mirroring the engine's reject stage)."""
        self.k1, self.b = k1, b
        self.doc_ids: list[int] = []
        self.tfs: list[Counter] = []
        self.dls: list[int] = []
        self.df: Counter = Counter()
        for doc_id, text in docs:
            toks = standard_tokenize_py(text.lower())
            c = Counter(toks)
            self.doc_ids.append(doc_id)
            self.tfs.append(c)
            self.dls.append(len(toks))
            self.df.update(c.keys())
        self.n_docs = len(self.doc_ids)
        self.avgdl = (sum(self.dls) / self.n_docs) if self.n_docs else 0.0
        self.vocab = sorted(self.df.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def expand_prefix(self, prefix: str) -> list[str]:
        """Prefix query rewrite: all dictionary terms with the prefix
        (ES scoring_boolean-style rewrite, frozen spec)."""
        return [t for t in self.vocab if t.startswith(prefix)]

    def expand_wildcard(self, pattern: str, max_expansions: int = 128) -> list[str]:
        """Wildcard rewrite (`*`/`?` only), brute force over the dictionary:
        df desc / term asc, capped — the judge for IndexReader.expand_wildcard."""
        import re as _re

        rx = _re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else _re.escape(c)
                    for c in pattern)
        )
        pairs = [(t, self.df[t]) for t in self.vocab if rx.fullmatch(t)]
        pairs.sort(key=lambda x: (-x[1], x[0]))
        return [t for t, _ in pairs[:max_expansions]]

    def expand_regexp(self, pattern: str, max_expansions: int = 128) -> list[str]:
        """Anchored-regex rewrite, brute force over the dictionary:
        df desc / term asc, capped — the judge for IndexReader.expand_regexp."""
        import re as _re

        rx = _re.compile(pattern)
        pairs = [(t, self.df[t]) for t in self.vocab if rx.fullmatch(t)]
        pairs.sort(key=lambda x: (-x[1], x[0]))
        return [t for t, _ in pairs[:max_expansions]]

    def expand_fuzzy(
        self, term: str, max_edits: int | None = None, max_expansions: int = 50,
        prefix_length: int = 0,
    ) -> list[str]:
        """Fuzzy query rewrite, brute force: dictionary terms within classic
        Levenshtein distance (full O(nm) DP — no banding shortcuts, this is
        the judge), df desc / term asc, capped. max_edits=None = ES AUTO."""
        q = term
        if max_edits is None:
            max_edits = 0 if len(q) <= 2 else (1 if len(q) <= 5 else 2)
        if max_edits == 0:
            return [q] if self.df.get(q) else []

        def dist(a: str, b: str) -> int:
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        pref = q[:prefix_length]
        pairs = [
            (t, self.df[t])
            for t in self.vocab
            if t.startswith(pref) and dist(q, t) <= max_edits
        ]
        pairs.sort(key=lambda x: (-x[1], x[0]))
        return [t for t, _ in pairs[:max_expansions]]

    def topk(self, terms: list[str], k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        """Top-k (doc_id, score), score desc then doc_id asc. mode='and'
        keeps only docs containing every query term (conjunctive filter,
        same scoring)."""
        terms = [t for t in dict.fromkeys(terms) if self.df.get(t)]
        if not terms:
            return []
        idfs = {t: self.idf(t) for t in terms}
        scored: list[tuple[float, int]] = []
        for i in range(self.n_docs):
            tf = self.tfs[i]
            hit = [t for t in terms if t in tf]
            if not hit or (mode == "and" and len(hit) != len(terms)):
                continue
            dl = self.dls[i]
            norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            s = sum(idfs[t] * tf[t] / (tf[t] + norm) for t in hit)
            scored.append((s, self.doc_ids[i]))
        scored.sort(key=lambda p: (-p[0], p[1]))
        return [(d, s) for s, d in scored[:k]]
