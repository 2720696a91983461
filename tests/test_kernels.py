"""Property-based equivalence of the three query kernels over random
posting sets: the vectorized block-max kernel (the scale path) must return
exactly what brute-force TAAT returns — same docs, bit-identical scores
(both accumulate per-doc contributions in term order via np.bincount) —
and the classic cursor WAND must agree on ranks/scores to fp tolerance."""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import postings as P
from engine.query import _bmw_shard_topk, _taat_shard_topk, _wand_shard_topk

Row = namedtuple("Row", ["term", "docs_bin", "tfs_bin", "dls_bin", "blocks"])


def _mk_rows(term_specs, avgdl):
    rows = []
    for name, doc_ids in term_specs:
        doc_ids = np.array(sorted(set(doc_ids)), dtype=np.int64)
        if doc_ids.size == 0:
            continue
        rng = np.random.default_rng(len(name) + doc_ids.size)
        tfs = rng.integers(1, 9, size=doc_ids.size).astype(np.uint32)
        dls = rng.integers(5, 200, size=doc_ids.size).astype(np.uint32)
        enc = P.encode_term_postings(doc_ids, tfs, dls, avgdl)
        rows.append(Row(name, enc["docs_bin"], enc["tfs_bin"], enc["dls_bin"], enc["blocks"]))
    return rows


@given(
    lists=st.lists(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=400),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=15),
)
@settings(max_examples=40, deadline=None)
def test_bmw_identical_to_taat(lists, k):
    avgdl, k1, b = 100.0, P.K1, P.B
    specs = [(f"t{i}", ids) for i, ids in enumerate(lists)]
    rows = _mk_rows(specs, avgdl)
    if not rows:
        return
    idfs = {r.term: 1.0 + 0.37 * i for i, r in enumerate(rows)}
    bmw = _bmw_shard_topk(rows, idfs, k, k1, b, avgdl)
    taat = _taat_shard_topk(rows, idfs, k, k1, b, avgdl, "or")
    assert sorted(bmw) == sorted(taat)  # exact: same accumulation order


@given(
    lists=st.lists(
        st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=300),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=25, deadline=None)
def test_cursor_wand_agrees(lists, k):
    avgdl, k1, b = 100.0, P.K1, P.B
    specs = [(f"t{i}", ids) for i, ids in enumerate(lists)]
    rows = _mk_rows(specs, avgdl)
    if not rows:
        return
    idfs = {r.term: 1.0 + 0.37 * i for i, r in enumerate(rows)}
    daat = sorted(_wand_shard_topk(rows, idfs, k, k1, b, avgdl))
    taat = sorted(_taat_shard_topk(rows, idfs, k, k1, b, avgdl, "or"))
    assert [d for d, _ in daat] == [d for d, _ in taat]
    for (_, s1), (_, s2) in zip(daat, taat):
        assert s1 == pytest.approx(s2, rel=1e-12)
