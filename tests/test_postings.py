"""Round-trip + property tests for the posting codec (SURVEY.md 5.3 item 1)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import postings as P


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=600))
@settings(max_examples=200, deadline=None)
def test_svb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint32)
    assert np.array_equal(P.svb_decode(P.svb_encode(arr), len(vals)), arr)


def test_svb_sizes():
    # 4 small values: 1 control byte + 4 data bytes
    assert len(P.svb_encode(np.array([1, 2, 3, 4], dtype=np.uint32))) == 5
    assert len(P.svb_encode(np.array([2**31], dtype=np.uint32))) == 1 + 4
    assert P.svb_encode(np.array([], dtype=np.uint32)) == b""


@given(
    st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=1000, unique=True),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_term_postings_roundtrip(doc_ids, tf_cap):
    doc_ids = np.sort(np.array(doc_ids, dtype=np.int64))
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, tf_cap + 1, size=doc_ids.size).astype(np.uint32)
    dls = rng.integers(1, 500, size=doc_ids.size).astype(np.uint32)
    avgdl = 123.4
    enc = P.encode_term_postings(doc_ids, tfs, dls, avgdl)
    d, t, l = P.decode_term_postings(enc["docs_bin"], enc["tfs_bin"], enc["dls_bin"], enc["blocks"])
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    assert enc["df"] == doc_ids.size
    assert enc["cf"] == int(tfs.sum())
    # block metadata invariants: coverage, ordering, block-max dominance
    impacts = P.bm25_impact(tfs, dls, avgdl)
    pos = 0
    for i, blk in enumerate(enc["blocks"]):
        first, last, n, *_offs, mi = blk
        bd, bt, bl = P.decode_block(enc["docs_bin"], enc["tfs_bin"], enc["dls_bin"], enc["blocks"], i)
        assert bd[0] == first and bd[-1] == last and bd.size == n
        assert np.array_equal(bd, doc_ids[pos : pos + n])
        blk_imp = impacts[pos : pos + n]
        assert mi == pytest.approx(blk_imp.max(), abs=0)
        assert (blk_imp <= mi + 1e-15).all()
        pos += n
    assert pos == doc_ids.size


def test_idf_matches_lucene_formula():
    assert P.bm25_idf(1, 2) == pytest.approx(np.log(1 + (2 - 1 + 0.5) / 1.5))
    assert P.bm25_idf(10, 10) == pytest.approx(np.log(1 + 0.5 / 10.5))
