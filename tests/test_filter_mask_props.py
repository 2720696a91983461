"""Property laws for the shared docvalue filter-mask algebra
(engine/docvalues.py filter_mask) — the single predicate evaluator every
scoring kernel, agg path, and by_query matched set shares. Pure
pyarrow/numpy: no Spark session, so hypothesis can afford many examples."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.docvalues import (
    ExistsFilter,
    RangeFilter,
    TermFilter,
    TermsFilter,
    filter_mask,
)

VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d", "e"]))


@settings(max_examples=200, deadline=None)
@given(
    col=st.lists(VALS, min_size=0, max_size=40),
    values=st.lists(st.sampled_from(["a", "b", "c", "d", "e", "z"]),
                    min_size=1, max_size=5, unique=True),
)
def test_terms_is_union_of_terms(col, values):
    """TermsFilter(f, vs) == OR of TermFilter(f, v) — and nulls never
    match (ES: a missing field matches nothing)."""
    tbl = pa.table({"f": pa.array(col, type=pa.string())})
    got = filter_mask(tbl, (TermsFilter("f", tuple(values)),))
    want = np.zeros(len(col), dtype=bool)
    for v in values:
        want |= filter_mask(tbl, (TermFilter("f", v),))
    assert (got == want).all()
    nulls = np.array([c is None for c in col], dtype=bool)
    assert not (got & nulls).any()


@settings(max_examples=200, deadline=None)
@given(
    col=st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                 min_size=0, max_size=40),
    lo=st.integers(-50, 50),
    hi=st.integers(-50, 50),
)
def test_range_conjunction_and_exists(col, lo, hi):
    """RangeFilter(gte, lt) == gte-clause AND lt-clause; every clause
    mask is a subset of the ExistsFilter mask (nulls fail everything)."""
    tbl = pa.table({"f": pa.array(col, type=pa.int64())})
    both = filter_mask(tbl, (RangeFilter("f", gte=lo, lt=hi),))
    split = filter_mask(
        tbl, (RangeFilter("f", gte=lo), RangeFilter("f", lt=hi))
    )
    assert (both == split).all()
    exists = filter_mask(tbl, (ExistsFilter("f"),))
    for m in (both, split):
        assert not (m & ~exists).any()


@settings(max_examples=100, deadline=None)
@given(
    col=st.lists(VALS, min_size=0, max_size=30),
    v=st.sampled_from(["a", "b", "z"]),
)
def test_conjunction_is_intersection(col, v):
    """A multi-clause filter tuple == the AND of the per-clause masks
    (ES filter context is conjunctive)."""
    tbl = pa.table({"f": pa.array(col, type=pa.string())})
    both = filter_mask(tbl, (TermFilter("f", v), ExistsFilter("f")))
    a = filter_mask(tbl, (TermFilter("f", v),))
    b = filter_mask(tbl, (ExistsFilter("f"),))
    assert (both == (a & b)).all()
