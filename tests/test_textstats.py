"""Edge-case tests for the training-data text ops (engine/textstats.py).

The sf0.01 driver oracle covers these ops end-to-end against DuckDB; this
file pins the frozen boundary semantics on crafted rows: sub-2-token docs
(no bigrams), fully-repetitive docs, scrub order and pattern edges.
"""

from __future__ import annotations

import pytest

from engine.textstats import pii_scrub, repetition_stats


@pytest.fixture(scope="module")
def rep_rows(spark):
    rows = [
        (1, "a a a a"),            # one repeated token: top bigram 'a a' x3
        (2, "x"),                  # single token: no bigrams, frac 0
        (3, "u v w"),              # all distinct: every bigram count 1
        (4, "go go stop go go"),   # 'go go' twice among 4 bigrams
        (5, ""),                   # empty: filtered out entirely
        (6, None),                 # null: filtered out entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in repetition_stats(df).collect()
    }
    return out


def test_repetition_stats_edges(rep_rows):
    assert set(rep_rows) == {1, 2, 3, 4}  # empty/null rows dropped
    r1 = rep_rows[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["top_bigram_cnt"]) == (4, 1, 3)
    assert r1["distinct_ratio"] == 0.25
    assert r1["top_bigram_frac"] == 1.0  # 3 / (4 - 1)
    r2 = rep_rows[2]
    assert (r2["n_tokens"], r2["top_bigram_cnt"], r2["top_bigram_frac"]) == (1, 0, 0.0)
    r3 = rep_rows[3]
    assert (r3["n_distinct"], r3["top_bigram_cnt"]) == (3, 1)
    r4 = rep_rows[4]
    assert r4["top_bigram_cnt"] == 2
    assert r4["top_bigram_frac"] == 0.5  # 2 / (5 - 1)


def test_pii_scrub_order_and_counts(spark):
    rows = [
        (1, "mail a.b@x.co and b_c@y.org now"),
        (2, "call 555-123-4567 or 555 987 6543"),
        (3, "both: u@example.com / 111-222-3333"),
        (4, "none here, 12-34 is not a phone, a@b is not an email"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert got[1]["scrubbed"] == "mail [EMAIL] and [EMAIL] now"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert got[2]["scrubbed"] == "call [PHONE] or [PHONE]"
    assert got[3]["scrubbed"] == "both: [EMAIL] / [PHONE]"
    assert (got[4]["n_emails"], got[4]["n_phones"]) == (0, 0)
    assert got[4]["scrubbed"] == rows[3][1]


def test_sample_stratified_deterministic_and_monotone(spark):
    """Frozen sampling properties: re-runs select the SAME docs; raising
    a rate only ADDS docs; keep fraction tracks the rate; keys without a
    rate drop entirely."""
    from engine.textstats import sample_stratified

    rows = [(i, "en" if i % 2 else "de", "t") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {r["doc_id"] for r in sample_stratified(df, {"en": 0.3}).collect()}
    b = {r["doc_id"] for r in sample_stratified(df, {"en": 0.3}).collect()}
    assert a == b  # reproducible
    c = {r["doc_id"] for r in sample_stratified(df, {"en": 0.6}).collect()}
    assert a < c  # monotone: higher rate is a superset
    n_en = sum(1 for i in range(10_000) if i % 2)
    assert abs(len(a) / n_en - 0.3) < 0.03
    assert all(i % 2 for i in a)  # de (no rate) fully dropped


def test_pack_token_budget_invariants(spark):
    """Packing: bins are consecutive per group, offsets equal the
    exclusive prefix sum mod budget, and every doc's first token falls in
    its bin (offset < budget)."""
    from engine.textstats import pack_token_budget

    rows = [
        (i, "g1" if i < 6 else "g2", "w " * (10 * (i + 1)))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_token_budget(df, budget=50, group_col="source")
    got = sorted(
        (r["source"], r["doc_id"], r["n_tokens"], r["bin"], r["offset_in_bin"])
        for r in out.collect()
    )
    for grp in ("g1", "g2"):
        excl = 0
        for g, _i, n, b, off in [x for x in got if x[0] == grp]:
            assert b == excl // 50 and off == excl % 50, (g, _i)
            assert off < 50
            excl += n


def test_unigram_perplexity_brute_twin(spark):
    """unigram_perplexity vs an independent Counter/math recomputation:
    exact ppl values, tertile bucketing, null/empty filtering, and the
    repetitious-doc-fits-the-LM-better invariant."""
    import math
    from collections import Counter

    from engine.textstats import unigram_perplexity

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the the the"),        # head: all mass on 'the'
        (3, "zq xv wk jm qq pz"),              # tail: all hapaxes
        (4, "the cat ate the rat"),
        (5, "on the mat sat a cat"),
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_perplexity(df).collect()}
    assert set(got) == {1, 2, 3, 4, 5}

    toks = {i: t.lower().split() for i, t in rows[:5]}
    lm = Counter(w for ws in toks.values() for w in ws)
    T, V, a = sum(lm.values()), len(lm), 0.5
    want = {
        i: round(
            math.exp(
                -sum(math.log((lm[w] + a) / (T + a * V)) for w in ws) / len(ws)
            ),
            6,
        )
        for i, ws in toks.items()
    }
    for i, w in want.items():
        assert got[i]["ppl"] == pytest.approx(w, abs=1e-6), i
        assert got[i]["n_tokens"] == len(toks[i])
    # tertile buckets: exact interpolated 1/3 and 2/3 cutpoints
    import numpy as np

    ppls = sorted(want.values())
    c1 = round(float(np.percentile(ppls, 100 / 3, method="linear")), 6)
    c2 = round(float(np.percentile(ppls, 200 / 3, method="linear")), 6)
    for i in want:
        exp_bucket = (
            "head" if want[i] <= c1 else "middle" if want[i] <= c2 else "tail"
        )
        assert got[i]["bucket"] == exp_bucket, i
    # the all-stopword doc fits the LM best; the all-hapax doc worst
    assert got[2]["bucket"] == "head" and got[3]["bucket"] == "tail"
    assert got[2]["ppl"] < got[1]["ppl"] < got[3]["ppl"]
