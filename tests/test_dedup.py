"""Dedup operators: LSH candidates-only verification (the 100 TB scale
property), shingle-df capping, simhash near-dup pairs, keep-first resolver."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.dedup import (
    cap_shingle_df,
    dedup_keep_first,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    ngram_shingles,
    simhash64,
    simhash_near_dup_pairs,
)

BOILER = "this boilerplate footer appears on every single page of the site"


@pytest.fixture(scope="module")
def docs(spark):
    """60 docs: 50 distinct bodies + 10 near-clones of the first 10 (one
    token changed), ALL sharing a boilerplate sentence (hot shingles with
    df == 60)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(400)]
    bodies = [
        " ".join(rng.choice(vocab, size=40).tolist()) for _ in range(50)
    ]
    rows = [(i, f"{b} {BOILER}") for i, b in enumerate(bodies)]
    for j in range(10):
        toks = bodies[j].split()
        toks[5] = "mutated"
        rows.append((100 + j, " ".join(toks) + " " + BOILER))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf, "doc_id long, text string")


def _explain(df) -> str:
    from tests.conftest import plan_of

    return plan_of(df, mode="extended")


def test_lsh_finds_near_clones(spark, docs):
    got = minhash_lsh_pairs(docs, k=32, bands=16, n=3, threshold=0.5)
    pairs = {(r["a"], r["b"]) for r in got.collect()}
    # every near-clone pair recovered (j, 100+j), jaccard ~ .75 over shingles
    assert {(j, 100 + j) for j in range(10)} <= pairs


def test_lsh_verification_is_candidates_only(spark, docs):
    """The boilerplate shingle makes EVERY pair (60*59/2 = 1770) collide in
    shingle space, but LSH candidates stay small — and the verify join must
    run over candidates, not shingle collisions."""
    cand = lsh_candidate_pairs(docs, k=32, bands=16, n=3)
    n_cand = cand.count()
    assert n_cand < 200  # << 1770 shingle-collision pairs
    out = minhash_lsh_pairs(docs, k=32, bands=16, n=3, threshold=0.5)
    # plan-level: no join condition pairs shingle equality with a doc_id
    # inequality (the signature of the old full shingle self-join)
    plan = _explain(out)
    for line in plan.splitlines():
        if "Join" in line and "shingle" in line:
            assert not re.search(r"doc_id#\d+L? <", line), line
    # semantic: output == exact jaccard restricted to the candidate set
    exact = jaccard_pairs(docs, n=3, threshold=0.5).select("a", "b", "jaccard")
    expected = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in cand.join(exact, ["a", "b"]).collect()
    }
    got = {(r["a"], r["b"], round(r["jaccard"], 9)) for r in out.collect()}
    assert got == expected


def test_cap_shingle_df(spark, docs):
    sh = ngram_shingles(docs, n=3)
    capped, n_dropped = cap_shingle_df(sh, max_shingle_df=30, count_dropped=True)
    assert n_dropped > 0  # the boilerplate shingles are hotter than 30
    max_df = (
        capped.groupBy("shingle").agg(F.count("*").alias("d"))
        .agg(F.max("d")).collect()[0][0]
    )
    assert max_df <= 30
    # capped jaccard: near-clone pairs survive (their overlap is body text),
    # and pure-boilerplate overlap no longer creates pairs at threshold
    got = jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_df=30)
    pairs = {(r["a"], r["b"]) for r in got.collect()}
    assert {(j, 100 + j) for j in range(10)} <= pairs


def test_simhash_near_dup_pairs(spark, docs):
    got = simhash_near_dup_pairs(docs, max_hamming=12)
    rows = {(r["a"], r["b"]): r["hamming"] for r in got.collect()}
    fp = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    # hamming values are the exact popcount of the fingerprint XOR
    for (a, b), ham in rows.items():
        assert ham == bin(fp[a] ^ fp[b]).count("1")
        assert ham <= 12
    # near-clones (1 of ~50 tokens changed) are within the radius and are
    # caught by the 4x16-bit band blocking
    near = [(j, 100 + j) for j in range(10) if bin(fp[j] ^ fp[100 + j]).count("1") <= 3]
    assert near, "at least one clone pair within guaranteed-recall radius"
    for p in near:
        assert p in rows


def test_components_resolve_chained_clusters(spark):
    """The star resolver's documented failure: pairs (1,5),(2,5) put 1 and
    2 in one component via 5, but keep-first (drop b-sides) keeps BOTH 1
    and 2. dedup_components collapses the chain exactly."""
    import pandas as pd

    from engine.dedup import dedup_components, dedup_keep_first_exact

    pairs = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 7], "b": [5, 5, 9]}), "a long, b long"
    )
    comp = {r["node"]: r["component"] for r in dedup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 5: 1, 7: 7, 9: 7}
    all_docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 5, 7, 9, 42]}), "doc_id long"
    )
    kept = {r["doc_id"] for r in dedup_keep_first_exact(all_docs, pairs).collect()}
    assert kept == {1, 7, 42}  # exactly one per cluster + untouched docs
    # star resolver over the same pairs wrongly keeps 2 as well
    star = {r["doc_id"] for r in dedup_keep_first(all_docs, pairs).collect()}
    assert 2 in star


def test_components_long_chain(spark):
    """Convergence over a path graph (diameter > 1 round)."""
    import pandas as pd

    from engine.dedup import dedup_components

    n = 12
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": list(range(n - 1)), "b": list(range(1, n))}),
        "a long, b long",
    )
    comp = {r["node"]: r["component"] for r in dedup_components(pairs).collect()}
    assert comp == {i: 0 for i in range(n)}


def test_dedup_keep_first(spark, docs):
    pairs = minhash_lsh_pairs(docs, k=32, bands=16, n=3, threshold=0.5)
    kept = dedup_keep_first(docs, pairs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    dropped = {r["b"] for r in pairs.select("b").collect()}
    assert kept_ids == {r["doc_id"] for r in docs.collect()} - dropped
    # the min-id representative of every pair survives
    for r in pairs.collect():
        assert r["a"] in kept_ids or any(
            p["b"] == r["a"] for p in pairs.collect()
        )


def test_simhash_band_cap_bounds_degenerate_corpus(spark):
    """A mass-shared band key (boilerplate cluster) must not explode the
    candidate self-join when max_band_df is set: the hot bucket is dropped
    (with its m^2 pairs), while small-bucket near-dups keep their pairs."""
    from engine.dedup import simhash_near_dup_pairs

    boiler = [(i, "identical boilerplate text shared by the whole batch") for i in range(40)]
    uniq = [
        (100, "rare alpha beta gamma delta epsilon zeta"),
        (101, "rare alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    uncapped = simhash_near_dup_pairs(docs, max_hamming=3).collect()
    capped = simhash_near_dup_pairs(docs, max_hamming=3, max_band_df=5).collect()
    # uncapped: the 40-doc cluster alone contributes 40*39/2 pairs
    assert len(uncapped) >= 780
    # capped: every boilerplate band bucket has df=40 > 5 -> zero pairs from
    # the cluster; the df=2 buckets of the small near-dup pair survive
    capped_pairs = {(r["a"], r["b"]) for r in capped}
    assert (100, 101) in capped_pairs
    assert all(a >= 100 for a, _ in capped_pairs), capped_pairs


def test_simhash_default_auto_cap_bounds_degenerate_corpus(spark):
    """The pipeline DEFAULT (max_band_df='auto') must bound candidates on a
    degenerate same-fingerprint corpus: 1100 identical docs put every band
    bucket above the 1024-doc auto floor, so the cluster contributes zero
    pairs instead of ~600k, while an ordinary small near-dup pair (bucket
    df=2, far below any derived threshold) is still found."""
    from engine.dedup import simhash_near_dup_pairs

    boiler = [(i, "identical boilerplate text shared by the whole crawl") for i in range(1100)]
    uniq = [
        (5000, "rare alpha beta gamma delta epsilon zeta"),
        (5001, "rare alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    got = simhash_near_dup_pairs(docs, max_hamming=3).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (5000, 5001) in pairs
    assert all(a >= 5000 for a, _ in pairs), f"boilerplate pairs leaked: {len(pairs)}"


def test_lsh_pairs_auto_cap_matches_exact_below_floor(spark, docs):
    """The pipeline default (max_shingle_df='auto') must be identical to
    the exact uncapped verify on a corpus smaller than the cap floor."""
    from engine.dedup import minhash_lsh_pairs

    auto = minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2).collect()
    exact = minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2, max_shingle_df=None).collect()
    assert sorted((r["a"], r["b"]) for r in auto) == sorted(
        (r["a"], r["b"]) for r in exact
    )


def test_auto_shingle_df_cap_floor(spark, docs):
    from engine.dedup import auto_shingle_df_cap, ngram_shingles

    cap = auto_shingle_df_cap(ngram_shingles(docs, 3))
    assert cap >= 1024


@pytest.fixture(scope="module")
def sf_docs(spark):
    import os
    from tests.conftest import SF001

    return spark.read.parquet(os.path.join(SF001, "documents.parquet"))


@pytest.fixture(scope="module")
def sf_docs_pdf():
    import os

    import pyarrow.parquet as pq

    from tests.conftest import SF001

    return pq.read_table(os.path.join(SF001, "documents.parquet")).to_pandas()


def test_ngram_decontaminate_vs_brute_and_plan(spark, sf_docs, sf_docs_pdf):
    """Decontamination hits == brute shingle-set intersection; probe side
    broadcasts (corpus shingles never shuffle for the join)."""
    from engine.dedup import ngram_decontaminate
    from engine.textnorm import standard_tokenize_py
    from tests.conftest import plan_of

    n = 4
    docs_df, docs_pdf = sf_docs, sf_docs_pdf
    probes = docs_df.filter(F.col("doc_id") < 25)
    out = ngram_decontaminate(docs_df, probes, n=n, exclude_self=True)
    assert "BroadcastHashJoin" in plan_of(out)

    def shingles(t):
        # raw token stream (NOT the deduping query analyzer)
        toks = standard_tokenize_py(t.lower())
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    sh = {int(r.doc_id): shingles(r.text) for r in ok.itertuples()}
    probe_sh = {i: s for i, s in sh.items() if i < 25}
    want = {}
    for i, s in sh.items():
        hits = set()
        probes_hit = set()
        for pid, ps in probe_sh.items():
            if pid == i:
                continue
            inter = s & ps
            if inter:
                hits |= inter
                probes_hit.add(pid)
        if hits:
            want[i] = (len(hits), len(probes_hit))
    got = {
        r["doc_id"]: (r["hit_shingles"], r["hit_probes"]) for r in out.collect()
    }
    assert got == want and got


def test_search_count_matches_matched_set(spark, sf_docs, sf_docs_pdf):
    from engine.aggs import search_count
    from engine.docvalues import RangeFilter
    from engine.index_build import build_index
    from engine.oracle import analyze_query_py
    from engine.query import IndexReader
    import tempfile

    docs_df, docs_pdf = sf_docs, sf_docs_pdf
    out = tempfile.mkdtemp(prefix="cnt_idx_") + "/idx"
    d = docs_df.select(
        F.col("doc_id").cast("string").alias("url"), "text", "n_chars"
    )
    build_index(spark, d, out, n_shards=2, n_buckets=4, docvalue_cols=["n_chars"])
    r = IndexReader(spark, out)
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    hit = ok["text"].map(
        lambda t: bool({"hash", "join"} & set(analyze_query_py(t)))
    )
    m = ok[hit]
    got = search_count(r, ["hash", "join"]).collect()[0]["doc_count"]
    assert got == len(m)
    got = search_count(
        r, ["hash", "join"], filters=[RangeFilter("n_chars", 200, None)]
    ).collect()[0]["doc_count"]
    assert got == int((m["n_chars"] >= 200).sum())
    # match_all: docmap-only plan
    df = search_count(r, None)
    from tests.conftest import plan_of
    assert "postings" not in plan_of(df)
    assert df.collect()[0]["doc_count"] == len(ok)


def test_ngram_shingles_short_docs_no_crash(spark):
    """Regression: sub-n-token docs used to crash ngram_shingles when
    Catalyst fused later predicates into the same stage and evaluated the
    shingle transform before the size filter (sequence(0, size-n)
    descends into slice start 0). The when() guard makes the transform
    lazily evaluated per row."""
    from engine.dedup import ngram_decontaminate, ngram_shingles

    df = spark.createDataFrame(
        [("a", "one two"), ("b", ""), ("c", None),
         ("d", "one two three four five six seven")],
        "doc_id string, text string",
    )
    got = ngram_shingles(df, n=6).collect()
    assert {r["doc_id"] for r in got} == {"d"}
    # the fusion trigger: a post-shingle filter in the same plan
    out = ngram_decontaminate(df, df, n=6, exclude_self=True).collect()
    assert out == []
