"""ES-style aggregations over the matched-doc set (engine/aggs.py).

Oracle strategy: every agg result is compared against a brute-force
pandas/DuckDB computation over the same corpus using the frozen analyzer
(engine.oracle.analyze_query_py) to derive the matched set — the same
two-implementations discipline as the BM25 rank-identity tests. Local and
Spark execution paths are asserted identical, tombstone masking and
compaction survival are covered, and the match_all path is plan-asserted
to never touch postings.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.aggs import (
    CardinalityAgg,
    DateHistogramAgg,
    HistogramAgg,
    RangeAgg,
    StatsAgg,
    TermsAgg,
    search_aggs,
    search_sort,
)
from engine.index_build import build_index
from engine.oracle import analyze_query_py
from engine.query import IndexReader

from tests.conftest import SF001, plan_of

Q = ["hash", "join"]
RANGES = ((None, 200), (200, 400), (400, None))


@pytest.fixture(scope="module")
def docs_pdf():
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "documents.parquet"))
    return t.to_pandas()


@pytest.fixture(scope="module")
def agg_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aggidx") / "idx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"),
        "text", "lang", "source", "n_chars",
    )
    build_index(
        spark, d, out, n_shards=4, n_buckets=8,
        docvalue_cols=["lang", "source", "n_chars"],
    )
    return out


def matched(docs_pdf: pd.DataFrame, terms=Q, mode="or") -> pd.DataFrame:
    """Brute-force matched set via the frozen analyzer."""
    ok = docs_pdf["text"].notna() & (docs_pdf["text"] != "")
    toksets = docs_pdf["text"].where(ok, "").map(lambda t: set(analyze_query_py(t)))
    ts = set(terms)
    if mode == "and":
        hit = toksets.map(lambda s: ts <= s)
    else:
        hit = toksets.map(lambda s: bool(ts & s))
    return docs_pdf[ok & hit]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_terms_agg_both_paths(spark, agg_index, docs_pdf, execution):
    r = IndexReader(spark, agg_index)
    got = {
        (x["key"], x["doc_count"])
        for x in search_aggs(r, Q, TermsAgg("lang", size=10), execution=execution).collect()
    }
    want = set(matched(docs_pdf).groupby("lang").size().items())
    assert got == want


@pytest.mark.parametrize("mode", ["or", "and"])
def test_stats_agg_modes(spark, agg_index, docs_pdf, mode):
    r = IndexReader(spark, agg_index)
    row = search_aggs(r, Q, StatsAgg("n_chars"), mode=mode).collect()[0]
    m = matched(docs_pdf, mode=mode)["n_chars"]
    assert (row["v_count"], row["v_min"], row["v_max"], row["v_sum"]) == (
        len(m), m.min(), m.max(), m.sum()
    )
    assert row["v_avg"] == pytest.approx(int(m.sum()) / len(m))


def test_range_hist_aggs(spark, agg_index, docs_pdf):
    r = IndexReader(spark, agg_index)
    m = matched(docs_pdf)["n_chars"].to_numpy()
    got = [
        (x["range_key"], x["doc_count"])
        for x in search_aggs(r, Q, RangeAgg("n_chars", RANGES)).collect()
    ]
    want = [
        ("*-200", int((m < 200).sum())),
        ("200-400", int(((m >= 200) & (m < 400)).sum())),
        ("400-*", int((m >= 400).sum())),
    ]
    assert got == want

    got_h = {
        (x["bucket"], x["doc_count"])
        for x in search_aggs(r, Q, HistogramAgg("n_chars", 100)).collect()
    }
    keys = np.floor(m / 100.0) * 100
    want_h = {(float(k), int(c)) for k, c in zip(*np.unique(keys, return_counts=True))}
    assert got_h == want_h


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_terms_stats_subagg(spark, agg_index, docs_pdf, execution):
    r = IndexReader(spark, agg_index)
    rows = search_aggs(
        r, Q, TermsAgg("source", size=30, stats_of="n_chars"), execution=execution
    ).collect()
    got = {
        x["key"]: (x["doc_count"], x["v_count"], x["v_min"], x["v_max"], x["v_sum"])
        for x in rows
    }
    g = matched(docs_pdf).groupby("source")["n_chars"]
    want = {
        k: (int(s.size), int(s.size), int(s.min()), int(s.max()), int(s.sum()))
        for k, s in g
    }
    assert got == want
    for x in rows:
        assert x["v_avg"] == pytest.approx(x["v_sum"] / x["v_count"])


def test_terms_size_cut_es_tiebreak(spark, agg_index, docs_pdf):
    """size cut = doc_count desc then key asc — exact across shards (NOT
    ES's approximate shard_size truncation; deliberate, see module doc)."""
    r = IndexReader(spark, agg_index)
    got = [
        (x["key"], x["doc_count"])
        for x in search_aggs(r, Q, TermsAgg("source", size=5)).collect()
    ]
    counts = matched(docs_pdf).groupby("source").size()
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_match_all_skips_postings(spark, agg_index, docs_pdf):
    r = IndexReader(spark, agg_index)
    df = search_aggs(r, None, TermsAgg("lang", size=10))
    plan = plan_of(df)
    assert "postings" not in plan  # pure docmap plan
    got = {(x["key"], x["doc_count"]) for x in df.collect()}
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    assert got == set(ok.groupby("lang").size().items())


def test_tombstones_mask_aggs_and_compaction_keeps_docvalues(
    spark, agg_index, docs_pdf, tmp_path_factory
):
    import shutil

    from engine.deletes import compact_index, delete_docs

    idx = str(tmp_path_factory.mktemp("aggdel") / "idx")
    shutil.copytree(agg_index, idx)
    victims = (
        spark.read.parquet(os.path.join(SF001, "documents.parquet"))
        .filter(F.col("doc_id") % 3 == 0)
        .select(F.col("doc_id").cast("string").alias("url"))
    )
    delete_docs(spark, idx, victims)
    live = matched(docs_pdf)
    live = live[live["doc_id"] % 3 != 0]
    want = set(live.groupby("lang").size().items())
    for execution in ("local", "spark"):
        r = IndexReader(spark, idx)
        got = {
            (x["key"], x["doc_count"])
            for x in search_aggs(
                r, Q, TermsAgg("lang", size=10), execution=execution
            ).collect()
        }
        assert got == want, execution
    # match_all also masks tombstones
    r = IndexReader(spark, idx)
    all_live = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    all_live = all_live[all_live["doc_id"] % 3 != 0]
    got = {
        (x["key"], x["doc_count"])
        for x in search_aggs(r, None, TermsAgg("lang", size=10)).collect()
    }
    assert got == set(all_live.groupby("lang").size().items())
    # compaction rewrites the docmap — docvalue columns must survive and
    # the same agg must return the same buckets on the compacted index
    cmp_dir = str(tmp_path_factory.mktemp("aggcmp") / "idx")
    compact_index(spark, idx, cmp_dir)
    rc = IndexReader(spark, cmp_dir)
    assert rc.manifest["docvalue_cols"] == ["lang", "source", "n_chars"]
    got = {
        (x["key"], x["doc_count"])
        for x in search_aggs(rc, Q, TermsAgg("lang", size=10)).collect()
    }
    assert got == want


def test_date_histogram_on_pages(spark, pages_1k, tmp_path_factory):
    """warc_ts day buckets over the synthetic web corpus, vs pandas."""
    out = str(tmp_path_factory.mktemp("aggts") / "idx")
    build_index(
        spark, pages_1k, out, n_shards=4, n_buckets=8, docvalue_cols=["warc_ts", "lang"]
    )
    r = IndexReader(spark, out)
    got = {
        (x["bucket"], x["doc_count"])
        for x in search_aggs(r, ["if"], DateHistogramAgg("warc_ts", "day")).collect()
    }
    pdf = pd.read_parquet(pages_1k)
    ok = pdf["text"].notna() & (pdf["text"] != "")
    hit = pdf["text"].where(ok, "").map(lambda t: "if" in set(analyze_query_py(t)))
    days = pdf[ok & hit]["warc_ts"].dt.floor("D")
    if days.dt.tz is not None:
        days = days.dt.tz_localize(None)  # engine returns session-tz naive
    want = {(k.to_pydatetime(), int(c)) for k, c in days.value_counts().items()}
    assert got == want and got  # non-vacuous: the term must match docs


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_cardinality_agg(spark, agg_index, docs_pdf, execution):
    r = IndexReader(spark, agg_index)
    got = search_aggs(r, Q, CardinalityAgg("source"), execution=execution).collect()
    assert got[0]["value"] == matched(docs_pdf)["source"].nunique()
    # match_all
    got = search_aggs(r, None, CardinalityAgg("lang")).collect()
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    assert got[0]["value"] == ok["lang"].nunique()


def _brute_sorted(docs_pdf, ascending=True):
    m = matched(docs_pdf).copy()
    m["url"] = m["doc_id"].astype(str)
    return m.sort_values(
        ["n_chars", "url"], ascending=[ascending, True], kind="mergesort"
    )[["url", "n_chars"]]


@pytest.mark.parametrize("execution", ["local", "spark"])
@pytest.mark.parametrize("ascending", [True, False])
def test_search_sort_pages_stitch(spark, agg_index, docs_pdf, execution, ascending):
    """Page 1 then a search_after cursor from its last row must produce
    exactly rows k..2k of the single globally-sorted list."""
    r = IndexReader(spark, agg_index)
    brute = _brute_sorted(docs_pdf, ascending)
    p1 = search_sort(
        r, Q, "n_chars", k=10, ascending=ascending, execution=execution
    ).collect()
    assert [(x["url"], x["sort_val"]) for x in p1] == [
        tuple(t) for t in brute.head(10).itertuples(index=False)
    ]
    cursor = (p1[-1]["sort_val"], p1[-1]["url"])
    p2 = search_sort(
        r, Q, "n_chars", k=10, ascending=ascending,
        search_after=cursor, execution=execution,
    ).collect()
    assert [(x["url"], x["sort_val"]) for x in p2] == [
        tuple(t) for t in brute.iloc[10:20].itertuples(index=False)
    ]


def test_search_sort_match_all_plan(spark, agg_index, docs_pdf):
    r = IndexReader(spark, agg_index)
    df = search_sort(r, None, "n_chars", k=5)
    plan = plan_of(df)
    assert "postings" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")].copy()
    ok["url"] = ok["doc_id"].astype(str)
    want = ok.sort_values(["n_chars", "url"], kind="mergesort").head(5)
    assert [(x["url"], x["sort_val"]) for x in df.collect()] == [
        tuple(t) for t in want[["url", "n_chars"]].itertuples(index=False)
    ]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_filtered_bm25_topk(spark, agg_index, docs_pdf, execution):
    """ES filter context on the scoring path: filters restrict the result
    set but do NOT change surviving docs' scores — so the filtered top-10
    must equal the unfiltered full ranking filtered client-side."""
    from engine.docvalues import RangeFilter, TermFilter
    from engine.query import bm25_topk

    r = IndexReader(spark, agg_index)
    flt = [TermFilter("lang", "en"), RangeFilter("n_chars", 150, 450)]
    got = bm25_topk(
        r, Q, k=10, algo="taat", filters=flt, execution=execution
    ).collect()
    full = bm25_topk(r, Q, k=10**6, algo="taat", execution=execution).collect()
    by_id = docs_pdf.set_index("doc_id")
    want = [
        (x["url"], x["score"])
        for x in full
        if by_id.loc[int(x["url"]), "lang"] == "en"
        and 150 <= by_id.loc[int(x["url"]), "n_chars"] < 450
    ][:10]
    assert [(x["url"], x["score"]) for x in got] == want
    assert len(got) == 10


def test_filtered_aggs_and_sort(spark, agg_index, docs_pdf):
    from engine.docvalues import RangeFilter, TermFilter

    r = IndexReader(spark, agg_index)
    flt = [RangeFilter("n_chars", 200, None)]
    m = matched(docs_pdf)
    m = m[m["n_chars"] >= 200]
    for execution in ("local", "spark"):
        got = {
            (x["key"], x["doc_count"])
            for x in search_aggs(
                r, Q, TermsAgg("lang", size=10), execution=execution, filters=flt
            ).collect()
        }
        assert got == set(m.groupby("lang").size().items()), execution
    # match_all + filter = pure docmap plan with a pushable predicate
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    ok = ok[ok["n_chars"] >= 200]
    got = {
        (x["key"], x["doc_count"])
        for x in search_aggs(r, None, TermsAgg("lang", size=10), filters=flt).collect()
    }
    assert got == set(ok.groupby("lang").size().items())
    # sorted paging under a term filter
    tf = [TermFilter("lang", "de")]
    md = matched(docs_pdf)
    md = md[md["lang"] == "de"].copy()
    md["url"] = md["doc_id"].astype(str)
    want = md.sort_values(["n_chars", "url"], kind="mergesort").head(5)
    got = search_sort(r, Q, "n_chars", k=5, filters=tf).collect()
    assert [(x["url"], x["sort_val"]) for x in got] == [
        tuple(t) for t in want[["url", "n_chars"]].itertuples(index=False)
    ]


def test_exists_filter_and_nulls(spark, tmp_path_factory):
    """Null docvalues: TermFilter/RangeFilter never match them,
    ExistsFilter selects exactly the non-null ones."""
    from engine.docvalues import ExistsFilter, TermFilter

    rows = [
        (str(i), f"alpha beta doc{i}", None if i % 3 == 0 else ("x" if i % 2 else "y"))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string, tag string")
    out = str(tmp_path_factory.mktemp("aggnull") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["tag"])
    r = IndexReader(spark, out)
    n_exists = sum(1 for _, _, t in rows if t is not None)
    n_x = sum(1 for _, _, t in rows if t == "x")
    got = search_aggs(r, ["alpha"], TermsAgg("tag", size=10), filters=[ExistsFilter("tag")]).collect()
    assert sum(x["doc_count"] for x in got) == n_exists
    got = search_aggs(r, ["alpha"], TermsAgg("tag", size=10), filters=[TermFilter("tag", "x")]).collect()
    assert [(x["key"], x["doc_count"]) for x in got] == [("x", n_x)]


def test_streamed_segments_merge_keeps_docvalues(spark, pages_1k, tmp_path_factory):
    """Segments ingested with docvalue_cols merge into an index whose
    aggregations match the batch-built docvalued index exactly."""
    import pyarrow.parquet as pq

    from engine.streaming import ingest_batch, merge_segments

    t = pq.read_table(pages_1k)
    out = str(tmp_path_factory.mktemp("stream_dv") / "idx")
    half = t.num_rows // 2
    for i, sl in enumerate((t.slice(0, half), t.slice(half))):
        ingest_batch(
            spark,
            spark.createDataFrame(sl.to_pandas()),
            out, seg_id=i, n_shards=4, n_buckets=8, docvalue_cols=["lang"],
        )
    manifest = merge_segments(spark, out, n_shards=4, n_buckets=8)
    assert manifest["docvalue_cols"] == ["lang"]

    batch_out = str(tmp_path_factory.mktemp("batch_dv") / "idx")
    build_index(
        spark, spark.read.parquet(pages_1k), batch_out,
        n_shards=4, n_buckets=8, docvalue_cols=["lang"],
    )
    terms = ["if"]
    got = {
        (x["key"], x["doc_count"])
        for x in search_aggs(
            IndexReader(spark, out), terms, TermsAgg("lang", size=10)
        ).collect()
    }
    want = {
        (x["key"], x["doc_count"])
        for x in search_aggs(
            IndexReader(spark, batch_out), terms, TermsAgg("lang", size=10)
        ).collect()
    }
    assert got == want and got


def test_missing_docvalue_field_raises(spark, agg_index):
    r = IndexReader(spark, agg_index)
    with pytest.raises(ValueError, match="docvalues"):
        search_aggs(r, Q, TermsAgg("nope"))


def test_absent_term_and_empty_results(spark, agg_index):
    r = IndexReader(spark, agg_index)
    # absent term in AND mode -> conjunctive empty; range agg still emits
    # every range bucket with count 0, stats emits count=0
    rows = search_aggs(
        r, ["hash", "zzzzmissing"], RangeAgg("n_chars", RANGES), mode="and"
    ).collect()
    assert [(x["range_key"], x["doc_count"]) for x in rows] == [
        ("*-200", 0), ("200-400", 0), ("400-*", 0)
    ]
    st = search_aggs(r, ["zzzzmissing"], StatsAgg("n_chars")).collect()[0]
    assert st["v_count"] == 0 and st["v_min"] is None and st["v_avg"] is None
    assert search_aggs(r, ["zzzzmissing"], TermsAgg("lang")).collect() == []


# ---------------------------------------------------------------------------
# composite / top_hits / percentiles / missing / filters aggs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_composite_pages_stitch_to_full_groupby(spark, agg_index, docs_pdf, execution):
    """Paging composite buckets with the after cursor until exhaustion
    must reproduce the full exact GROUP BY, in key order."""
    from engine.aggs import CompositeAgg

    r = IndexReader(spark, agg_index)
    want = (
        matched(docs_pdf)
        .groupby(["lang", "source"])
        .size()
        .reset_index(name="doc_count")
        .sort_values(["lang", "source"], kind="mergesort")
    )
    got, after, pages = [], None, 0
    while True:
        rows = search_aggs(
            r, Q, CompositeAgg(("lang", "source"), size=7, after=after),
            execution=execution,
        ).collect()
        if not rows:
            break
        got += [(x["lang"], x["source"], x["doc_count"]) for x in rows]
        after = (rows[-1]["lang"], rows[-1]["source"])
        pages += 1
        assert pages < 100
    assert got == [tuple(t) for t in want.itertuples(index=False)]
    assert pages > 1  # the cursor actually paged


def test_composite_match_all(spark, agg_index, docs_pdf):
    from engine.aggs import CompositeAgg

    r = IndexReader(spark, agg_index)
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    want = (
        ok.groupby(["lang", "source"]).size().reset_index(name="c")
        .sort_values(["lang", "source"], kind="mergesort")
    )
    after = (want.iloc[2]["lang"], want.iloc[2]["source"])
    rows = search_aggs(
        r, None, CompositeAgg(("lang", "source"), size=5, after=after)
    ).collect()
    exp = want.iloc[3:8]
    assert [(x["lang"], x["source"], x["doc_count"]) for x in rows] == [
        tuple(t) for t in exp.itertuples(index=False)
    ]


def _brute_top_hits(m, size=3, hits_k=2, ascending=True):
    cnt = m.groupby("lang").size().reset_index(name="doc_count")
    cnt = cnt.sort_values(
        ["doc_count", "lang"], ascending=[False, True], kind="mergesort"
    ).head(size)
    out = []
    for _, b in cnt.iterrows():
        h = m[m["lang"] == b["lang"]].copy()
        h["url"] = h["doc_id"].astype(str)
        h = h.sort_values(
            ["n_chars", "url"], ascending=[ascending, True], kind="mergesort"
        ).head(hits_k)
        out += [
            (b["lang"], b["doc_count"], i + 1, u, nc)
            for i, (u, nc) in enumerate(zip(h["url"], h["n_chars"]))
        ]
    return out


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_top_hits_agg(spark, agg_index, docs_pdf, execution):
    from engine.aggs import TopHitsAgg

    r = IndexReader(spark, agg_index)
    rows = search_aggs(
        r, Q,
        TopHitsAgg("lang", size=3, hits_sort="n_chars", hits_k=2),
        execution=execution,
    ).collect()
    got = [
        (x["key"], x["doc_count"], x["hit_rank"], x["url"], x["sort_val"])
        for x in rows
    ]
    assert got == _brute_top_hits(matched(docs_pdf))
    # descending + match_all
    rows = search_aggs(
        r, None,
        TopHitsAgg("lang", size=2, hits_sort="n_chars", hits_k=3, ascending=False),
    ).collect()
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    assert [
        (x["key"], x["doc_count"], x["hit_rank"], x["url"], x["sort_val"])
        for x in rows
    ] == _brute_top_hits(ok, size=2, hits_k=3, ascending=False)


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_percentiles_agg_exact(spark, agg_index, docs_pdf, execution):
    """Exact linear-interpolation percentiles (numpy 'linear' is the same
    percentile_cont definition as Spark's percentile)."""
    from engine.aggs import PercentilesAgg

    r = IndexReader(spark, agg_index)
    pcts = (25.0, 50.0, 75.0, 95.0)
    row = search_aggs(
        r, Q, PercentilesAgg("n_chars", pcts), execution=execution
    ).collect()[0]
    vals = matched(docs_pdf)["n_chars"].to_numpy(dtype=float)
    for p in pcts:
        name = "p" + f"{p:g}".replace(".", "_")
        assert row[name] == pytest.approx(
            float(np.percentile(vals, p, method="linear")), rel=1e-12
        ), name
    # match_all path
    row = search_aggs(r, None, PercentilesAgg("n_chars", (50.0,))).collect()[0]
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    assert row["p50"] == pytest.approx(
        float(np.percentile(ok["n_chars"].to_numpy(dtype=float), 50))
    )


def test_missing_and_filters_aggs(spark, tmp_path_factory):
    from engine.aggs import FiltersAgg, MissingAgg
    from engine.docvalues import RangeFilter, TermFilter

    rows = [
        (str(i), f"alpha beta doc{i}",
         None if i % 3 == 0 else ("x" if i % 2 else "y"), i * 10)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string, tag string, n int")
    out = str(tmp_path_factory.mktemp("aggmiss") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["tag", "n"])
    r = IndexReader(spark, out)
    n_null = sum(1 for _, _, t, _ in rows if t is None)
    for execution in ("local", "spark"):
        got = search_aggs(
            r, ["alpha"], MissingAgg("tag"), execution=execution
        ).collect()
        assert got[0]["doc_count"] == n_null, execution
    # match_all
    assert search_aggs(r, None, MissingAgg("tag")).collect()[0]["doc_count"] == n_null

    spec = FiltersAgg((
        ("low_x", (TermFilter("tag", "x"), RangeFilter("n", None, 150))),
        ("high", (RangeFilter("n", 150, None),)),
        ("none", (TermFilter("tag", "zzz"),)),
    ))
    want = [
        ("low_x", sum(1 for _, _, t, n in rows if t == "x" and n < 150)),
        ("high", sum(1 for _, _, _t, n in rows if n >= 150)),
        ("none", 0),
    ]
    for execution in ("local", "spark"):
        got = [
            (x["filter_key"], x["doc_count"])
            for x in search_aggs(r, ["alpha"], spec, execution=execution).collect()
        ]
        assert got == want, execution
    got = [
        (x["filter_key"], x["doc_count"])
        for x in search_aggs(r, None, spec).collect()
    ]
    assert got == want


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_matched_urls_both_paths(spark, agg_index, docs_pdf, execution):
    from engine.aggs import matched_urls

    r = IndexReader(spark, agg_index)
    got = sorted(
        x["url"] for x in matched_urls(r, Q, execution=execution).collect()
    )
    want = sorted(matched(docs_pdf)["doc_id"].astype(str))
    assert got == want


def _brute_significant(docs_pdf, terms=Q, size=10):
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    dt = ok["text"].map(lambda t: set(analyze_query_py(t)))
    fg_mask = dt.map(lambda s: bool(set(terms) & s))
    n_fg, n_bg = int(fg_mask.sum()), len(ok)
    fg_cnt: dict[str, int] = {}
    bg_cnt: dict[str, int] = {}
    for toks, is_fg in zip(dt, fg_mask):
        for t in toks:
            bg_cnt[t] = bg_cnt.get(t, 0) + 1
            if is_fg:
                fg_cnt[t] = fg_cnt.get(t, 0) + 1
    rows = []
    for t, fdf in fg_cnt.items():
        fr, br = fdf / float(n_fg), bg_cnt[t] / float(n_bg)
        s = (fr - br) * (fr / br)
        if s > 0:
            rows.append((t, fdf, bg_cnt[t], s))
    rows.sort(key=lambda r: (-round(r[3], 6), r[0]))
    return rows[:size]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_significant_terms_vs_brute(spark, agg_index, docs_pdf, execution):
    from engine.aggs import significant_terms
    from pyspark.sql import functions as F

    r = IndexReader(spark, agg_index)
    corpus = spark.createDataFrame(docs_pdf[["doc_id", "text"]]).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    got = significant_terms(r, Q, corpus, size=10, execution=execution).collect()
    want = _brute_significant(docs_pdf)
    assert [(x["term"], x["doc_count"], x["bg_count"]) for x in got] == [
        (t, f, b) for t, f, b, _ in want
    ]
    for x, (_, _, _, s) in zip(got, want):
        assert x["score"] == pytest.approx(round(s, 6), abs=1e-6)
    # the query terms themselves are trivially significant (ES keeps them)
    assert set(Q) & {x["term"] for x in got}


def test_function_score_boost_exact(spark, agg_index, docs_pdf):
    """function_score: boosted top-k == (unboosted full ranking + boost
    recomposed client-side) — exact, every matched doc competes."""
    import math

    from engine.query import bm25_topk

    r = IndexReader(spark, agg_index)
    full = bm25_topk(r, Q, k=10**6, algo="taat").collect()
    nchars = docs_pdf.set_index("doc_id")["n_chars"]
    want = sorted(
        (
            (x["url"], x["score"] + 0.05 * math.log(1.0 + nchars[int(x["url"])]))
            for x in full
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    for execution in ("local", "spark"):
        got = bm25_topk(
            r, Q, k=10, boost=("n_chars", 0.05), execution=execution
        ).collect()
        gs = sorted(((x["url"], x["score"]) for x in got), key=lambda t: (-t[1], t[0]))
        assert [u for u, _ in gs] == [u for u, _ in want], execution
        for (gu, gsc), (_wu, wsc) in zip(gs, want):
            assert gsc == pytest.approx(wsc, abs=1e-9), (execution, gu)
    # the boost actually reorders vs the unboosted ranking (non-vacuous)
    unboosted = [x["url"] for x in full[:10]]
    assert [u for u, _ in want] != unboosted


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_multi_terms_agg(spark, agg_index, docs_pdf, execution):
    """multi_terms: tuple-keyed buckets == pandas groupby on the brute
    matched set; ES order (doc_count desc, compound key asc) + size cut."""
    from engine.aggs import MultiTermsAgg

    r = IndexReader(spark, agg_index)
    rows = search_aggs(
        r, Q, MultiTermsAgg(("lang", "source"), size=10**6), execution=execution
    ).collect()
    got = {(x["lang"], x["source"]): x["doc_count"] for x in rows}
    want = matched(docs_pdf).groupby(["lang", "source"]).size().to_dict()
    assert got == {(str(a), str(b)): int(c) for (a, b), c in want.items()}
    # ES ordering + cut: top-5 == the full ranking's first five
    full_order = [(x["lang"], x["source"]) for x in rows]
    exp = sorted(got, key=lambda k: (-got[k], k))
    assert full_order == exp
    top = search_aggs(
        r, Q, MultiTermsAgg(("lang", "source"), size=5), execution=execution
    ).collect()
    assert [(x["lang"], x["source"]) for x in top] == exp[:5]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_subterms_agg(spark, agg_index, docs_pdf, execution):
    """nested terms->terms: parent counts, sub counts, both ES orderings
    and both size cuts vs the brute matched set."""
    from engine.aggs import SubTermsAgg

    r = IndexReader(spark, agg_index)
    rows = search_aggs(
        r, Q, SubTermsAgg("lang", "source", size=3, sub_size=2),
        execution=execution,
    ).collect()
    m = matched(docs_pdf)
    pc_ = m.groupby("lang").size()
    parents = sorted(pc_.items(), key=lambda t: (-t[1], t[0]))[:3]
    want_rows = []
    for k, dc in parents:
        subs = m[m["lang"] == k].groupby("source").size()
        top = sorted(subs.items(), key=lambda t: (-t[1], t[0]))[:2]
        want_rows += [(str(k), int(dc), str(sk), int(sc)) for sk, sc in top]
    got_rows = [
        (x["key"], x["doc_count"], x["sub_key"], x["sub_doc_count"]) for x in rows
    ]
    assert got_rows == want_rows


def test_multi_and_subterms_null_keys(spark, tmp_path_factory):
    """Null semantics: multi_terms skips a doc null in ANY key field;
    nested terms keeps the parent doc_count but drops the null sub-key
    row (a parent with zero non-null subs still emits its bucket)."""
    from engine.aggs import MultiTermsAgg, SubTermsAgg

    rows = [
        (
            str(i),
            "alpha common",
            "p1" if i < 20 else "p2",
            None if (i % 3 == 0 or i >= 20) else ("x" if i % 2 else "y"),
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string, grp string, tag string")
    out = str(tmp_path_factory.mktemp("aggnull2") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["grp", "tag"])
    r = IndexReader(spark, out)
    n_pairs = sum(1 for _, _, g, t in rows if t is not None)
    mt = search_aggs(r, ["alpha"], MultiTermsAgg(("grp", "tag"), size=10)).collect()
    assert sum(x["doc_count"] for x in mt) == n_pairs
    assert all(x["tag"] is not None for x in mt)
    st = search_aggs(r, ["alpha"], SubTermsAgg("grp", "tag", size=10)).collect()
    by_parent = {}
    for x in st:
        by_parent.setdefault(x["key"], []).append(x)
    # p2: all-null subs -> one row, null sub_key, full parent count
    assert [x["sub_key"] for x in by_parent["p2"]] == [None]
    assert by_parent["p2"][0]["doc_count"] == 10
    # p1: parent count includes the null-sub docs; sub rows only non-null
    assert by_parent["p1"][0]["doc_count"] == 20
    assert sorted(x["sub_key"] for x in by_parent["p1"]) == ["x", "y"]
    assert sum(x["sub_doc_count"] for x in by_parent["p1"]) == sum(
        1 for _, _, g, t in rows if g == "p1" and t is not None
    )


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_extended_stats_agg(spark, agg_index, docs_pdf, execution):
    """extended_stats == numpy under the frozen population-variance
    formula (sum_sq - sum*sum/count)/count; sums exact below 2^53."""
    from engine.aggs import ExtendedStatsAgg

    r = IndexReader(spark, agg_index)
    row = search_aggs(
        r, Q, ExtendedStatsAgg("n_chars"), execution=execution
    ).collect()[0]
    v = matched(docs_pdf)["n_chars"].to_numpy().astype(np.int64)
    cnt, s = int(v.size), int(v.sum())
    sos = float((v.astype(np.float64) ** 2).sum())
    var = (sos - float(s) * float(s) / cnt) / cnt
    assert (row["v_count"], row["v_min"], row["v_max"], row["v_sum"]) == (
        cnt, int(v.min()), int(v.max()), s
    )
    assert row["sum_of_squares"] == sos
    assert row["variance"] == pytest.approx(var, rel=1e-12)
    assert row["std_deviation"] == pytest.approx(var**0.5, rel=1e-12)


def test_weighted_avg_agg(spark, tmp_path_factory):
    """weighted_avg: sum(v*w)/sum(w) over docs non-null in BOTH fields —
    query context, match_all, and the null-skip rule."""
    from engine.aggs import WeightedAvgAgg

    rows = [
        (
            str(i),
            "alpha common" if i % 2 else "beta common",
            None if i % 5 == 0 else i + 1,
            None if i % 7 == 0 else (i % 3) + 1,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, text string, v long, w long")
    out = str(tmp_path_factory.mktemp("wavg") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["v", "w"])
    r = IndexReader(spark, out)

    def brute(pred):
        num = den = 0
        for u, _t, v, w in rows:
            if pred(u) and v is not None and w is not None:
                num += v * w
                den += w
        return num / den

    for query, pred in [
        (["alpha"], lambda u: int(u) % 2 == 1),
        (None, lambda u: True),
    ]:
        for execution in ("local", "spark"):
            if query is None and execution == "local":
                continue  # match_all is a single DataFrame plan
            got = search_aggs(
                r, query, WeightedAvgAgg("v", "w"), execution=execution
            ).collect()[0]["value"]
            assert got == pytest.approx(brute(pred), rel=1e-12), (query, execution)


def _brute_adjacency(m: pd.DataFrame) -> list[tuple[str, int]]:
    en = m["lang"] == "en"
    es = m["lang"] == "es"
    short = m["n_chars"] < 300
    raw = {
        "en": en.sum(), "es": es.sum(), "short": short.sum(),
        "en&es": (en & es).sum(), "en&short": (en & short).sum(),
        "es&short": (es & short).sum(),
    }
    return sorted((k, int(v)) for k, v in raw.items() if v > 0)


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_adjacency_matrix_agg(spark, agg_index, docs_pdf, execution):
    """Named buckets + pairwise intersections, zero buckets dropped,
    key asc — vs a pandas brute over the same matched set."""
    from engine.aggs import AdjacencyMatrixAgg
    from engine.docvalues import RangeFilter, TermFilter

    spec = AdjacencyMatrixAgg((
        ("en", (TermFilter("lang", "en"),)),
        ("es", (TermFilter("lang", "es"),)),
        ("short", (RangeFilter("n_chars", None, 300),)),
    ))
    r = IndexReader(spark, agg_index)
    got = [
        (x["key"], x["doc_count"])
        for x in search_aggs(r, Q, spec, execution=execution).collect()
    ]
    assert got == _brute_adjacency(matched(docs_pdf)) and got

    # match_all path (single DataFrame plan over the docmap)
    got = [
        (x["key"], x["doc_count"]) for x in search_aggs(r, None, spec).collect()
    ]
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    assert got == _brute_adjacency(ok)


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_date_range_agg(spark, pages_1k, tmp_path_factory, execution):
    """Half-open ISO-dated buckets over a timestamp docvalue, every
    declared range emitting in declaration order — vs pandas."""
    from engine.aggs import DateRangeAgg

    out = str(tmp_path_factory.mktemp("adrts") / "idx")
    build_index(
        spark, pages_1k, out, n_shards=4, n_buckets=8, docvalue_cols=["warc_ts"]
    )
    r = IndexReader(spark, out)
    pdf = pd.read_parquet(pages_1k)
    ok = pdf["text"].notna() & (pdf["text"] != "")
    hit = pdf["text"].where(ok, "").map(lambda t: "if" in set(analyze_query_py(t)))
    m = pdf[ok & hit]
    ts = m["warc_ts"]
    if getattr(ts.dt, "tz", None) is not None:
        ts = ts.dt.tz_localize(None)
    lo_edge = str(ts.quantile(0.33).floor("D").date())
    hi_edge = str(ts.quantile(0.66).floor("D").date())
    spec = DateRangeAgg(
        "warc_ts", ((None, lo_edge), (lo_edge, hi_edge), (hi_edge, None))
    )
    got = [
        (x["range_key"], x["doc_count"])
        for x in search_aggs(r, ["if"], spec, execution=execution).collect()
    ]
    lo, hi = pd.Timestamp(lo_edge), pd.Timestamp(hi_edge)
    want = [
        (f"*-{lo_edge}", int((ts < lo).sum())),
        (f"{lo_edge}-{hi_edge}", int(((ts >= lo) & (ts < hi)).sum())),
        (f"{hi_edge}-*", int((ts >= hi).sum())),
    ]
    assert got == want and sum(c for _k, c in got) > 0

    # match_all path: all valid docs
    ts_all = pdf[ok]["warc_ts"]
    if getattr(ts_all.dt, "tz", None) is not None:
        ts_all = ts_all.dt.tz_localize(None)
    got = [
        (x["range_key"], x["doc_count"])
        for x in search_aggs(r, None, spec).collect()
    ]
    want = [
        (f"*-{lo_edge}", int((ts_all < lo).sum())),
        (f"{lo_edge}-{hi_edge}", int(((ts_all >= lo) & (ts_all < hi)).sum())),
        (f"{hi_edge}-*", int((ts_all >= hi).sum())),
    ]
    assert got == want


def test_adjacency_and_date_range_dsl_dispatch(spark, agg_index, docs_pdf):
    from engine.dsl import search

    r = IndexReader(spark, agg_index)
    resp = search(r, {
        "query": {"match": {"text": " ".join(Q)}}, "size": 0,
        "aggs": {"overlap": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "es": {"term": {"lang": "es"}},
            "short": {"range": {"n_chars": {"lt": 300}}},
        }}}},
    })
    got = [
        (b["key"], b["doc_count"])
        for b in resp["aggregations"]["overlap"]["buckets"]
    ]
    assert got == _brute_adjacency(matched(docs_pdf))

    resp = search(r, {
        "query": {"match_all": {}}, "size": 0,
        "aggs": {"spans": {"date_range": {"field": "n_chars", "ranges": []}}},
    })
    assert resp["aggregations"]["spans"]["buckets"] == []


# ---------------------------------------------------------------------------
# round-4 metric aggs: string_stats / median_absolute_deviation / boxplot /
# matrix_stats / t_test
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_string_stats_agg(spark, agg_index, docs_pdf, execution):
    """string_stats: count / min-max-avg length / character-distribution
    Shannon entropy — brute twin via Counter, both execution paths."""
    import collections
    import math

    from engine.aggs import StringStatsAgg

    r = IndexReader(spark, agg_index)
    row = search_aggs(
        r, Q, StringStatsAgg("source"), execution=execution
    ).collect()[0]
    vals = matched(docs_pdf)["source"].dropna()
    lens = vals.str.len()
    cnt = collections.Counter("".join(vals))
    tot = sum(cnt.values())
    ent = math.log2(tot) - sum(c * math.log2(c) for c in cnt.values()) / tot
    assert (row["v_count"], row["min_length"], row["max_length"]) == (
        len(vals), lens.min(), lens.max()
    )
    assert row["avg_length"] == pytest.approx(lens.sum() / len(vals), rel=1e-12)
    assert row["entropy"] == pytest.approx(ent, rel=1e-12)


def test_string_stats_match_all_plan(spark, agg_index, docs_pdf):
    import collections
    import math

    from engine.aggs import StringStatsAgg

    r = IndexReader(spark, agg_index)
    df = search_aggs(r, None, StringStatsAgg("source"))
    assert "postings" not in plan_of(df)
    row = df.collect()[0]
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    vals = ok["source"].dropna()
    cnt = collections.Counter("".join(vals))
    tot = sum(cnt.values())
    ent = math.log2(tot) - sum(c * math.log2(c) for c in cnt.values()) / tot
    assert row["v_count"] == len(vals)
    assert row["entropy"] == pytest.approx(ent, rel=1e-12)


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_mad_and_boxplot_aggs(spark, agg_index, docs_pdf, execution):
    """Exact interpolated median-absolute-deviation and quartiles (numpy
    'linear' = percentile_cont = Spark percentile)."""
    from engine.aggs import BoxplotAgg, MedianAbsoluteDeviationAgg

    r = IndexReader(spark, agg_index)
    vals = matched(docs_pdf)["n_chars"].to_numpy(dtype=float)
    med = float(np.percentile(vals, 50, method="linear"))
    want_mad = float(np.percentile(np.abs(vals - med), 50, method="linear"))
    got = search_aggs(
        r, Q, MedianAbsoluteDeviationAgg("n_chars"), execution=execution
    ).collect()[0]["value"]
    assert got == pytest.approx(want_mad, rel=1e-12)

    row = search_aggs(
        r, Q, BoxplotAgg("n_chars"), execution=execution
    ).collect()[0]
    for name, p in [("v_min", 0), ("q1", 25), ("q2", 50), ("q3", 75), ("v_max", 100)]:
        assert row[name] == pytest.approx(
            float(np.percentile(vals, p, method="linear")), rel=1e-12
        ), name
    # match_all twins (single DataFrame plan)
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    av = ok["n_chars"].to_numpy(dtype=float)
    amed = float(np.percentile(av, 50, method="linear"))
    got = search_aggs(
        r, None, MedianAbsoluteDeviationAgg("n_chars")
    ).collect()[0]["value"]
    assert got == pytest.approx(
        float(np.percentile(np.abs(av - amed), 50, method="linear"))
    )
    row = search_aggs(r, None, BoxplotAgg("n_chars")).collect()[0]
    assert row["q2"] == pytest.approx(amed)


def test_matrix_stats_and_ttest_aggs(spark, tmp_path_factory):
    """matrix_stats population moments + paired t_test vs numpy brute
    (listwise deletion over docs non-null in both fields)."""
    from engine.aggs import MatrixStatsAgg, TTestAgg

    rows = [
        (
            str(i),
            "alpha common" if i % 2 else "beta common",
            None if i % 5 == 0 else (i * 7) % 23 + 1,
            None if i % 7 == 0 else (i * 3) % 11 + 1,
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "url string, text string, a long, b long")
    out = str(tmp_path_factory.mktemp("mstats") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["a", "b"])
    r = IndexReader(spark, out)

    def brute(pred):
        ab = np.array(
            [(a, b) for u, _t, a, b in rows
             if pred(u) and a is not None and b is not None],
            dtype=float,
        )
        return ab[:, 0], ab[:, 1]

    for query, pred in [
        (["alpha"], lambda u: int(u) % 2 == 1),
        (None, lambda u: True),
    ]:
        a, b = brute(pred)
        n = a.size
        for execution in ("local", "spark"):
            if query is None and execution == "local":
                continue
            row = search_aggs(
                r, query, MatrixStatsAgg("a", "b"), execution=execution
            ).collect()[0]
            assert row["doc_count"] == n
            assert row["mean_a"] == pytest.approx(a.mean(), rel=1e-12)
            assert row["variance_a"] == pytest.approx(a.var(), rel=1e-12)
            assert row["variance_b"] == pytest.approx(b.var(), rel=1e-12)
            cov = ((a * b).sum() - a.sum() * b.sum() / n) / n
            assert row["covariance"] == pytest.approx(cov, rel=1e-12)
            assert row["correlation"] == pytest.approx(
                cov / math.sqrt(a.var() * b.var()), rel=1e-12
            )

            trow = search_aggs(
                r, query, TTestAgg("a", "b"), execution=execution
            ).collect()[0]
            d = a - b
            s2 = d.var(ddof=1)
            assert trow["dof"] == n - 1
            assert trow["t_stat"] == pytest.approx(
                d.mean() / math.sqrt(s2 / n), rel=1e-12
            )


# ---------------------------------------------------------------------------
# sampler / diversified_sampler aggs (terms sub-agg over the scored sample)
# ---------------------------------------------------------------------------


def _scored_matched(docs_pdf, terms=Q):
    """All matched docs with 6-dp rounded BM25 scores, sampler sort order
    (score desc, url asc) — the frozen global-cut ordering."""
    from engine.oracle import Bm25Oracle

    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    orc = Bm25Oracle(list(zip(ok["doc_id"], ok["text"])))
    hits = orc.topk(terms, k=10**9)
    sc = pd.DataFrame(hits, columns=["doc_id", "score"])
    sc["score"] = sc["score"].round(6)
    sc["url"] = sc["doc_id"].astype(str)
    sc = sc.merge(ok[["doc_id", "lang", "source"]], on="doc_id")
    return sc.sort_values(
        ["score", "url"], ascending=[False, True], kind="mergesort"
    )


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_sampler_terms_vs_brute(spark, agg_index, docs_pdf, execution):
    from engine.aggs import sampler_terms

    r = IndexReader(spark, agg_index)
    sc = _scored_matched(docs_pdf)
    # plain sampler: global top-N cut, then terms on lang
    for n in (10, 40):
        got = [
            (x["key"], x["doc_count"])
            for x in sampler_terms(
                r, Q, "lang", n, execution=execution
            ).collect()
        ]
        vc = sc.head(n)["lang"].dropna().value_counts()
        want = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got == want, n
    # diversified: per-source cap before the cut (greedy == window rank)
    got = [
        (x["key"], x["doc_count"])
        for x in sampler_terms(
            r, Q, "lang", 25, diversify_field="source", max_per_value=2,
            execution=execution,
        ).collect()
    ]
    f = sc[sc.groupby("source", dropna=False).cumcount() < 2].head(25)
    vc = f["lang"].dropna().value_counts()
    want = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want


def test_sampler_dsl_dispatch(spark, agg_index, docs_pdf):
    from engine.aggs import sampler_terms
    from engine.dsl import search

    r = IndexReader(spark, agg_index)
    resp = search(r, {
        "query": {"match": {"text": " ".join(Q)}}, "size": 0,
        "aggs": {"sample": {
            "diversified_sampler": {
                "shard_size": 25, "field": "source", "max_docs_per_value": 2,
            },
            "aggs": {"langs": {"terms": {"field": "lang"}}},
        }},
    })
    native = sampler_terms(
        r, Q, "lang", 25, diversify_field="source", max_per_value=2
    )
    assert resp["aggregations"]["sample"]["buckets"] == [
        x.asDict() for x in native.collect()
    ]
    with pytest.raises(ValueError, match="terms sub-agg"):
        search(r, {
            "query": {"match": {"text": "hash"}}, "size": 0,
            "aggs": {"s": {"sampler": {"shard_size": 5}}},
        })


@pytest.fixture(scope="module")
def autodh_index(spark, tmp_path_factory):
    """Corpus with month-scale timestamp spread (pages_1k's warc_ts spans
    ~17 minutes — every ladder rung would collapse to one bucket)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            str(i),
            "alpha if common" if i % 2 else "beta common",
            base + dt.timedelta(hours=7 * i),
        )
        for i in range(240)  # spans ~10 weeks -> hours >> days > months
    ]
    df = spark.createDataFrame(rows, "url string, text string, ts timestamp_ntz")
    out = str(tmp_path_factory.mktemp("autodh") / "idx")
    build_index(spark, df, out, n_shards=2, n_buckets=4, docvalue_cols=["ts"])
    return out, pd.DataFrame(rows, columns=["url", "text", "ts"])


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_auto_date_histogram(spark, autodh_index, execution):
    """auto_date_histogram: frozen hour->day->month ladder, first unit
    whose global distinct-bucket count fits `buckets`; buckets match a
    pandas floor twin at every ladder rung."""
    from engine.aggs import AutoDateHistogramAgg

    out, pdf = autodh_index
    r = IndexReader(spark, out)
    ts = pdf[pdf["text"].str.contains("if")]["ts"]
    floors = {
        "hour": ts.dt.floor("h"),
        "day": ts.dt.floor("D"),
        "month": ts.dt.to_period("M").dt.to_timestamp(),
    }
    n_by_unit = {u: v.nunique() for u, v in floors.items()}
    assert n_by_unit["hour"] > n_by_unit["day"] > n_by_unit["month"]
    for target, want_unit in [
        (n_by_unit["hour"], "hour"),
        (n_by_unit["day"], "day"),
        (n_by_unit["month"], "month"),
    ]:
        rows = search_aggs(
            r, ["if"], AutoDateHistogramAgg("ts", buckets=target),
            execution=execution,
        ).collect()
        assert {x["interval"] for x in rows} == {want_unit}, target
        got = {(x["bucket"], x["doc_count"]) for x in rows}
        want = {
            (k.to_pydatetime(), int(c))
            for k, c in floors[want_unit].value_counts().items()
        }
        assert got == want and got, want_unit
    # below every rung -> month anyway (frozen fallback)
    rows = search_aggs(
        r, ["if"], AutoDateHistogramAgg("ts", buckets=0),
        execution=execution,
    ).collect()
    assert {x["interval"] for x in rows} == {"month"}


def test_auto_date_histogram_match_all_and_dsl(spark, autodh_index):
    from engine.aggs import AutoDateHistogramAgg
    from engine.dsl import search

    out, pdf = autodh_index
    r = IndexReader(spark, out)
    days = pdf["ts"].dt.floor("D")
    rows = search_aggs(
        r, None, AutoDateHistogramAgg("ts", buckets=int(days.nunique()))
    ).collect()
    assert {x["interval"] for x in rows} == {"day"}
    got = {(x["bucket"], x["doc_count"]) for x in rows}
    want = {(k.to_pydatetime(), int(c)) for k, c in days.value_counts().items()}
    assert got == want
    resp = search(r, {
        "query": {"match": {"text": "if"}}, "size": 0,
        "aggs": {"over_time": {"auto_date_histogram": {
            "field": "ts", "buckets": 3,
        }}},
    })
    native = search_aggs(r, ["if"], AutoDateHistogramAgg("ts", 3))
    assert resp["aggregations"]["over_time"]["buckets"] == [
        x.asDict() for x in native.collect()
    ]


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_percentile_ranks_agg(spark, agg_index, docs_pdf, execution):
    """percentile_ranks: frozen EXACT empirical CDF 100*count(x<=v)/n
    (documented TDigest divergence), both paths + match_all."""
    from engine.aggs import PercentileRanksAgg

    r = IndexReader(spark, agg_index)
    vals = matched(docs_pdf)["n_chars"].to_numpy(dtype=float)
    probes = (float(np.median(vals)), 100.0, 10_000.0)
    row = search_aggs(
        r, Q, PercentileRanksAgg("n_chars", probes), execution=execution
    ).collect()[0]
    for v in probes:
        name = "pr_" + f"{v:g}".replace(".", "_")
        assert row[name] == pytest.approx(
            100.0 * (vals <= v).sum() / vals.size, rel=1e-12
        ), v
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    av = ok["n_chars"].to_numpy(dtype=float)
    row = search_aggs(r, None, PercentileRanksAgg("n_chars", (300.0,))).collect()[0]
    assert row["pr_300"] == pytest.approx(100.0 * (av <= 300).sum() / av.size)


@pytest.mark.parametrize("ascending", [True, False])
def test_top_metrics_agg(spark, agg_index, docs_pdf, ascending):
    """top_metrics (size=1): the metric of THE top doc by (sort, _id)."""
    from engine.aggs import top_metrics

    r = IndexReader(spark, agg_index)
    m = matched(docs_pdf).copy()
    m["url"] = m["doc_id"].astype(str)
    m = m.sort_values(["n_chars", "url"], ascending=[ascending, True],
                      kind="mergesort")
    want = m.iloc[0]
    row = top_metrics(
        r, Q, "n_chars", "lang", ascending=ascending
    ).collect()[0]
    assert (row["url"], row["sort_val"], row["metric"]) == (
        want["url"], want["n_chars"], want["lang"]
    )
