"""Upsert (replace-by-url) + atomic index swap (round-3 verdict asks #7/#8).

upsert_docs must be SCORE-identical to a fresh batch build over the
updated corpus (doc ids differ by design: updated docs append per shard,
Lucene-style). swap_index must publish a new generation atomically:
already-open readers error cleanly via the generation guard, fresh
readers serve the new index.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from engine.index_build import build_index, swap_index
from engine.query import IndexReader, bm25_topk

BASE = [
    ("u1", "alpha beta gamma delta common words here"),
    ("u2", "alpha alpha beta repeated head tokens make longer documents"),
    ("u3", "gamma delta epsilon zeta rare tail content"),
    ("u4", "beta gamma mixed middle document body text"),
    ("u5", "totally unrelated filler sentence about nothing"),
    ("u6", "alpha gamma pair document one more body"),
]
# u2 changes content entirely, u6 changes slightly, u7/u8 are brand new
BATCH = [
    ("u2", "zeta eta theta replaced content no head terms left"),
    ("u6", "alpha gamma pair document one more body plus alpha tail"),
    ("u7", "alpha beta fresh addition to the corpus"),
    ("u8", "gamma delta another brand new page"),
]
UPDATED = [d for d in BASE if d[0] not in {"u2", "u6"}] + BATCH


def _scores(spark, idx, terms, k=10):
    r = IndexReader(spark, idx)
    return [
        (x["url"], round(x["score"], 9))
        for x in bm25_topk(r, terms, k=k).collect()
    ]


def test_upsert_matches_fresh_build(spark, tmp_path):
    from engine.upsert import upsert_docs

    src = str(tmp_path / "src")
    build_index(
        spark,
        spark.createDataFrame(BASE, "url string, text string"),
        src, n_shards=2, n_buckets=4,
    )
    out = str(tmp_path / "upserted")
    m = upsert_docs(
        spark, src, spark.createDataFrame(BATCH, "url string, text string"), out
    )
    fresh = str(tmp_path / "fresh")
    mf = build_index(
        spark,
        spark.createDataFrame(UPDATED, "url string, text string"),
        fresh, n_shards=2, n_buckets=4,
    )
    assert m["n_docs"] == mf["n_docs"] == len(UPDATED)
    assert m["avgdl"] == pytest.approx(mf["avgdl"], rel=1e-12)
    for terms in (["alpha"], ["alpha", "gamma"], ["zeta", "theta"], ["beta", "delta"]):
        up, fr = _scores(spark, out, terms), _scores(spark, fresh, terms)
        # doc ids differ (append semantics) -> compare (url, score) with
        # score-ordering; ties broken by url for determinism
        assert sorted(up, key=lambda t: (-t[1], t[0])) == sorted(
            fr, key=lambda t: (-t[1], t[0])
        ), (terms, up, fr)


def test_upsert_honors_existing_tombstones_and_rejects_dups(spark, tmp_path):
    from engine.deletes import delete_docs
    from engine.upsert import upsert_docs

    src = str(tmp_path / "src2")
    build_index(
        spark,
        spark.createDataFrame(BASE, "url string, text string"),
        src, n_shards=2, n_buckets=4,
    )
    delete_docs(spark, src, spark.createDataFrame([("u5",)], "url string"))
    out = str(tmp_path / "up2")
    upsert_docs(
        spark, src, spark.createDataFrame(BATCH, "url string, text string"), out
    )
    fresh = str(tmp_path / "fresh2")
    build_index(
        spark,
        spark.createDataFrame(
            [d for d in UPDATED if d[0] != "u5"], "url string, text string"
        ),
        fresh, n_shards=2, n_buckets=4,
    )
    up = _scores(spark, out, ["alpha", "gamma"])
    fr = _scores(spark, fresh, ["alpha", "gamma"])
    assert sorted(up, key=lambda t: (-t[1], t[0])) == sorted(
        fr, key=lambda t: (-t[1], t[0])
    )
    with pytest.raises(ValueError, match="duplicate"):
        upsert_docs(
            spark, src,
            spark.createDataFrame(
                [("u9", "a b"), ("u9", "c d")], "url string, text string"
            ),
            str(tmp_path / "up3"),
        )


def test_upsert_positional_index_carries_positions(spark, tmp_path):
    """Upsert over a positional index: the position stream survives the
    main rewrite + delta encode + merge, so match_phrase over the upserted
    index is score-identical to a fresh positional build over the updated
    corpus (incl. a phrase only the REPLACED content contains)."""
    from engine.query import match_phrase_topk
    from engine.upsert import upsert_docs

    src = str(tmp_path / "possrc")
    build_index(
        spark,
        spark.createDataFrame(BASE, "url string, text string"),
        src, n_shards=2, n_buckets=4, index_options="positions",
    )
    out = str(tmp_path / "posout")
    m = upsert_docs(
        spark, src, spark.createDataFrame(BATCH, "url string, text string"), out
    )
    assert m["index_options"] == "positions"
    fresh = str(tmp_path / "posfresh")
    build_index(
        spark,
        spark.createDataFrame(UPDATED, "url string, text string"),
        fresh, n_shards=2, n_buckets=4, index_options="positions",
    )
    for phrase in ("alpha beta", "zeta eta theta", "alpha gamma pair"):
        up = [
            (x["url"], round(x["score"], 9))
            for x in match_phrase_topk(IndexReader(spark, out), phrase, k=10).collect()
        ]
        fr = [
            (x["url"], round(x["score"], 9))
            for x in match_phrase_topk(IndexReader(spark, fresh), phrase, k=10).collect()
        ]
        assert sorted(up, key=lambda t: (-t[1], t[0])) == sorted(
            fr, key=lambda t: (-t[1], t[0])
        ), (phrase, up, fr)
        if phrase == "zeta eta theta":  # only u2's REPLACED content has it
            assert [x[0] for x in up] == ["u2"]


def test_swap_index_atomic_publish(spark):
    work = tempfile.mkdtemp(prefix="sparkft_test_swap_")
    try:
        live = work + "/live"
        build_index(
            spark,
            spark.createDataFrame(BASE, "url string, text string"),
            live, n_shards=2, n_buckets=4,
        )
        old_reader = IndexReader(spark, live)
        assert bm25_topk(old_reader, ["alpha"], k=3).count() > 0

        # build + publish generation 2 (u2/u6 replaced, u7/u8 added)
        m = swap_index(
            spark,
            spark.createDataFrame(UPDATED, "url string, text string"),
            live, n_shards=2, n_buckets=4,
        )
        assert m["n_docs"] == len(UPDATED)
        import os
        assert not os.path.exists(live + ".next") and not os.path.exists(live + ".old")

        # stale reader fails CLEANLY (generation guard), never mixed data
        with pytest.raises(RuntimeError, match="generation"):
            bm25_topk(old_reader, ["alpha"], k=3).collect()

        # fresh reader serves the new generation
        new_reader = IndexReader(spark, live)
        urls = {x["url"] for x in bm25_topk(new_reader, ["zeta"], k=5).collect()}
        assert "u2" in urls  # u2's REPLACED content matches zeta now
    finally:
        shutil.rmtree(work, ignore_errors=True)
