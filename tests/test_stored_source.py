"""Stored-source layer (ES `_source`/stored fields; the reference mapping
stores non-indexed fields, config/search_scheme.json:213-224 "index":"false"):
build_index(store_source=...) keeps source columns in the docmap; highlight,
_source, and mget serve from the index without a corpus pass."""

from __future__ import annotations

import pytest

from engine.index_build import build_index
from engine.query import IndexReader, mget


@pytest.fixture(scope="module")
def src_index(spark, tmp_path_factory):
    rows = [
        (f"u{i}", f"doc number {i} about spark search engines " + "pad " * i,
         f"extra-{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string, note string")
    out = str(tmp_path_factory.mktemp("srcidx") / "idx")
    build_index(
        spark, df, out, n_shards=2, n_buckets=4,
        store_source=["text", "note"],
    )
    return out, dict((u, (t, n)) for u, t, n in rows)


def test_manifest_and_roundtrip(spark, src_index):
    out, rows = src_index
    r = IndexReader(spark, out)
    assert r.stored_cols == ["text", "note"]
    got = r.get_source(["u3", "u17", "missing"])
    assert got["u3"] == {"text": rows["u3"][0], "note": rows["u3"][1]}
    assert got["u17"]["note"] == "extra-17"
    assert "missing" not in got
    # DataFrame view round-trips every stored value
    vals = {x["url"]: (x["text"], x["note"])
            for x in r.stored_source_df().collect()}
    assert vals == rows


def test_mget_stored_field(spark, src_index):
    out, rows = src_index
    r = IndexReader(spark, out)
    got = {x["url"]: (x["found"], x["note"])
           for x in mget(r, ["u5", "nope"], fields=["note"]).collect()}
    assert got["u5"] == (True, "extra-5")
    assert got["nope"] == (False, None)


def test_search_source_and_highlight_no_corpus(spark, src_index):
    from engine.dsl import search

    out, rows = src_index
    r = IndexReader(spark, out)
    resp = search(
        r,
        {"query": {"match": {"text": "spark"}}, "size": 3,
         "_source": ["note"], "highlight": {"fields": {"text": {}}}},
    )
    hits = resp["hits"]["hits"]
    assert hits, "query must match"
    for h in hits:
        assert h["_source"] == {"note": rows[h["_id"]][1]}
        assert "<em>spark</em>" in h["highlight"]["text"][0]


def test_source_without_store_raises(spark, tmp_path_factory):
    from engine.dsl import search

    df = spark.createDataFrame(
        [("a", "one two"), ("b", "two three")], "url string, text string"
    )
    out = str(tmp_path_factory.mktemp("nosrc") / "idx")
    build_index(spark, df, out, n_shards=1, n_buckets=2)
    r = IndexReader(spark, out)
    with pytest.raises(ValueError, match="store_source"):
        search(r, {"query": {"match": {"text": "two"}}, "_source": True})
    with pytest.raises(ValueError, match="store_source|corpus"):
        search(r, {"query": {"match": {"text": "two"}},
                   "highlight": {"fields": {"text": {}}}})
