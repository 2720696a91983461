"""Extractor invariant (byte-identical per url) + corpus determinism."""

from __future__ import annotations

import pyarrow.parquet as pq

from engine import synth
from engine.extract import extract_text, extract_text_py


def test_extract_inverts_boilerplate():
    cases = ["hello world", "", "a & b < c > d", "tok " * 100]
    for i, text in enumerate(cases):
        html = synth.make_html(text, i)
        assert extract_text_py(html) == text.strip()


def test_corpus_deterministic_and_invariant(pages_1k):
    t = pq.read_table(pages_1k)
    assert t.num_rows == 1000
    urls = t.column("url").to_pylist()
    texts = t.column("text").to_pylist()
    htmls = t.column("html").to_pylist()
    n_null = sum(x is None for x in texts)
    n_empty = sum(x == "" for x in texts)
    assert 0 < n_null < 50 and 0 < n_empty < 50
    # frozen invariant: extract(html) == text, byte-identical per url
    for u, h, x in zip(urls, htmls, texts):
        if x is None:
            assert h is None
            continue
        got = extract_text_py(h)
        assert got.encode() == x.encode(), u
    # regenerate → identical bytes (seed-stable)
    t2 = synth.generate_pages(1000)
    assert t2.column("text").to_pylist() == texts
    assert t2.column("url").to_pylist() == urls


def test_extract_udf_matches_py(spark, pages_1k):
    df = spark.read.parquet(pages_1k).limit(200)
    rows = df.select("url", "html", "text", extract_text("html").alias("ext")).collect()
    assert len(rows) == 200
    for r in rows:
        expected = extract_text_py(r["html"])
        assert r["ext"] == expected
        if r["text"] is not None:
            assert r["ext"] == r["text"]


def test_frozen_queries_stable():
    q1 = synth.frozen_queries()
    q2 = synth.frozen_queries()
    assert q1 == q2
    assert len(q1) == 20
    kinds = [q["kind"] for q in q1]
    assert kinds.count("single") == 5 and kinds.count("absent") == 2
    vocab = set(synth.make_vocab())
    for q in q1:
        if q["kind"] in ("single", "and", "or"):
            assert all(t in vocab for t in q["terms"])
        if q["kind"] == "absent":
            assert all(t not in vocab for t in q["terms"])
