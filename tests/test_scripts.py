"""ES script_score (engine/scripts.py): the frozen safe-expression
compiler and its query-path integration.

The compiled script replaces the BM25 score before the top-k cut (exact
TAAT, same rule as function_score), so the brute twin recomposes the
expected ranking from the Bm25Oracle scores plus the same numpy
expression."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.index_build import build_index
from engine.oracle import Bm25Oracle, analyze_query_py
from engine.query import IndexReader, bm25_topk
from engine.scripts import compile_score_script

from tests.conftest import SF001

Q = ["hash", "join"]
SRC = "_score * saturation(doc['n_chars'].value, 500) + log1p(doc['n_chars'].value)"


def test_compiler_grammar_and_vectorized_eval():
    fields, fn = compile_score_script(SRC)
    assert fields == ["n_chars"]
    s = np.array([1.0, 2.0, 0.5])
    v = np.array([100.0, 500.0, 0.0])
    want = s * (v / (v + 500.0)) + np.log1p(v)
    assert np.allclose(fn(s, {"n_chars": v}), want)
    # constants / unary minus / pow / sigmoid
    _f, g = compile_score_script("sigmoid(_score, 2, 3) - -1.5 + 2 ** 2")
    got = g(s, {})
    assert np.allclose(got, s**3 / (2.0**3 + s**3) + 1.5 + 4.0)
    # rejections: anything outside the frozen grammar
    for bad in (
        "__import__('os')",
        "foo(_score)",
        "doc['x'].anything",
        "doc[1].value",
        "x + 1",
        "'str'",
        "_score if 1 else 2",
        "log1p(x=1)",
    ):
        with pytest.raises(ValueError):
            compile_score_script(bad)


@pytest.fixture(scope="module")
def script_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scriptidx") / "idx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"),
        "text", "n_chars",
    )
    build_index(
        spark, d, out, n_shards=4, n_buckets=8, docvalue_cols=["n_chars"]
    )
    return out


def _brute_script_topk(docs_pdf: pd.DataFrame, k: int):
    ok = docs_pdf[docs_pdf["text"].notna() & (docs_pdf["text"] != "")]
    orc = Bm25Oracle(list(zip(ok["doc_id"], ok["text"])))
    hits = orc.topk(Q, k=10**9)
    sc = pd.DataFrame(hits, columns=["doc_id", "score"]).merge(
        ok[["doc_id", "n_chars"]], on="doc_id"
    )
    s = sc["score"].to_numpy(float)
    v = sc["n_chars"].to_numpy(float)
    sc["new"] = s * (v / (v + 500.0)) + np.log1p(v)
    sc = sc.sort_values(
        ["new", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    return sc.head(k)


@pytest.mark.parametrize("execution", ["local", "spark"])
def test_script_score_replaces_ranking(spark, script_index, execution):
    import pyarrow.parquet as pq

    docs_pdf = pq.read_table(
        os.path.join(SF001, "documents.parquet")
    ).to_pandas()
    r = IndexReader(spark, script_index)
    got = bm25_topk(r, Q, k=10, script=SRC, execution=execution).collect()
    want = _brute_script_topk(docs_pdf, k=10)
    assert [x["url"] for x in got] == [str(d) for d in want["doc_id"]]
    for x, w in zip(got, want["new"]):
        assert x["score"] == pytest.approx(w, rel=1e-9)
    # the script genuinely REPLACES the ranking (differs from plain BM25)
    plain = [x["url"] for x in bm25_topk(r, Q, k=10, execution=execution).collect()]
    assert [x["url"] for x in got] != plain


def test_script_score_dsl_and_guards(spark, script_index):
    from engine.dsl import search

    r = IndexReader(spark, script_index)
    body = {
        "query": {"script_score": {
            "query": {"match": {"text": " ".join(Q)}},
            "script": {"source": SRC},
        }},
        "size": 7,
    }
    want = [
        (x["url"], round(x["score"], 9))
        for x in bm25_topk(r, Q, k=7, script=SRC).collect()
    ]
    got = [
        (h["_id"], round(h["_score"], 9))
        for h in search(r, body)["hits"]["hits"]
    ]
    assert got == want
    # a script referencing a non-docvalue field fails loudly
    with pytest.raises(ValueError, match="docvalues"):
        bm25_topk(r, Q, k=5, script="doc['nope'].value")
