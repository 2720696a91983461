"""Similarity-search operators: exact baseline vs LSH scale paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.simsearch import cosine_topk, embedding_near_dup_pairs, lsh_ann_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_lsh_ann_recall_vs_exact(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "probe_id")
    exact = cosine_topk(emb, probes, k=5)
    ann = lsh_ann_topk(emb, probes, dim=64, k=5, n_bits=4, tables=8)
    e = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["probe_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # 4-bit x 8-table LSH on random vectors


def test_embedding_near_dup_lsh_recall(spark, emb):
    exact = embedding_near_dup_pairs(emb, threshold=0.4, method="exact")
    lsh = embedding_near_dup_pairs(
        emb, threshold=0.4, method="lsh", dim=64, n_bits=4, tables=8
    )
    e = {(r["a"], r["b"]) for r in exact.collect()}
    l = {(r["a"], r["b"]) for r in lsh.collect()}
    assert l <= e  # LSH candidates are verified exactly -> no false pairs
    assert len(e) > 0
    assert len(e & l) / len(e) >= 0.5, (len(e), len(l))
