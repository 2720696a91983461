"""Similarity-search operators: exact baseline vs LSH scale paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.simsearch import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
)

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


def test_ivf_ann_recall_vs_exact(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "probe_id")
    exact = cosine_topk(emb, probes, k=5)
    ivf = ivf_ann_topk(emb, probes, n_centroids=16, nprobe=6, k=5)
    e = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["probe_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # nprobe=6/16 lists on random vectors


def test_ivf_ann_candidates_are_pruned(spark, emb):
    """IVF must score strictly fewer candidate pairs than brute force:
    nprobe/n_centroids of the corpus per probe in expectation."""
    probes = emb.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "probe_id")
    from engine.simsearch import _nearest_centroids, ivf_centroids

    cents = ivf_centroids(emb, 16)
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec"))
    p = probes.select("probe_id", F.col("embedding").alias("pvec"))
    n_cand = (
        _nearest_centroids(p, cents, 4, "probe_id", "pvec")
        .select("probe_id", "list_id")
        .join(_nearest_centroids(c, cents, 1, "neighbor_id", "cvec").select("neighbor_id", "list_id"), "list_id")
        .count()
    )
    n_total = emb.count() * 10
    assert n_cand < 0.6 * n_total, (n_cand, n_total)


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


def test_kmeans_centroids_recall_at_least_min_id(spark, emb):
    """The trained quantizer (pyspark.ml KMeans via the centroids= hook)
    must reach at least the frozen min-id quantizer's recall on the same
    nprobe budget — real centroids track the data distribution.

    Probes are taken DISJOINT from the min-id centroid ids (vec 0..15):
    a probe that IS a centroid always probes its own list first, which
    inflates the min-id quantizer's recall artificially."""
    from engine.simsearch import kmeans_centroids

    probes = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)).withColumnRenamed("vec_id", "probe_id")
    exact = {
        (r["probe_id"], r["neighbor_id"]) for r in cosine_topk(emb, probes, k=5).collect()
    }
    minid = {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, probes, n_centroids=16, nprobe=4, k=5).collect()
    }
    km_cents = kmeans_centroids(emb, 16)
    km = {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_ann_topk(
            emb, probes, n_centroids=16, nprobe=4, k=5, centroids=km_cents
        ).collect()
    }
    r_minid = len(exact & minid) / len(exact)
    r_km = len(exact & km) / len(exact)
    assert r_km >= r_minid, (r_km, r_minid)
