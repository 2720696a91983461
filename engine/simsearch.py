"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k neighbors for a set of probe
  vectors — the correctness baseline. Probes broadcast (tiny), corpus
  scanned once, JVM-side F.aggregate/zip_with arithmetic (SQL-expressible
  for the DuckDB oracle).
- lsh_ann_topk: the scale path — random-hyperplane LSH bucketing
  (deterministic seed); candidates = corpus vectors sharing a bucket with
  the probe in any of `tables` hash tables; exact cosine re-rank of
  candidates only. At 100 TB the bucket join replaces the full scan; recall
  is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k per probe: (probe_id, neighbor_id, cos) with
    rank by cos desc, neighbor_id asc. Excludes self-matches."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("cvec"), F.col("pvec")) / (_norm(F.col("cvec")) * _norm(F.col("pvec"))),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, n_bits, dim))


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id, table, bucket) — sign pattern of `n_bits` random hyperplane
    dot products per table. Hyperplanes are literal columns (deterministic,
    shipped in the plan; fine for n_bits*dim in the hundreds)."""
    out_rows = []
    planes = _hyperplanes(dim, n_bits, tables, seed)
    v = F.col(vec_col)
    for t in range(tables):
        bucket = F.lit(0)
        for j in range(n_bits):
            coeffs = F.array(*[F.lit(float(x)) for x in planes[t, j]])
            proj = F.aggregate(
                F.zip_with(v, coeffs, lambda x, c: x * c), F.lit(0.0), lambda acc, x: acc + x
            )
            bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out_rows.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return df.select(
        F.col(id_col).alias("vid"), F.explode(F.array(*out_rows)).alias("tb")
    ).select("vid", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    dim: int | None = None,
    n_bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos) with a < b and
    cos >= threshold (cos rounded to 6 for cross-engine determinism).

    method="exact": all-pairs — the correctness baseline (SQL-expressible).
    method="lsh": random-hyperplane bucket join prunes candidates before
    the exact cosine verify — the 100TB path (candidates ~ bucket
    collisions, not n^2); recall vs exact is tested.
    """
    c = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("avec"))
    d = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("bvec"))
    if method == "exact":
        pairs = c.join(d, F.col("a") < F.col("b"))
    else:
        assert dim is not None
        bk = lsh_buckets(corpus, dim, n_bits, tables, id_col, vec_col, seed)
        cand = (
            bk.alias("x")
            .join(
                bk.alias("y"),
                (F.col("x.table") == F.col("y.table"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vid") < F.col("y.vid")),
            )
            .select(F.col("x.vid").alias("a"), F.col("y.vid").alias("b"))
            .distinct()
        )
        pairs = cand.join(c, "a").join(d, "b")
    return (
        pairs.withColumn(
            "cos",
            F.round(
                _dot(F.col("avec"), F.col("bvec"))
                / (_norm(F.col("avec")) * _norm(F.col("bvec"))),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def ivf_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the `n_centroids` corpus vectors
    with the smallest ids, as (cid, cvec). A production deployment would
    train these with k-means (e.g. pyspark.ml KMeans) — every op below
    accepts an injectable centroid DataFrame for that — but the frozen
    min-id selection is reproducible in ANSI SQL, which is what makes the
    whole IVF path driver-oracle-checkable."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cent_vec"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Trained IVF coarse quantizer: pyspark.ml KMeans (k-means|| init)
    over the corpus embeddings, returned in the same (cid, cent_vec)
    shape ivf_ann_topk's `centroids=` hook consumes. This is the
    production quantizer (real centroids track the data distribution, so
    posting lists are balanced and nprobe recall is higher than the
    frozen min-id quantizer, which exists for SQL-oracle reproducibility
    — recall of both is compared in tests). Distributed fit: one pass
    per iteration over the vectors, centroids broadcast by ml.KMeans."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # spherical k-means: the IVF assignment metric is COSINE, so vectors are
    # L2-normalized before the Euclidean fit (on the unit sphere, Euclidean
    # and cosine neighborhoods coincide); unnormalized KMeans centroids
    # chase magnitude, not direction, and measurably hurt nprobe recall
    v = F.col(vec_col).cast("array<double>")
    unit = F.transform(v, lambda x: x / _norm(v))
    feat = corpus.select(array_to_vector(unit).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    import pandas as pd

    cents = model.clusterCenters()
    pdf = pd.DataFrame(
        {"cid": range(len(cents)), "cent_vec": [[float(x) for x in c] for c in cents]}
    )
    return corpus.sparkSession.createDataFrame(pdf, "cid long, cent_vec array<double>")


def _nearest_centroids(
    vecs: DataFrame, cents: DataFrame, nprobe: int, id_out: str, vec_out: str
) -> DataFrame:
    """(id, list_id) — each vector's `nprobe` nearest centroids by cosine
    (tiebreak cid asc). Centroids broadcast (tiny); ONE pass over the
    vectors. The embedding is projected away BEFORE the row_number window,
    so the shuffle on the vector id moves (id, cid, ccos) rows — not
    dim-sized double arrays replicated n_centroids times."""
    from pyspark.sql import Window

    scored = vecs.crossJoin(F.broadcast(cents)).select(
        id_out,
        F.col("cid"),
        (
            _dot(F.col(vec_out), F.col("cent_vec"))
            / (_norm(F.col(vec_out)) * _norm(F.col("cent_vec")))
        ).alias("ccos"),
    )
    w = Window.partitionBy(id_out).orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select(id_out, F.col("cid").alias("list_id"))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their single
    nearest centroid's posting list; a probe searches only the `nprobe`
    lists nearest to it; candidates are exactly re-ranked by cosine.

    (probe_id, neighbor_id, cos, rank), rank by cos desc / neighbor_id asc.

    The scale path vs brute force: candidate count ~ N * nprobe /
    n_centroids instead of N per probe, and the list assignment is a
    build-time artifact (one broadcast-join pass, partitionable by
    list_id on disk exactly like the term buckets of the text index).
    Recall vs the exact scan is tested (tests/test_simsearch.py)."""
    cents = centroids if centroids is not None else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
    c_assign = _nearest_centroids(c, cents, 1, "neighbor_id", "cvec")
    p_assign = _nearest_centroids(p, cents, nprobe, "probe_id", "pvec")
    cand = (
        p_assign.select("probe_id", "list_id")
        .join(c_assign.select("neighbor_id", "list_id"), "list_id")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(p), "probe_id")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("cvec"), F.col("pvec")) / (_norm(F.col("cvec")) * _norm(F.col("pvec"))),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: bucket-join candidates, exact cosine re-rank."""
    cb = lsh_buckets(corpus, dim, n_bits, tables, id_col, vec_col, seed)
    pb = lsh_buckets(probes, dim, n_bits, tables, probe_id_col, vec_col, seed)
    cand = (
        cb.join(pb.withColumnRenamed("vid", "probe_id"), ["table", "bucket"])
        .filter(F.col("vid") != F.col("probe_id"))
        .select(F.col("probe_id"), F.col("vid").alias("neighbor_id"))
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(p), "probe_id")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("cvec"), F.col("pvec")) / (_norm(F.col("cvec")) * _norm(F.col("pvec"))),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )
