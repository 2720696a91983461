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
    rank by cos desc, neighbor_id asc. Excludes self-matches (compared
    as STRINGS: id identity must not depend on the id column's type —
    a string-vs-long compare would ANSI-cast and crash on non-numeric
    ids, e.g. the hybrid layout where vec_id == url)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(
            F.col("neighbor_id").cast("string")
            != F.col("probe_id").cast("string")
        )
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
        .filter(
            F.col("neighbor_id").cast("string")
            != F.col("probe_id").cast("string")
        )
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
        .filter(
            F.col("vid").cast("string")
            != F.col("probe_id").cast("string")
        )
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


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized vector storage (round-5)
# ---------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks: (sub, code, cw, cw_norm2) — the `ks`
    min-id corpus vectors' sub-vectors, code = rank by id within each
    subspace. Frozen min-id selection for the same reason as
    ivf_centroids: ANSI-SQL reproducibility makes the whole IVF-PQ path
    driver-oracle-checkable; kmeans_pq_codebooks is the trained
    production twin (every op below takes an injectable codebook)."""
    assert dim % m == 0, f"dim {dim} must divide into m={m} subspaces"
    sub_len = dim // m
    from pyspark.sql import Window

    w = Window.orderBy(F.col(id_col).asc())
    base = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(ks)
        .withColumn("code", F.row_number().over(w) - 1)
    )
    subs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.slice(F.col(vec_col).cast("array<double>"), s * sub_len + 1, sub_len).alias("cw"),
        )
        for s in range(m)
    ])
    return base.select("code", F.explode(subs).alias("sc")).select(
        F.col("sc.sub").alias("sub"),
        "code",
        F.col("sc.cw").alias("cw"),
        F.aggregate(F.col("sc.cw"), F.lit(0.0), lambda a, x: a + x * x).alias("cw_norm2"),
    )


def kmeans_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Trained PQ codebooks: one pyspark.ml KMeans per subspace over the
    corpus sub-vectors, same (sub, code, cw, cw_norm2) shape as the frozen
    quantizer. M fits over the same scan (column-pruned sub-slices)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    assert dim % m == 0
    sub_len = dim // m
    import pandas as pd

    rows = []
    v = F.col(vec_col).cast("array<double>")
    for s in range(m):
        feat = corpus.select(
            array_to_vector(F.slice(v, s * sub_len + 1, sub_len)).alias("features")
        )
        model = KMeans(k=ks, seed=seed + s, maxIter=max_iter).fit(feat)
        for code, c in enumerate(model.clusterCenters()):
            cw = [float(x) for x in c]
            rows.append((s, code, cw, float(sum(x * x for x in cw))))
    return corpus.sparkSession.createDataFrame(
        pd.DataFrame(rows, columns=["sub", "code", "cw", "cw_norm2"]),
        "sub int, code int, cw array<double>, cw_norm2 double",
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub, code) PQ codes: per subspace, the L2-nearest codeword
    (tiebreak code asc). One broadcast join of the tiny codebook against
    the exploded sub-vectors and one min-struct aggregation — at 100 TB
    this is a build-time artifact stored beside the vectors (M uint8
    codes replace dim floats: 8 bytes vs 256 for dim=64 float32, a 32x
    storage cut), re-encoded only when the codebooks retrain."""
    assert dim % m == 0
    sub_len = dim // m
    subs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.slice(F.col(vec_col).cast("array<double>"), s * sub_len + 1, sub_len).alias("sv"),
        )
        for s in range(m)
    ])
    exploded = corpus.select(
        F.col(id_col).alias("vid"), F.explode(subs).alias("sc")
    ).select("vid", F.col("sc.sub").alias("sub"), F.col("sc.sv").alias("sv"))
    dist = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cw"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        exploded.join(F.broadcast(codebooks), "sub")
        .select("vid", "sub", F.struct(dist.alias("d"), F.col("code")).alias("dc"))
        .groupBy("vid", "sub")
        .agg(F.min("dc").alias("best"))
        .select("vid", "sub", F.col("best.code").alias("code"))
    )


def ivf_pq_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN: IVF candidate selection (nprobe lists), ASYMMETRIC
    distance over PQ codes (probe x codebook lookup tables — the probe
    side stays full-precision, candidates are scored from their M codes
    without touching the stored vectors), exact cosine re-rank of the
    top-`refine` ADC candidates per probe.

    (probe_id, neighbor_id, cos, rank), rank by exact cos desc /
    neighbor_id asc — identical output shape to ivf_ann_topk; with
    refine >= the per-probe candidate count the result EQUALS ivf_ann_topk
    (property-tested), smaller refine trades recall for IO.

    Why this is the 100 TB path: the embedding table dwarfs the text at
    scale, and the re-rank is the only stage that reads full vectors —
    candidates ~ N*nprobe/n_centroids are scored from the (id, codes)
    table (M bytes/vector), and only refine*|probes| rows hit the float
    arrays. The ADC approximates cos(probe, reconstruction): dot from the
    per-subspace LUT sums, |recon| from the codeword norms."""
    cents = centroids if centroids is not None else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    books = codebooks if codebooks is not None else pq_codebooks(corpus, dim, m, ks, id_col, vec_col)
    sub_len = dim // m
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
    c_assign = _nearest_centroids(c, cents, 1, "neighbor_id", "cvec")
    p_assign = _nearest_centroids(p, cents, nprobe, "probe_id", "pvec")
    cand = (
        p_assign.select("probe_id", "list_id")
        .join(c_assign.select("neighbor_id", "list_id"), "list_id")
        .filter(
            F.col("neighbor_id").cast("string")
            != F.col("probe_id").cast("string")
        )
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    codes = pq_encode(corpus, books, dim, m, id_col, vec_col).withColumnRenamed(
        "vid", "neighbor_id"
    )
    # probe-side LUT: (probe_id, sub, code, part=dot(p_sub, cw), cw_norm2)
    # — |probes| x m x ks rows, broadcast
    psubs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.slice(F.col("pvec").cast("array<double>"), s * sub_len + 1, sub_len).alias("sv"),
        )
        for s in range(m)
    ])
    lut = (
        p.select("probe_id", F.col("pvec"), F.explode(psubs).alias("sc"))
        .select(
            "probe_id",
            F.col("sc.sub").alias("sub"),
            F.col("sc.sv").alias("psv"),
        )
        .join(F.broadcast(books), "sub")
        .select(
            "probe_id",
            "sub",
            "code",
            _dot(F.col("psv"), F.col("cw")).alias("part"),
            "cw_norm2",
        )
    )
    pnorm = p.select("probe_id", _norm(F.col("pvec")).alias("pnorm"))
    adc = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(lut), ["probe_id", "sub", "code"])
        .groupBy("probe_id", "neighbor_id")
        .agg(F.sum("part").alias("adc_dot"), F.sum("cw_norm2").alias("recon2"))
        .join(F.broadcast(pnorm), "probe_id")
        .withColumn(
            "adc_cos", F.col("adc_dot") / (F.col("pnorm") * F.sqrt(F.col("recon2")))
        )
    )
    from pyspark.sql import Window

    wa = Window.partitionBy("probe_id").orderBy(F.desc("adc_cos"), F.asc("neighbor_id"))
    shortlist = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= refine)
        .select("probe_id", "neighbor_id")
    )
    scored = (
        shortlist.join(c, "neighbor_id")
        .join(F.broadcast(p), "probe_id")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("cvec"), F.col("pvec")) / (_norm(F.col("cvec")) * _norm(F.col("pvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )
