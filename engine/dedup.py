"""Deduplication operators for large-scale training-data pipelines.

All operators are declarative DataFrame plans (shuffle-aware, no driver-side
loops); the similarity hashes are computed with cross-engine-reproducible
arithmetic (md5-derived 64-bit integers) so the DuckDB oracle can replicate
them bit-for-bit where SQL-expressible.

Operators:
- exact_dedup: hash-groupBy canonical-representative dedup (one shuffle on
  the content hash; map-side combine keeps head duplicates cheap).
- ngram_shingles / jaccard_pairs: token n-gram shingling + exact Jaccard
  over candidate pairs that share >=1 shingle (the shingle join IS the
  candidate pruning — no O(n^2) cross join).
- minhash_signatures / minhash_lsh_pairs: MinHash (k permutations via
  (a*h+b) mod p over the md5-derived shingle hash) + banded LSH bucketing;
  candidate pairs verified with exact Jaccard.
- simhash64: 64-bit SimHash over token hashes, weighted by tf; hamming-
  distance near-dup buckets via 4x16-bit band blocking.

Scale notes: every join here is an equi-join on a hash/bucket column —
AQE-skew-splittable; signatures are fixed-width arrays (no giant rows);
band-bucket join keys are (band_idx, band_hash) so a hot bucket splits
across reducers by band.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.textnorm import standard_tokenize_col

log = logging.getLogger(__name__)

# Mersenne prime 2^61-1: classic universal-hash modulus, exact in int64/
# DuckDB HUGEINT arithmetic (products of two <2^61 values overflow int64 —
# we keep a,b < 2^31 and h < 2^32 so a*h+b < 2^63, exact in BIGINT).
MERSENNE_31 = (1 << 31) - 1


def _h32(col):
    """Cross-engine 32-bit content hash: first 8 hex chars of md5 -> BIGINT.
    Identical in Spark (conv) and DuckDB (from_hex)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens_col(text_col):
    return standard_tokenize_col(F.lower(text_col))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: keeper = min id, plus duplicate count."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .withColumn("text_hash", F.md5(F.col(text_col)))
        .groupBy("text_hash")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
    )


def ngram_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle)."""
    toks = docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    )
    # shingle i = toks[i..i+n-1] joined by space; array_distinct for set
    # semantics; JVM-side transform over sequence — no UDF. The transform
    # MUST live inside a lazily-evaluated when(): with only the filter,
    # Catalyst may fuse later predicates into the same codegen stage and
    # evaluate the transform on sub-n-token rows first, where
    # sequence(0, size-n) descends into negative slice starts (a real
    # crash on short web docs, caught by an end-to-end drive).
    sh = toks.filter(F.size("toks") >= n).select(
        "doc_id",
        F.when(
            F.size("toks") >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
                )
            ),
        ).otherwise(F.array().cast("array<string>")).alias("shingles"),
    )
    return sh.select("doc_id", F.explode("shingles").alias("shingle"))


def cap_shingle_df(
    sh: DataFrame,
    max_shingle_df: int,
    count_dropped: bool | None = None,
    _sdf: DataFrame | None = None,
) -> tuple[DataFrame, int | None]:
    """Drop boilerplate shingles with document frequency > max_shingle_df
    before any shingle self-join (standard near-dup practice): one head
    shingle shared by m docs would otherwise make m^2 candidate rows — at
    web scale that's the same explosion head terms cause in the index.
    Returns (capped shingle table, number of shingles dropped); the drop
    count is logged so bounded coverage is never silent — counting costs
    one extra aggregate pass, so it runs only when INFO logging is on (or
    count_dropped=True is forced, e.g. in tests). _sdf: a precomputed
    (shingle, sdf) table to reuse, so callers that also derive an auto
    cap pay for the shingle aggregate once, not twice."""
    sdf = _sdf if _sdf is not None else sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    hot = sdf.filter(F.col("sdf") > max_shingle_df).select("shingle")
    if count_dropped is None:
        count_dropped = log.isEnabledFor(logging.INFO)
    n_dropped = None
    if count_dropped:
        n_dropped = hot.count()
        log.info(
            "cap_shingle_df: dropping %d boilerplate shingles with df > %d",
            n_dropped,
            max_shingle_df,
        )
    return sh.join(hot, "shingle", "left_anti"), n_dropped


def _pair_budget_cap(
    counts: DataFrame, size_col: str, floor: int, pairs_per_row: float
) -> int:
    """Data-derived hot-bucket threshold for a bucketed self-join, by PAIR
    BUDGET: the largest cap such that candidate pairs contributed by kept
    buckets (sum of m^2 over buckets with m <= cap) stay within
    pairs_per_row * total_rows — i.e. the join's output is LINEAR in the
    corpus by construction, never quadratic. A quantile cannot give this
    guarantee: on a degenerate corpus (every doc near-identical) the hot
    buckets ARE the upper quantiles, so any q-quantile floats up to the
    degenerate size and the guard never bites. Buckets at or below `floor`
    are always kept (legitimate near-dup clusters live there), so the
    returned cap is >= floor.

    Cost: one tiny aggregate-of-an-aggregate — the (size, n_buckets)
    histogram of an already-reduced per-bucket count table — collected to
    the driver (distinct bucket sizes of a count distribution: at most a
    few thousand rows at any corpus scale)."""
    hist = (
        counts.groupBy(size_col)
        .agg(F.count("*").alias("n"))
        .orderBy(size_col)
        .collect()
    )
    total_rows = sum(int(r[size_col]) * int(r["n"]) for r in hist)
    budget = pairs_per_row * total_rows
    acc = 0.0
    cap = floor
    for r in hist:
        m = int(r[size_col])
        acc += float(m) * m * int(r["n"])
        if acc > budget and m > floor:
            break
        cap = max(cap, m)
    return max(floor, cap)


def auto_shingle_df_cap(
    sh: DataFrame,
    floor: int = 1024,
    pairs_per_row: float = 32.0,
    _sdf: DataFrame | None = None,
) -> int:
    """Pick the boilerplate-shingle df threshold from the data by pair
    budget (_pair_budget_cap): keep the largest cap whose shingle buckets
    contribute at most pairs_per_row * corpus-rows candidate pairs to the
    shingle self-join, floored so shingles shared by < `floor` docs are
    never dropped — below that a shared shingle is a legitimate near-dup
    signal, above it boilerplate. Pass _sdf to reuse a precomputed
    (shingle, sdf) aggregate so the histogram reads the already-reduced
    table."""
    sdf = _sdf if _sdf is not None else sh.groupBy("shingle").agg(
        F.count("*").alias("sdf")
    )
    return _pair_budget_cap(sdf, "sdf", floor, pairs_per_row)


def _jaccard_over_pairs(pairs: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard restricted to the given (a, b) candidate pairs: join
    the pairs to the shingle table on BOTH sides, so verification cost is
    O(candidates x shingles-per-doc) — never the full shingle self-join."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col("doc_id").alias("a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        pairs.join(sh_a, "a")
        .join(sh_b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "union_sz", "jaccard")
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing >=1 shingle.

    (a, b, inter, union_sz, jaccard) with a < b, jaccard >= threshold.

    max_shingle_df: when set, shingles with df above it are dropped BEFORE
    the self-join (cap_shingle_df) and per-doc sizes are computed over the
    capped shingle universe — the scale guard against boilerplate-shingle
    m^2 blowup. None keeps exact semantics (the oracle baseline).
    """
    sh = ngram_shingles(docs, n, id_col, text_col)
    if max_shingle_df is not None:
        sh, _ = cap_shingle_df(sh, max_shingle_df)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "union_sz", "jaccard")
    )
    return out


def _minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k permutations — reproducible in SQL."""
    params = []
    a, b = 1103515245, 12345  # LCG-stepped, bounded < 2^31
    x = seed
    for _ in range(k):
        x = (a * x + b) % MERSENNE_31
        pa = x | 1  # odd a
        x = (a * x + b) % MERSENNE_31
        params.append((pa, x))
    return params


def _signatures_from_shingles(sh: DataFrame, k: int) -> DataFrame:
    """MinHash signatures over a prebuilt (doc_id, shingle) table — lets
    pipelines reuse ONE shingle materialization across signature build,
    banding, and verification instead of re-tokenizing per stage."""
    h = sh.withColumn("h", _h32(F.col("shingle")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_31)).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_params(k))
    ]
    wide = h.groupBy("doc_id").agg(*aggs)
    return wide.select("doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def minhash_signatures(
    docs: DataFrame, k: int = 32, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig: array<long>[k]) — min over shingles of (a*h+b) mod p,
    h = md5-derived 32-bit shingle hash. Pure column ops: k aggregate
    expressions over the exploded shingle table (map-side partial min)."""
    return _signatures_from_shingles(ngram_shingles(docs, n, id_col, text_col), k)


def _minhash_banded(sig: DataFrame, k: int, bands: int) -> DataFrame:
    rows = k // bands
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws(",", *[F.col("sig")[i] for i in range(bnd * rows, (bnd + 1) * rows)]))
                    for bnd in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """Banded-LSH candidate generation only: distinct (a, b), a < b, that
    share at least one band bucket. Join keys are (band, bucket) so a hot
    bucket splits across reducers by band. `_shingles` reuses a prebuilt
    (cached) shingle table instead of re-tokenizing."""
    assert k % bands == 0
    sh = _shingles if _shingles is not None else ngram_shingles(docs, n, id_col, text_col)
    sig = _signatures_from_shingles(sh, k)
    banded = _minhash_banded(sig, k, bands)
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None | str = "auto",
) -> DataFrame:
    """Banded-LSH candidate pairs + candidates-ONLY exact-Jaccard verify.

    k/bands signature rows per band are hashed together; pairs sharing any
    band bucket are candidates; each candidate is verified by joining the
    pair list back to the shingle table on both ids (_jaccard_over_pairs),
    so verification cost is O(candidates), NOT the full shingle self-join
    — the whole point of LSH pruning at 100 TB. Output (a, b, jaccard)
    with jaccard >= threshold, identical to exact Jaccard restricted to
    the candidate set.

    max_shingle_df: the pipeline-facing DEFAULT is "auto" — the verify
    join drops boilerplate shingles above a data-derived df threshold
    (auto_shingle_df_cap: pair-budget rule, floored at 1024 docs), so a
    mass-shared shingle can never make the verify join quadratic. Pass an
    int to pin the threshold, or None for exact uncapped semantics (the
    oracle baseline; below the floor both are identical anyway).
    """
    # ONE shingle materialization feeds signatures, banding, and the
    # verify join (tokenize+shingle dominates at small candidate counts;
    # without the persist each stage would recompute it from the corpus).
    # The small result is localCheckpoint-ed eagerly so the shingle cache
    # can be RELEASED before returning — repeated calls in a long-lived
    # session must not each pin a corpus-sized table in storage memory.
    sh = ngram_shingles(docs, n, id_col, text_col).persist()
    try:
        cand = lsh_candidate_pairs(docs, k, bands, n, id_col, text_col, _shingles=sh)
        vsh = sh
        if max_shingle_df is not None:
            # ONE aggregate pass over the persisted shingle table feeds
            # both the auto-cap histogram and the hot-shingle filter (the
            # round-3 version ran the groupBy twice — once inside
            # auto_shingle_df_cap, once inside cap_shingle_df).
            sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf")).persist()
            if max_shingle_df == "auto":
                max_shingle_df = auto_shingle_df_cap(sh, _sdf=sdf)
            vsh, _ = cap_shingle_df(sh, max_shingle_df, _sdf=sdf)
        out = (
            _jaccard_over_pairs(cand, vsh, threshold)
            .select("a", "b", "jaccard")
            .localCheckpoint(eager=True)
        )
        if max_shingle_df is not None:
            sdf.unpersist()
    finally:
        sh.unpersist()
    return out


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — 64-bit SimHash over token md5-hashes with
    tf weights: bit j of the fingerprint = sign of sum over tokens of
    tf * (bit_j(h) ? +1 : -1). Pure column ops: 64 conditional sums."""
    toks = docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # 64-bit token hash from md5 hex (first 16 hex chars -> signed-safe via
    # two 32-bit halves)
    tf = tf.withColumn("h_hi", _h32(F.col("tok"))).withColumn(
        "h_lo", F.conv(F.substring(F.md5(F.col("tok")), 9, 8), 16, 10).cast("long")
    )
    bit_sums = []
    for j in range(32):
        bit_sums.append(
            F.sum(F.when(F.shiftright(F.col("h_lo"), j).bitwiseAND(1) == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"s{j}")
        )
    for j in range(32):
        bit_sums.append(
            F.sum(F.when(F.shiftright(F.col("h_hi"), j).bitwiseAND(1) == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"s{32 + j}")
        )
    wide = tf.groupBy("doc_id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for j in range(63):  # top bit left 0: keeps the value non-negative
        fp = fp + F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return wide.select("doc_id", fp.alias("simhash"))


def auto_band_df_cap(
    bdf: DataFrame, floor: int = 1024, pairs_per_row: float = 32.0
) -> int:
    """Simhash twin of auto_shingle_df_cap: pick the hot-band threshold by
    pair budget (_pair_budget_cap) over the (band, key) bucket-size
    distribution, floored so buckets holding < `floor` docs — ordinary
    near-dup groups — are never dropped. Takes the already-aggregated
    (band, key, bdf) table, so the histogram reads a tiny reduced input."""
    return _pair_budget_cap(bdf, "bdf", floor, pairs_per_row)


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_band_df: int | None | str = "auto",
    **kw,
) -> DataFrame:
    """Near-dup candidates via 4x16-bit band blocking (any identical band ->
    candidate; guaranteed to catch all pairs with hamming <= 3), verified by
    exact popcount of the XOR.

    max_band_df: hot-band guard (the simhash twin of cap_shingle_df) — a
    degenerate corpus (mass-produced boilerplate, or near-empty docs all
    hashing to the same fingerprint) can put m docs in one (band, key)
    bucket and make m^2 candidate rows in the self-join. The pipeline-facing
    DEFAULT is "auto": the threshold is derived from a pair budget over
    the bucket-size distribution (auto_band_df_cap, floored at 1024), so the
    self-join can never go quadratic on a degenerate corpus — mirroring
    minhash_lsh_pairs. Buckets above the threshold are dropped BEFORE the
    join with a logged drop count; pairs found through the remaining bands
    are still verified exactly. Recall note: a hamming<=3 pair agrees on
    >= 1 of the 4 bands, so it survives unless ALL its agreeing bands are
    hot — which at a cap >> expected cluster size only happens for
    boilerplate clusters that exact_dedup should collapse first. Pass an
    int to pin the threshold, or None for exact uncapped blocking (the
    oracle baseline; below the floor both are identical anyway)."""
    # The fingerprint table is persisted while the plan runs: the band
    # self-join reads it twice (x/y) and the auto cap once more — without
    # the persist each would recompute the wide simhash64 aggregate. The
    # (a, b, hamming) result is tiny, so it is localCheckpoint-ed eagerly
    # and the fingerprint cache released before returning (same contract
    # as minhash_lsh_pairs: no storage pinned across calls).
    sh = simhash64(docs, **kw).persist()
    try:
        bands = sh.select(
            "doc_id",
            "simhash",
            F.posexplode(
                F.array(*[F.shiftright(F.col("simhash"), 16 * i).bitwiseAND((1 << 16) - 1) for i in range(4)])
            ).alias("band", "key"),
        )
        if max_band_df is not None:
            # One aggregate pass feeds both the auto threshold and the hot
            # filter; the reduced (band, key, bdf) table is at most 4x
            # n_docs rows and the histogram runs over it, not over bands.
            bdf = bands.groupBy("band", "key").agg(F.count("*").alias("bdf"))
            if max_band_df == "auto":
                max_band_df = auto_band_df_cap(bdf)
            hot = bdf.filter(F.col("bdf") > max_band_df).select("band", "key")
            if log.isEnabledFor(logging.INFO):
                n_hot = hot.count()
                log.info(
                    "simhash_near_dup_pairs: dropping %d hot (band, key) buckets "
                    "with df > %d", n_hot, max_band_df,
                )
            bands = bands.join(hot, ["band", "key"], "left_anti")
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("a"),
                F.col("y.doc_id").alias("b"),
                F.col("x.simhash").alias("ha"),
                F.col("y.simhash").alias("hb"),
            )
            .distinct()
        )
        xor = F.col("ha").bitwiseXOR(F.col("hb"))
        ham = sum(F.shiftright(xor, j).bitwiseAND(1) for j in range(64))
        out = (
            cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming")
            .localCheckpoint(eager=True)
        )
    finally:
        sh.unpersist()
    return out


def dedup_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Exact connected components over near-dup pairs: (node, component)
    with component = the minimum doc id reachable through the pair graph —
    the resolver for CHAINED duplicate clusters (a~b, b~c => one cluster),
    which the star-shaped dedup_keep_first cannot collapse exactly.

    Iterative min-label propagation as pure DataFrame rounds (the
    hash-join formulation of large-star/small-star): each round every
    node takes min(own label, neighbors' labels); converges in
    O(graph diameter) rounds — near-dup clusters are shallow, so a
    handful of shuffles at any scale. Lineage is truncated per round
    (localCheckpoint) so plans don't snowball."""
    edges = pairs.select(F.col("a").cast("long"), F.col("b").cast("long"))
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("nl")), "b"
            )
            .groupBy("a")
            .agg(F.min("nl").alias("cand"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("cand"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # silent non-convergence would report one chained cluster as
        # several components — refuse rather than return wrong labels
        raise RuntimeError(
            f"dedup_components did not converge within max_iter={max_iter} "
            "rounds (pair-graph diameter exceeds it); raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_keep_first_exact(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one doc (the min id) per CONNECTED near-dup cluster:
    drop every node whose component label differs from itself."""
    drop = (
        dedup_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(drop, id_col, "left_anti")


def dedup_keep_first(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Resolve near-dup pairs to a keep-set: drop any doc that appears as
    the 'b' of a pair with a smaller keeper (greedy min-id union: b>a always
    here, so dropping all b's keeps exactly the min-id representative of
    every connected component's star; chained components resolve over the
    min window)."""
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    return docs.join(drop, id_col, "left_anti")


def ngram_decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    probe_text_col: str = "text",
    exclude_self: bool = False,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Dolma practice):
    flag corpus docs sharing any exact token n-gram with a probe
    (benchmark/test-set) document. Returns one row per contaminated doc:
    (doc_id, hit_shingles = distinct shared n-grams, hit_probes =
    distinct probe docs shared with). Clean docs emit nothing — the
    caller removes hits with a left_anti join (dedup_keep_first pattern).

    Scale shape: both sides reduce to distinct (id, shingle) rows
    JVM-side (ngram_shingles — transform/sequence, no UDF); the join is
    keyed on the shingle. Probe sets are benchmark-sized (tiny vs the
    corpus), so the probe side broadcasts by default and the corpus
    shingle stream is never shuffled; set broadcast_probes=False for a
    probe set too big to broadcast (falls back to a shuffle join).
    exclude_self drops doc_id == probe_id rows for the self-audit case
    where probes are drawn from the corpus itself."""
    c = ngram_shingles(docs, n, id_col, text_col)
    p = ngram_shingles(probes, n, probe_id_col, probe_text_col).withColumnRenamed(
        "doc_id", "probe_id"
    )
    if broadcast_probes:
        p = F.broadcast(p)
    j = c.join(p, "shingle")
    if exclude_self:
        j = j.filter(F.col("doc_id") != F.col("probe_id"))
    return j.groupBy("doc_id").agg(
        F.count_distinct("shingle").alias("hit_shingles"),
        F.count_distinct("probe_id").alias("hit_probes"),
    )
