"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column ops (JVM-side, SQL-expressible for
the DuckDB oracle); deterministic, frozen heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.textnorm import standard_tokenize_col

# Frozen stopword list for the language heuristic + quality scoring.
EN_STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "but", "not", "what",
    "all", "were", "we", "when", "your", "can", "said", "there",
)
CY_STOPWORDS = (
    "y", "yr", "a", "ac", "i", "o", "yn", "ar", "am", "gan", "mae", "bod",
    "wedi", "ei", "eu", "un", "dau", "tri", "hi", "fe",
)


def _stopword_hits(tokens_col, words: tuple[str, ...]):
    return F.size(F.array_intersect(tokens_col, F.array(*[F.lit(w) for w in words])))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language heuristic: distinct-token overlap with the
    en/cy profiles; 'und' when neither profile hits."""
    toks = F.array_distinct(standard_tokenize_col(F.lower(F.col(text_col))))
    d = docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    )
    d = d.withColumn("en_hits", _stopword_hits(F.col("toks"), EN_STOPWORDS)).withColumn(
        "cy_hits", _stopword_hits(F.col("toks"), CY_STOPWORDS)
    )
    return d.select(
        "doc_id",
        "en_hits",
        "cy_hits",
        F.when((F.col("en_hits") == 0) & (F.col("cy_hits") == 0), F.lit("und"))
        .when(F.col("en_hits") >= F.col("cy_hits"), F.lit("en"))
        .otherwise(F.lit("cy"))
        .alias("pred_lang"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Frozen quality features + score in [0,1]:
    - len_score: min(1, n_tokens/100)
    - punct_ratio: punctuation chars / total chars (lower better)
    - stopword_ratio: stopword tokens / tokens (mid-range better)
    - mean_token_len clipped into [2, 12]
    score = 0.4*len_score + 0.3*(1-min(1,4*punct_ratio))
          + 0.3*(1 - abs(stopword_ratio - 0.4))"""
    t = F.col(text_col)
    toks = standard_tokenize_col(F.lower(t))
    d = docs.filter(t.isNotNull() & (t != "")).select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        toks.alias("toks"),
    )
    n_tok = F.size("toks")
    punct = F.length(F.regexp_replace(F.col("_t"), r"[^!-/:-@\[-`{-~]", ""))
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda x: x.isin([w for w in EN_STOPWORDS]))
    )
    d = (
        d.withColumn("n_tokens", n_tok)
        .withColumn("len_score", F.least(F.lit(1.0), n_tok / F.lit(100.0)))
        .withColumn("punct_ratio", punct / F.greatest(F.length("_t"), F.lit(1)))
        .withColumn("stopword_ratio", stop_hits / F.greatest(n_tok, F.lit(1)))
    )
    score = (
        0.4 * F.col("len_score")
        + 0.3 * (1.0 - F.least(F.lit(1.0), 4.0 * F.col("punct_ratio")))
        + 0.3 * (1.0 - F.abs(F.col("stopword_ratio") - 0.4))
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round("len_score", 6).alias("len_score"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token accounting: whitespace tokens, word tokens (frozen standard
    analyzer = the ES token_count field semantics, SURVEY A7), and a BPE-ish
    subword estimate (word pieces of <=4 chars: ceil(len/4) summed)."""
    t = F.col(text_col)
    # (?U): Java \s matches Unicode whitespace, same as the L1/L6 analyzers
    # (Python-side split() twin is Unicode-default)
    ws = F.filter(F.split(t, r"(?U)\s+"), lambda x: x != F.lit(""))
    words = standard_tokenize_col(F.lower(t))
    return docs.filter(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("ws_tokens"),
        F.size(words).alias("word_tokens"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long")
        ).alias("bpe_est_tokens"),
        F.length(t).alias("n_chars"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per doc (Rae et al. 2021 §A1.1's
    'repetitious text' filters, token-level): type-token ratio and the
    most-frequent-bigram fraction. Mass-produced boilerplate scores low
    distinct_ratio / high top_bigram_frac and gets filtered upstream of
    training.

    Scale shape: token stats are row-local column ops; the bigram mode is
    the word-count pattern — explode to (doc, bigram) rows, partial
    map-side combine into counts, per-doc max — two key-local shuffles,
    no driver involvement, no per-row Python.

    Output: doc_id, n_tokens, n_distinct, distinct_ratio (= n_distinct /
    n_tokens), top_bigram_cnt, top_bigram_frac (= top_bigram_cnt /
    (n_tokens - 1); 0 when the doc has < 2 tokens)."""
    t = F.col(text_col)
    toks = standard_tokenize_col(F.lower(t))
    d = docs.filter(t.isNotNull() & (t != "")).select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    )
    n = F.size("toks")
    base = d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.expr("slice(toks, 2, size(toks) - 1)"),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bigram_cnt"))
    )
    out = base.join(top, "doc_id", "left").withColumn(
        "top_bigram_cnt", F.coalesce("top_bigram_cnt", F.lit(0))
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        "top_bigram_cnt",
        F.round(
            F.col("top_bigram_cnt")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )


# Frozen scrub patterns — same semantics under Java regex (Spark) and RE2
# (DuckDB): plain character classes, bounded quantifiers, \b word edges.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PII masking for training-data pipelines: replace
    email addresses then phone-shaped numbers with typed placeholders,
    counting matches per doc. Pure column ops (JVM regex, no UDF); the
    frozen patterns deliberately stay in the Java-regex/RE2 common
    dialect so the DuckDB oracle runs them verbatim. Scrub order (emails
    first, then phones) is part of the frozen contract.

    Output: doc_id, n_emails, n_phones, scrubbed."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.filter(t.isNotNull() & (t != "")).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def doc_fingerprint(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Winnowing-style fingerprint: md5 of every token n-gram shingle, keep
    the lexicographic min — a deterministic 1-value sketch per doc (same
    answer in any engine with md5)."""
    from engine.dedup import ngram_shingles

    sh = ngram_shingles(docs, n, id_col, text_col)
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


# frozen multiplicative-hash constant (Knuth): the sampling bucket must be
# reproducible in ANY engine with 64-bit integer arithmetic, so the rule is
# pure BIGINT math — no engine-specific hash function
SAMPLE_HASH_MULT = 2654435761
SAMPLE_BUCKETS = 10_000


def sample_stratified(
    docs: DataFrame,
    rates: dict,
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling for training-data mixing: keep a
    doc iff bucket(id) < rate(key) * 10000, where bucket(id) =
    (id * 2654435761) % 2^32 % 10000 — a seeded multiplicative-hash
    Bernoulli that is exactly reproducible in any engine with 64-bit
    integers (the SQL oracle runs the same arithmetic verbatim),
    independent of partitioning and row order, and stable across re-runs:
    the dataset-versioning property real mixing pipelines need (re-running
    the pipeline reselects the SAME docs; raising a rate only ADDS docs).
    Requires an integer id column. Keys absent from `rates` fall back to
    default_rate (0 = drop). Pure column ops; the filter participates in
    scan pushdown."""
    bucket = (
        (F.col(id_col).cast("long") * F.lit(SAMPLE_HASH_MULT))
        % F.lit(2**32)
    ) % F.lit(SAMPLE_BUCKETS)
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(rate)
    return docs.filter(bucket < rate * SAMPLE_BUCKETS)


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for training: assign docs to consecutive
    fixed-token-budget bins WITHIN each group (frozen rule: docs ordered
    by id inside the group; bin = floor(exclusive-prefix-token-sum /
    budget), so a doc straddling a boundary belongs to the bin its first
    token falls in — the streaming-packing convention where straddlers
    are split/truncated downstream).

    Scale shape: one shuffle on group_col, a running sum inside each
    group's window — per-group work, no global ordering (a corpus-global
    cumsum would serialize the job; group = the natural packing unit,
    e.g. source shard or language). Returns (doc_id, group, n_tokens,
    bin, offset_in_bin)."""
    from pyspark.sql import Window

    from engine.textnorm import standard_tokenize_col

    t = F.col(text_col)
    d = docs.filter(t.isNotNull() & (t != "")).select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.size(standard_tokenize_col(F.lower(t))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        F.col("grp").alias(group_col),
        "n_tokens",
        F.floor(excl / budget).cast("long").alias("bin"),
        (excl % budget).cast("long").alias("offset_in_bin"),
    )


def unigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style LM perplexity scoring + head/middle/tail bucketing
    (Wenzek et al. 2020 §4.3: keep/weight training data by LM perplexity
    tertiles). The LM here is the corpus's own add-alpha-smoothed unigram
    model — deterministic, SQL-expressible, and the frozen stand-in for
    CCNet's KenLM 5-gram (no LM libraries in this container; the
    bucketing contract is the operator).

    Definitions (frozen): p(t) = (c_t + alpha) / (T + alpha * V) with
    c_t = corpus count, T = total tokens, V = vocab size;
    ppl(doc) = exp(-sum_t tf_t * ln p(t) / n_tokens), rounded to 6 dp;
    bucket cutpoints = exact interpolated 1/3 and 2/3 percentiles of the
    rounded ppl (also rounded), 'head' <= c1 < 'middle' <= c2 < 'tail'.
    Lower ppl = better LM fit (CCNet's head is its highest-quality cut).

    Scale shape: word-count plans end to end — explode once, pre-reduce
    to per-(doc, term) tfs BEFORE the LM join (join input ~ distinct
    terms per doc, not tokens), join on term (the LM side is
    vocabulary-sized; AQE broadcasts it when small), then one groupBy
    doc. The tertile pass is a 2-value exact percentile over one double
    per doc. No per-row Python anywhere."""
    t = F.col(text_col)
    toks = standard_tokenize_col(F.lower(t))
    tok = (
        docs.filter(t.isNotNull() & (t != ""))
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    # the LM feeds both the probability join and the (T, V) totals, and
    # the scored frame feeds both the tertile pass and the output —
    # persist each so the corpus is tokenized and scored exactly once
    # (unpersisted, Spark re-derives the whole subtree per consumer)
    lm = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    ).persist()
    tot = lm.agg(
        F.sum("c").alias("T"), F.count(F.lit(1)).cast("double").alias("V")
    )
    a = F.lit(float(alpha))
    ppl = (
        tf.join(lm, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.exp(
                    -F.sum(
                        F.col("tf")
                        * F.log((F.col("c") + a) / (F.col("T") + a * F.col("V")))
                    )
                    / F.sum("tf")
                ),
                6,
            ).alias("ppl"),
        )
        .persist()
    )
    cuts = ppl.agg(
        F.round(F.expr("percentile(ppl, 1.0D/3)"), 6).alias("c1"),
        F.round(F.expr("percentile(ppl, 2.0D/3)"), 6).alias("c2"),
    )
    return ppl.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
