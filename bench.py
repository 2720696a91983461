"""Benchmark harness — the driver runs this per round and records the JSON.

Measures the engine's headline paths at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- index_build: full inverted-index build (tokenize -> shard -> tf ->
  posting encode -> segment write -> stats/lineage) over a deterministic
  synthetic web corpus sized to the sf (n_docs = SF * 1.2M => 120k docs,
  ~30M tokens at sf0.1) — the corpus the north_rule targets; the sf-dir
  documents table (500 rows/sf0.01) is far too small to measure a build.
- bm25_wand_p50 / bm25_taat_p50: the frozen 20-query set over that index,
  p50 per-query latency for each algorithm.
- relational ops at the sf dir: BM25 top-10 (no index), minhash dedup
  signatures, cosine top-k over embeddings.

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "aux": {...}}

Scaling evidence (north_rule N vs 4N): scripts/run_scaling.sh runs THIS
file twice via spark-submit at local[8] and local[32] and computes the
efficiency; see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from engine.session import get_spark
    from engine import synth
    from engine.index_build import build_index
    from engine.query import IndexReader, bm25_topk, bm25_topk_dataframe

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(int(sf * 1_200_000))))
    out_json = os.environ.get("SPARK_GRAFT_BENCH_OUT", "")

    spark = get_spark("bench", master=f"local[{cpus}]")
    queries: dict[str, float] = {}
    aux: dict[str, float] = {}
    t_total = time.time()

    work = tempfile.mkdtemp(prefix="sparkft_bench_")
    t0 = time.time()
    corpus = synth.cached_pages(n_docs)
    aux["synth_sec"] = round(time.time() - t0, 3)

    # ---- index build throughput --------------------------------------------
    idx = os.path.join(work, "idx")
    n_shards = max(8, int(cpus))
    # Untimed warm-up build (same pipeline, small corpus): python workers
    # spin up, codegen JITs, and glibc heap pages get touched once — the
    # costs a long-lived executor pays at startup, not per job. Cold first
    # builds on this VM run 2-5x slower than steady state (BENCH.md
    # section 3); the timed number should measure the engine, not the
    # fork. Warm-up cost is fixed-dominated (1k-30k warm-ups measured
    # within 24-80 s of each other), so a small corpus captures most of
    # the benefit without inflating bench wall time.
    warm_docs = int(
        os.environ.get(
            "SPARK_GRAFT_BENCH_WARMUP",
            str(min(n_docs, 10_000, max(2_000, n_docs // 8))),
        )
    )
    if warm_docs:
        warm_corpus = synth.cached_pages(warm_docs)
        t0 = time.time()
        build_index(
            spark, warm_corpus, os.path.join(work, "warm_idx"),
            n_shards=n_shards, n_buckets=32, bucket_chunk=32,
        )
        aux["warmup_build_sec"] = round(time.time() - t0, 3)
        aux["warmup_docs"] = warm_docs
    t0 = time.time()
    # lang rides the docmap as a docvalue (negligible build cost) so the
    # aggregation path is measurable on the same index
    manifest = build_index(
        spark, corpus, idx, n_shards=n_shards, n_buckets=32, bucket_chunk=32,
        docvalue_cols=["lang"],
    )
    dt = time.time() - t0
    queries["index_build"] = round(dt, 3)
    aux["index_docs"] = manifest["n_docs"]
    aux["index_docs_per_sec"] = round(manifest["n_docs"] / dt, 1)
    freqs_build_sec = dt

    # ---- positional build (positions cost) + match_phrase latency ----------
    # same corpus/params with index_options="positions": the delta vs the
    # freqs build is the storage/encode price of the position stream — the
    # number a 100 TB deployment needs before opting a field into phrases.
    from engine.query import match_phrase_topk

    idx_pos = os.path.join(work, "idx_pos")
    t0 = time.time()
    build_index(
        spark, corpus, idx_pos, n_shards=n_shards, n_buckets=32,
        bucket_chunk=32, index_options="positions",
    )
    dtp = time.time() - t0
    queries["index_build_pos"] = round(dtp, 3)
    aux["pos_build_overhead_pct"] = round(100.0 * (dtp - dt) / dt, 1)
    preader = IndexReader(spark, idx_pos)
    # deterministic phrases: adjacent token runs from the frozen corpus
    sample = spark.read.parquet(corpus).select("text").limit(8).collect()
    phrases: list[str] = []
    for r in sample:
        toks = r["text"].split()
        if len(toks) >= 12:
            phrases.append(" ".join(toks[5:7]))     # bigram
            phrases.append(" ".join(toks[8:11]))    # trigram
    phrases = phrases[:10]
    match_phrase_topk(preader, phrases[0], k=10).collect()  # warm
    lat = []
    for ph in phrases:
        t0 = time.time()
        match_phrase_topk(preader, ph, k=10).collect()
        lat.append(time.time() - t0)
    lat.sort()
    queries["phrase_p50"] = round(lat[len(lat) // 2], 3)
    aux["phrase_p95"] = round(lat[int(len(lat) * 0.95)], 3)

    # simple_query_string latency: phrase + term + prefix + negation per
    # query (the search-box shape — exercises the clause-combine kernel
    # over the same positional index)
    from engine.querystring import simple_query_string_topk

    sqs_queries = []
    for i, ph in enumerate(phrases[:6]):
        toks = ph.split()
        neg = phrases[(i + 3) % len(phrases)].split()[0]  # not in the phrase
        sqs_queries.append(f'"{ph}" {toks[0][:2]}* -{neg}')
    simple_query_string_topk(preader, sqs_queries[0], k=10).collect()  # warm
    lat = []
    for sq in sqs_queries:
        t0 = time.time()
        simple_query_string_topk(preader, sq, k=10).collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["sqs_p50"] = round(lat[len(lat) // 2], 3)

    # ---- multi-field index + blended query latency (round-5 surface) -------
    # a bounded two-field (text + derived title) positional build, then
    # multi_match best_fields (dis_max blend over per-field postings) and
    # multi-field phrase latency — the title+body shape every migrating
    # ES user's first query takes
    from pyspark.sql import functions as F_

    from engine.query import bm25_multifield_phrase_topk, bm25_multifield_topk

    # bounded probe corpus: a latency p50 needs a realistic dictionary,
    # not the full bench corpus — 15k keeps the ADDED wall ~12 s so the
    # headline total stays comparable with pre-round-5 records
    mf_docs = min(int(aux["index_docs"]), 15_000)
    mf_src = (
        spark.read.parquet(corpus)
        .limit(mf_docs)
        .withColumn(
            "title",
            F_.concat_ws(" ", F_.col("lang"), F_.substring("text", 1, 60)),
        )
        .select("url", "text", "title")
    )
    idx_mf = os.path.join(work, "idx_mf")
    t0 = time.time()
    build_index(
        spark, mf_src, idx_mf, n_shards=n_shards, n_buckets=32,
        bucket_chunk=32, text_fields=["text", "title"],
        index_options="positions",
    )
    aux["mf_build_sec"] = round(time.time() - t0, 3)
    aux["mf_docs"] = mf_docs
    mreader = IndexReader(spark, idx_mf)
    mf_fields = ["title^2", "text"]
    mf_terms = [ph.split() for ph in phrases[:8]]
    bm25_multifield_topk(mreader, mf_terms[0], mf_fields, k=10).collect()  # warm
    lat = []
    for ts in mf_terms:
        t0 = time.time()
        bm25_multifield_topk(
            mreader, ts, mf_fields, k=10, tie_breaker=0.3
        ).collect()
        lat.append(time.time() - t0)
    lat.sort()
    queries["mm_best_fields_p50"] = round(lat[len(lat) // 2], 3)
    lat = []
    for ph in phrases[:6]:
        t0 = time.time()
        bm25_multifield_phrase_topk(mreader, ph, mf_fields, k=10).collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["mm_phrase_p50"] = round(lat[len(lat) // 2], 3)
    dt = freqs_build_sec  # restore for downstream readers of the build time

    # ---- BM25 top-10 latency over the built index --------------------------
    reader = IndexReader(spark, idx)
    frozen = synth.frozen_queries()
    # warm-up (untimed): python-worker spin-up + dictionary/docmap cache fill
    # — a query server pays this once at startup, not per query
    bm25_topk(reader, frozen[0]["terms"], k=10, algo="wand").collect()
    bm25_topk(reader, frozen[0]["terms"], k=10, algo="taat").collect()
    # default (auto) execution serves small queries driver-side from the
    # same index bytes (pyarrow read + in-process kernels) — the engine's
    # real single-query latency; the pure scatter-gather path is recorded
    # in aux for the 10^12-doc plan's numbers.
    for algo in ("wand", "taat"):
        lat = []
        for q in frozen:
            mode = synth.MODE_BY_KIND[q["kind"]]
            t0 = time.time()
            bm25_topk(reader, q["terms"], k=q["k"], mode=mode, algo=algo).collect()
            lat.append(time.time() - t0)
        lat.sort()
        queries[f"bm25_{algo}_p50"] = round(lat[len(lat) // 2], 3)
        aux[f"bm25_{algo}_p95"] = round(lat[int(len(lat) * 0.95)], 3)
    lat = []
    for q in frozen:
        mode = synth.MODE_BY_KIND[q["kind"]]
        t0 = time.time()
        bm25_topk(reader, q["terms"], k=q["k"], mode=mode, execution="spark").collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["bm25_spark_p50"] = round(lat[len(lat) // 2], 3)

    # serving-path API: same kernels/winners, plain tuples back — no
    # result-DataFrame JVM round-trip (the query-server latency number)
    from engine.query import bm25_topk_rows

    lat = []
    for q in frozen:
        mode = synth.MODE_BY_KIND[q["kind"]]
        t0 = time.time()
        bm25_topk_rows(reader, q["terms"], k=q["k"], mode=mode)
        lat.append(time.time() - t0)
    lat.sort()
    aux["bm25_rows_p50"] = round(lat[len(lat) // 2], 3)
    aux["bm25_rows_p95"] = round(lat[int(len(lat) * 0.95)], 3)

    # multi-field dis_max (one postings pass, three field variants blended)
    from engine.query import bm25_dismax_topk

    or_queries = [q for q in frozen if q["kind"] in ("single", "or")]
    bm25_dismax_topk(reader, or_queries[0]["terms"], k=10).collect()  # warm
    lat = []
    for q in or_queries:
        t0 = time.time()
        bm25_dismax_topk(reader, q["terms"], k=q["k"]).collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["bm25_dismax_p50"] = round(lat[len(lat) // 2], 3)

    # terms aggregation over the matched set (docvalue gather + partials)
    from engine.aggs import TermsAgg, search_aggs

    search_aggs(reader, or_queries[0]["terms"], TermsAgg("lang")).collect()  # warm
    lat = []
    for q in or_queries:
        t0 = time.time()
        search_aggs(reader, q["terms"], TermsAgg("lang")).collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["agg_terms_p50"] = round(lat[len(lat) // 2], 3)

    # term suggester (dictionary corrections, driver-cache serving path)
    from engine.query import suggest_terms

    suggest_terms(reader, "lne", max_edits=2, size=5).collect()  # warm
    lat = []
    for probe in ("lne", "tabl", "windw", "qery", "stremm"):
        t0 = time.time()
        suggest_terms(reader, probe, max_edits=2, size=5).collect()
        lat.append(time.time() - t0)
    lat.sort()
    aux["suggest_p50"] = round(lat[len(lat) // 2], 3)

    # ---- batch-query throughput (one distributed pass, 6000 queries) -------
    from engine.query import bm25_topk_batch

    or_q = [q["terms"] for q in frozen if q["kind"] in ("single", "or")]
    batch = {i: or_q[i % len(or_q)] for i in range(6000)}
    bm25_topk_batch(reader, {0: or_q[0]}, k=10).collect()  # warm
    t0 = time.time()
    bm25_topk_batch(reader, batch, k=10).collect()
    dt = time.time() - t0
    queries["bm25_batch_6000"] = round(dt, 3)
    aux["batch_qps"] = round(len(batch) / dt, 1)

    # ---- relational paths on the driver's sf tables ------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.time()
    bm25_topk_dataframe(docs.select("doc_id", "text"), ["hash", "join", "table"], k=10).collect()
    queries["bm25_relational"] = round(time.time() - t0, 3)

    from engine.dedup import minhash_lsh_pairs, minhash_signatures

    t0 = time.time()
    minhash_signatures(docs, k=32).count()
    queries["dedup_minhash"] = round(time.time() - t0, 3)

    # the candidates-only LSH verify path (the 100 TB dedup plan)
    t0 = time.time()
    minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2, max_shingle_df=1000).count()
    queries["dedup_lsh"] = round(time.time() - t0, 3)

    from pyspark.sql import functions as F
    from engine.simsearch import cosine_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    probes = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "probe_id")
    t0 = time.time()
    cosine_topk(emb, probes, k=5).collect()
    queries["sim_cosine_topk"] = round(time.time() - t0, 3)

    shutil.rmtree(work, ignore_errors=True)
    result = {
        "metric": "index_build_plus_query_total",
        "value": round(time.time() - t_total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "aux": aux,
        "cpus": int(cpus),
        "bench_docs": n_docs,
    }
    line = json.dumps(result)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
