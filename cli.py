"""spark-submit entry point for the spark-fulltext engine.

The north-rule deployment shape: `spark-submit --py-files dist/engine.zip
cli.py <command> ...` — the driver script imports the engine from the
shipped zip, so the same invocation works on a multi-executor cluster
(--master yarn/k8s) as on local[N].

Commands:
  build-index  --input <pages.parquet> --output <dir> [--shards N]
               [--buckets N] [--chunk N] [--resume] [--job-id ID]
               [--progress]
  query        --index <dir> --terms "w1 w2" [--mode or|and|prefix|fuzzy|dismax|bool]
               [--k 10] [--algo wand|wand_daat|taat] [--tie-breaker 0.3]
               [--must "w"] [--should "w1 w2"] [--must-not "w"] [--msm N]
  export-json  --input <documents.parquet> --output <dir>  (T7 bulk NDJSON)
  ingest-segment --input <pages.parquet> --dir <streamdir> [--shards N]
               [--buckets N]   (append one incremental segment)
  merge-segments --dir <streamdir> [--shards N] [--buckets N]
               (Lucene-merge analog: segments -> standard queryable index)
  analyze      --text "..." [--analyzer standard|elastic|...]  (ES _analyze)
  stats        --index <dir>   (index summary: ES _cat/indices)
  count        --index <dir> [--terms "w1 w2"] [--mode or|and]  (ES _count)
  agg          --index <dir> --type terms|stats|histogram|cardinality|
               percentiles|missing --field <docvalue> [--terms ...]
  suggest      --index <dir> --term <w> [--max-edits 2] [--size 5]
  explain      --index <dir> --terms "w1 w2" --url <doc>  (per-term BM25)
  mlt          --index <dir> --like "text" [--max-terms 5] [--k 10]
  search       --index <dir> --body '<ES _search JSON>'  (DSL front-end)
  upsert       --index <dir> --input <batch.parquet> --output <dir>
               (replace-by-url into a NEW index, score-identical to a
               fresh build over the updated corpus)
  swap-index   --input <pages.parquet> --live <dir>  (build aside +
               atomic rename publish; stale readers error cleanly)
  bench-build  --docs N --output <json>   (synth corpus; for scaling runs)

Reference parity: replaces run-elastic-search.sh:84-133 (index lifecycle
driver: delete index -> create from DDL -> exec loader).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser(prog="spark-fulltext")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--shards", type=int, default=32)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--chunk", type=int, default=0, help="bucket chunk size; 0 = fused single pass")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--job-id", default="build-1")
    b.add_argument("--progress", action="store_true",
                   help="1s live ticker (stages/tasks/rate) on stderr")
    b.add_argument("--docvalues", default="",
                   help="comma-separated source columns stored per doc in "
                        "the docmap (aggregations / sorted paging / filters)")

    e = sub.add_parser("export-json", help="T7: ES bulk-NDJSON export")
    e.add_argument("--input", required=True, help="documents parquet")
    e.add_argument("--output", required=True, help="output dir (NDJSON text parts)")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", default="",
                   help="query terms (or/and/prefix/dismax modes)")
    q.add_argument("--mode", default="or", choices=[
        "or", "and", "prefix", "fuzzy", "wildcard", "regexp", "dismax", "bool"])
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--algo", default="wand", choices=["wand", "wand_daat", "taat"])
    q.add_argument("--tie-breaker", type=float, default=0.3,
                   help="dis_max tie breaker (mode=dismax)")
    q.add_argument("--must", default="", help="required terms (mode=bool)")
    q.add_argument("--should", default="", help="optional scored terms (mode=bool)")
    q.add_argument("--must-not", default="", help="excluded terms (mode=bool)")
    q.add_argument("--snapshot", type=int, default=None,
                   help="pin the live-docs view to a delete snapshot id "
                        "(0 = base build; see `snapshots`)")
    q.add_argument("--msm", type=int, default=None,
                   help="minimum_should_match (mode=bool; ES default)")

    ig = sub.add_parser("ingest-segment")
    ig.add_argument("--input", required=True, help="pages parquet batch")
    ig.add_argument("--dir", required=True, help="incremental index dir")
    ig.add_argument("--shards", type=int, default=8)
    ig.add_argument("--buckets", type=int, default=16)

    mg = sub.add_parser("merge-segments")
    mg.add_argument("--dir", required=True, help="incremental index dir")
    mg.add_argument("--shards", type=int, default=8)
    mg.add_argument("--buckets", type=int, default=16)

    dl = sub.add_parser("delete-docs", help="tombstone documents by url")
    dl.add_argument("--index", required=True)
    dl.add_argument("--urls", default="", help="comma-separated urls")
    dl.add_argument("--urls-parquet", default="",
                    help="parquet with a url column (bulk deletes)")

    cp = sub.add_parser("compact", help="rewrite the index without tombstoned docs")
    cp.add_argument("--index", required=True)
    cp.add_argument("--output", required=True)

    se = sub.add_parser("search", help="ES _search JSON body against an index")
    se.add_argument("--index", required=True)
    se.add_argument("--body", required=True, help="ES _search JSON body")

    rv = sub.add_parser("rank-eval",
                        help="ES _rank_eval: grade ranked results "
                             "(precision/recall@k, MRR, (n)DCG, ERR)")
    rv.add_argument("--index", required=True)
    rv.add_argument("--body", required=True, help="ES _rank_eval JSON body")

    up = sub.add_parser("upsert", help="replace-by-url: merge a batch into a new index")
    up.add_argument("--index", required=True)
    up.add_argument("--input", required=True, help="parquet with url/text (+docvalue cols)")
    up.add_argument("--output", required=True)

    sw = sub.add_parser("swap-index",
                        help="zero-downtime replace: build aside, atomic rename publish")
    sw.add_argument("--input", required=True)
    sw.add_argument("--live", required=True, help="live index dir (the alias)")
    sw.add_argument("--shards", type=int, default=32)
    sw.add_argument("--buckets", type=int, default=32)
    sw.add_argument("--docvalues", default="")

    al = sub.add_parser("alias", help="ES _aliases: named atomic pointers "
                                      "to index dirs (optional filters)")
    al.add_argument("action", choices=["add", "remove", "list", "resolve"])
    al.add_argument("--registry", required=True, help="aliases.json path")
    al.add_argument("--alias", default="")
    al.add_argument("--index", default="")
    al.add_argument("--filters", default="",
                    help="JSON list of filter-context clauses")

    an = sub.add_parser("analyze", help="ES _analyze: tokens for a text")
    an.add_argument("--text", required=True)
    an.add_argument("--analyzer", default="standard", choices=[
        "standard", "simple", "elastic", "whitespace", "unique_tf",
        "limit_first", "startswith", "no_ws_punc", "keyword_sort",
        "edge_ngram", "alphakey", "stop"])

    st = sub.add_parser("stats", help="index-level summary (ES _cat/indices)")
    st.add_argument("--index", required=True)

    sn = sub.add_parser("snapshots", help="list delete snapshots (time-travel ids)")
    sn.add_argument("--index", required=True)

    cn = sub.add_parser("count", help="ES _count: matching-doc count")
    cn.add_argument("--index", required=True)
    cn.add_argument("--terms", default="", help="empty = match_all")
    cn.add_argument("--mode", default="or", choices=["or", "and"])
    cn.add_argument("--snapshot", type=int, default=None)

    ag = sub.add_parser("agg", help="aggregation over the matched set")
    ag.add_argument("--index", required=True)
    ag.add_argument("--terms", default="", help="empty = match_all")
    ag.add_argument("--type", required=True, dest="agg_type", choices=[
        "terms", "stats", "histogram", "cardinality", "percentiles", "missing"])
    ag.add_argument("--field", required=True, help="docvalue column")
    ag.add_argument("--size", type=int, default=10)
    ag.add_argument("--interval", type=float, default=100.0)
    ag.add_argument("--stats-of", default="", help="terms sub-agg metric field")

    sg = sub.add_parser("suggest", help="term suggester (did-you-mean)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("--size", type=int, default=5)

    ex = sub.add_parser("explain", help="per-term BM25 breakdown for one doc")
    ex.add_argument("--index", required=True)
    ex.add_argument("--terms", required=True)
    ex.add_argument("--url", required=True)

    ml = sub.add_parser("mlt", help="more_like_this from a like text")
    ml.add_argument("--index", required=True)
    ml.add_argument("--like", default="", help="like text (or --like-file)")
    ml.add_argument("--like-file", default="")
    ml.add_argument("--max-terms", type=int, default=5)
    ml.add_argument("--k", type=int, default=10)

    s = sub.add_parser("bench-build")
    s.add_argument("--docs", type=int, default=60000)
    s.add_argument("--output", default="")
    s.add_argument("--shards", type=int, default=32)
    s.add_argument("--buckets", type=int, default=32)
    s.add_argument("--queries", type=int, default=20, help="frozen queries to time after the build")

    args = ap.parse_args()

    if args.cmd == "analyze":  # pure-Python analyzers: no Spark session
        from engine import textnorm as tn

        fns = {
            "standard": lambda t: tn.standard_tokenize_py(t.lower()),
            "simple": tn.simple_tokenize_py,
            "elastic": tn.analyzer_elastic_py,
            "whitespace": tn.analyzer_whitespace_token_py,
            "unique_tf": tn.analyzer_unique_tf_py,
            "limit_first": tn.analyzer_limit_first_py,
            "startswith": tn.analyzer_startswith_py,
            "no_ws_punc": tn.startswith_no_ws_punc_py,
            "keyword_sort": tn.analyzer_keyword_token_sort_py,
            "edge_ngram": tn.analyzer_edge_ngram_py,
            "alphakey": tn.alphakey_py,
            "stop": tn.analyzer_stop_py,
        }
        out = fns[args.analyzer](args.text)
        out = list(out) if isinstance(out, tuple) else (out if isinstance(out, list) else [out])
        print(json.dumps({"analyzer": args.analyzer, "tokens": out}))
        return

    if args.cmd == "alias":
        # registry-file operation, no Spark session needed
        from engine import aliases as A

        if args.action == "add":
            import json as _json

            filters = _json.loads(args.filters) if args.filters else None
            A.alias_put(args.registry, args.alias, args.index, filters)
            print(json.dumps({"added": args.alias, "index": args.index}))
        elif args.action == "remove":
            A.alias_delete(args.registry, args.alias)
            print(json.dumps({"removed": args.alias}))
        elif args.action == "resolve":
            index_dir, _f = A.alias_resolve(args.registry, args.alias)
            print(json.dumps({"alias": args.alias, "index": index_dir}))
        else:
            print(json.dumps(A.alias_list(args.registry)))
        return

    from engine.session import get_spark

    spark = get_spark(f"spark-fulltext-{args.cmd}")

    if args.cmd == "build-index":
        from contextlib import nullcontext

        from engine.index_build import build_index
        from engine.progress import ticker

        chunk = args.chunk if args.chunk > 0 else args.buckets
        t0 = time.time()
        with ticker(spark) if args.progress else nullcontext():
            manifest = build_index(
                spark, args.input, args.output, n_shards=args.shards,
                n_buckets=args.buckets, bucket_chunk=chunk,
                job_id=args.job_id, resume=args.resume,
                docvalue_cols=[c for c in args.docvalues.split(",") if c] or None,
            )
        print(json.dumps({"built": manifest, "sec": round(time.time() - t0, 2)}))

    elif args.cmd == "export-json":
        from pyspark.sql import functions as F

        from engine.transform import (
            companies_from_documents,
            export_es_bulk,
            transform_companies,
        )

        docs = spark.read.parquet(args.input)
        bulk = export_es_bulk(transform_companies(companies_from_documents(docs)))
        # alternate action/doc lines, pairs stay adjacent (ES bulk format)
        (
            bulk.select(F.explode(F.array("action_json", "doc_json")).alias("value"))
            .write.mode("overwrite")
            .text(args.output)
        )
        print(json.dumps({"exported": args.output}))

    elif args.cmd == "query":
        from engine.query import IndexReader, bm25_topk_rows

        reader = IndexReader(spark, args.index, snapshot_id=args.snapshot)
        t0 = time.time()
        # serving-path API: no result-DataFrame round-trip (rank-identical
        # to bm25_topk; falls back to the Spark plan for remote dirs)
        if args.mode == "dismax":
            from engine.query import bm25_dismax_topk

            rows = [
                (r["url"], r["doc_id"], r["score"])
                for r in bm25_dismax_topk(
                    reader, args.terms, k=args.k, tie_breaker=args.tie_breaker
                ).collect()
            ]
        elif args.mode == "bool":
            from engine.query import bm25_bool_topk

            rows = [
                (r["url"], r["doc_id"], r["score"])
                for r in bm25_bool_topk(
                    reader, must=args.must, should=args.should,
                    must_not=args.must_not, k=args.k,
                    minimum_should_match=args.msm,
                ).collect()
            ]
        else:
            rows = bm25_topk_rows(reader, args.terms, k=args.k, mode=args.mode, algo=args.algo)
        print(json.dumps({
            "hits": [{"url": u, "doc_id": d, "score": s} for u, d, s in rows],
            "sec": round(time.time() - t0, 3),
        }))

    elif args.cmd == "ingest-segment":
        from engine.streaming import _read_state, ingest_batch

        os.makedirs(args.dir, exist_ok=True)
        state = _read_state(args.dir, args.shards)
        next_seg = 1 + max((s["seg_id"] for s in state["segments"]), default=-1)
        batch = spark.read.parquet(args.input)
        state = ingest_batch(
            spark, batch, args.dir, seg_id=next_seg,
            n_shards=args.shards, n_buckets=args.buckets,
        )
        print(json.dumps({
            "seg_id": next_seg,
            "n_docs": state["n_docs"],
            "segments": len(state["segments"]),
        }))

    elif args.cmd == "merge-segments":
        from engine.streaming import merge_segments

        manifest = merge_segments(
            spark, args.dir, n_shards=args.shards, n_buckets=args.buckets
        )
        print(json.dumps({
            "merged": args.dir,
            "n_docs": manifest["n_docs"],
            "job_id": manifest.get("job_id", ""),
        }))

    elif args.cmd == "delete-docs":
        from engine.deletes import delete_docs

        if args.urls_parquet:
            urls = spark.read.parquet(args.urls_parquet)
        else:
            urls = [u for u in args.urls.split(",") if u]
        n = delete_docs(spark, args.index, urls)
        print(json.dumps({"tombstoned": n, "index": args.index}))

    elif args.cmd == "stats":
        from engine.query import IndexReader, index_stats

        print(json.dumps(index_stats(IndexReader(spark, args.index))))

    elif args.cmd == "snapshots":
        from engine.deletes import list_snapshots

        print(json.dumps({"index": args.index, "snapshots": list_snapshots(args.index)}))

    elif args.cmd == "compact":
        from engine.deletes import compact_index

        t0 = time.time()
        manifest = compact_index(spark, args.index, args.output)
        print(json.dumps({
            "compacted": args.output,
            "n_docs": manifest["n_docs"],
            "sec": round(time.time() - t0, 2),
        }))

    elif args.cmd == "search":
        from engine.dsl import search as dsl_search
        from engine.query import IndexReader

        resp = dsl_search(IndexReader(spark, args.index), json.loads(args.body))
        print(json.dumps(resp, default=str))

    elif args.cmd == "rank-eval":
        from engine.dsl import rank_eval
        from engine.query import IndexReader

        resp = rank_eval(IndexReader(spark, args.index), json.loads(args.body))
        print(json.dumps(resp, default=str))

    elif args.cmd == "upsert":
        from engine.upsert import upsert_docs

        t0 = time.time()
        manifest = upsert_docs(
            spark, args.index, spark.read.parquet(args.input), args.output
        )
        print(json.dumps({
            "upserted": args.output,
            "n_docs": manifest["n_docs"],
            "sec": round(time.time() - t0, 2),
        }))

    elif args.cmd == "swap-index":
        from engine.index_build import swap_index

        t0 = time.time()
        manifest = swap_index(
            spark, args.input, args.live, n_shards=args.shards,
            n_buckets=args.buckets,
            docvalue_cols=[c for c in args.docvalues.split(",") if c] or None,
        )
        print(json.dumps({
            "live": args.live,
            "n_docs": manifest["n_docs"],
            "sec": round(time.time() - t0, 2),
        }))

    elif args.cmd == "count":
        from engine.aggs import search_count
        from engine.query import IndexReader

        reader = IndexReader(spark, args.index, snapshot_id=args.snapshot)
        n = search_count(reader, args.terms or None, mode=args.mode).collect()[0]
        print(json.dumps({"count": int(n["doc_count"])}))

    elif args.cmd == "agg":
        from engine.aggs import (
            CardinalityAgg,
            HistogramAgg,
            MissingAgg,
            PercentilesAgg,
            StatsAgg,
            TermsAgg,
            search_aggs,
        )
        from engine.query import IndexReader

        spec = {
            "terms": lambda: TermsAgg(
                args.field, size=args.size, stats_of=args.stats_of or None
            ),
            "stats": lambda: StatsAgg(args.field),
            "histogram": lambda: HistogramAgg(args.field, args.interval),
            "cardinality": lambda: CardinalityAgg(args.field),
            "percentiles": lambda: PercentilesAgg(args.field),
            "missing": lambda: MissingAgg(args.field),
        }[args.agg_type]()
        reader = IndexReader(spark, args.index)
        rows = search_aggs(reader, args.terms or None, spec).collect()
        print(json.dumps({"buckets": [r.asDict() for r in rows]}, default=str))

    elif args.cmd == "suggest":
        from engine.query import IndexReader, suggest_terms

        reader = IndexReader(spark, args.index)
        rows = suggest_terms(
            reader, args.term, max_edits=args.max_edits, size=args.size
        ).collect()
        print(json.dumps({"suggestions": [r.asDict() for r in rows]}))

    elif args.cmd == "explain":
        from engine.query import IndexReader, explain_score

        reader = IndexReader(spark, args.index)
        rows = explain_score(reader, args.terms, args.url).collect()
        print(json.dumps({"url": args.url, "terms": [r.asDict() for r in rows]}))

    elif args.cmd == "mlt":
        from engine.query import IndexReader, mlt_topk

        like = args.like
        if args.like_file:
            with open(args.like_file) as f:
                like = f.read()
        if not like:
            raise SystemExit("mlt: provide --like or --like-file")
        reader = IndexReader(spark, args.index)
        rows = mlt_topk(reader, like, max_query_terms=args.max_terms, k=args.k).collect()
        print(json.dumps({"hits": [r.asDict() for r in rows]}))

    elif args.cmd == "bench-build":
        from engine import synth
        from engine.index_build import build_index
        from engine.query import IndexReader, bm25_topk

        work = tempfile.mkdtemp(prefix="sparkft_scale_")
        corpus = synth.cached_pages(args.docs)
        idx = os.path.join(work, "idx")
        # untimed warm-up: the SAME build once, discarded. This sandbox's
        # anonymous-page first touch runs at ~10 MB/s, so a cold JVM+worker
        # fleet pays a one-time O(footprint) toll that has nothing to do
        # with throughput; a real cluster's executors are long-lived. The
        # timed run below measures steady-state docs/sec.
        build_index(spark, corpus, os.path.join(work, "warm_idx"),
                    n_shards=args.shards, n_buckets=args.buckets,
                    bucket_chunk=args.buckets)
        t0 = time.time()
        manifest = build_index(
            spark, corpus, idx, n_shards=args.shards, n_buckets=args.buckets,
            bucket_chunk=args.buckets,
        )
        build_sec = time.time() - t0
        reader = IndexReader(spark, idx)
        frozen = synth.frozen_queries()[: args.queries]
        bm25_topk(reader, frozen[0]["terms"], k=10).collect()  # warm-up
        lat = []
        for fq in frozen:
            mode = {"single": "or", "and": "and", "or": "or",
                    "prefix": "prefix", "absent": "or"}[fq["kind"]]
            t0 = time.time()
            bm25_topk(reader, fq["terms"], k=fq["k"], mode=mode).collect()
            lat.append(time.time() - t0)
        lat.sort()
        # batch-query throughput: the frozen OR-queries replicated to a
        # 400-query batch, ONE distributed pass (compute-bound: every query
        # scored against every shard's decoded postings)
        from engine.query import bm25_topk_batch

        or_q = [fq["terms"] for fq in frozen if fq["kind"] in ("single", "or")]
        batch = {i: or_q[i % len(or_q)] for i in range(6000)}
        bm25_topk_batch(reader, {0: or_q[0]}, k=10).collect()  # warm
        t0 = time.time()
        bm25_topk_batch(reader, batch, k=10).collect()
        batch_sec = time.time() - t0
        out = {
            "cores": spark.sparkContext.defaultParallelism,
            "docs": manifest["n_docs"],
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(manifest["n_docs"] / build_sec, 1),
            "query_p50_sec": round(lat[len(lat) // 2], 3),
            "query_p95_sec": round(lat[int(len(lat) * 0.95)], 3),
            "batch_queries": len(batch),
            "batch_sec": round(batch_sec, 2),
            "batch_qps": round(len(batch) / batch_sec, 1),
        }
        line = json.dumps(out)
        print(line)
        if args.output:
            with open(args.output, "w") as f:
                f.write(line + "\n")
        import shutil

        shutil.rmtree(work, ignore_errors=True)  # scaling legs leak ~GBs otherwise

    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
