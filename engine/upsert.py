"""Document upsert: replace-by-url over an immutable index.

ES `_bulk` index/update parity (the reference loader's implicit semantics:
re-running the Go loader over changed MongoDB rows re-indexes them under
the same _id, main.go:105-313): given an existing index and a batch of
(url, text, ...) replacements/additions, produce a NEW single index that
is SCORE-identical to a fresh batch build over the updated corpus —

  1. old versions of urls present in the batch are dropped (the src
     index's existing tombstones are honored too);
  2. surviving main docs are renumbered dense per shard (compaction
     renumbering, relative order preserved);
  3. new docs shard by the same url hash and take local ids continuing
     each shard's kept count — Lucene append semantics: updated docs get
     NEW doc ids at the shard tail, so raw doc ids differ from a fresh
     build (scores and url ranking do not; frozen by test);
  4. main postings are rewritten without the dropped docs and the new
     docs' postings encoded, both against the POST-upsert avgdl, then
     merged per (shard, term) — one shuffle over the delta + one
     independent rewrite pass over the main postings (never a corpus
     re-tokenize of the main index).

Scale shape: the main-postings rewrite is embarrassingly parallel (row =
one (bucket, shard, term), no shuffle); the delta pays the same one-wide-
shuffle build as any micro-batch; the merge union re-sorts only the
posting ROWS (not postings) per (bucket, shard) cell. At 10^12 docs with
a small update batch the cost is dominated by rewriting the touched
posting rows — the same bound Lucene segment merging pays.

Positional indexes (index_options="positions") upsert the same way: the
main rewrite, the delta encode, and the merge all carry the token-position
stream, so match_phrase over an upserted index is score-identical to a
fresh positional build (tested).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine import postings as P
from engine.deletes import _make_rewriter, load_tombstones
from engine.index_build import (
    POSTING_SCHEMA,
    POSTING_SCHEMA_POS,
    _local_df,
    _make_encoder,
    split_rejects,
)
from engine.streaming import _make_merger
from engine.textnorm import standard_tokenize_col


def upsert_docs(
    spark: SparkSession,
    src_dir: str,
    new_pages: DataFrame,
    out_dir: str,
) -> dict:
    """Merge src_dir and the replacement batch into a fresh index at
    out_dir (src_dir untouched — swap/alias to publish, like compaction).
    new_pages: (url, text, <docvalue cols of the src manifest>); urls must
    be unique within the batch (the last-write-wins resolution belongs to
    the caller's CDC layer, not the index). Returns the new manifest."""
    with open(os.path.join(src_dir, "MANIFEST.json")) as f:
        manifest = json.load(f)
    with_pos = manifest.get("index_options", "freqs") == "positions"
    schema = POSTING_SCHEMA_POS if with_pos else POSTING_SCHEMA
    fields = list(manifest.get("text_fields") or ["text"])
    multi = len(fields) > 1
    n_shards, n_buckets = manifest["n_shards"], manifest["n_buckets"]
    k1, b = manifest["k1"], manifest["b"]
    dv_cols = list(manifest.get("docvalue_cols") or [])
    stored = list(manifest.get("stored_cols") or [])
    src_names = [f"src__{c}" for c in stored]
    job_id = f"upsert-of-{manifest.get('job_id', 'index')}"
    os.makedirs(out_dir, exist_ok=True)

    def path(name: str) -> str:
        return os.path.join(out_dir, name)

    valid, _rejects = split_rejects(new_pages, fields[0])
    # batch contract: unique urls (cheap to verify driver-side on the
    # already-tiny-by-assumption update batch)
    if multi:
        # per-field token arrays, mirroring build_index's multi-field
        # tokenization (coalesce: a secondary field may be null); the
        # primary field keeps the frozen tokens/dl names
        tok_sel = [
            standard_tokenize_col(
                F.lower(F.coalesce(F.col(f), F.lit("")))
            ).alias(f"tokens__{f}")
            for f in fields
        ]
        batch = valid.select(
            "url", *tok_sel, *dv_cols,
            *[F.col(c).alias(f"src__{c}") for c in stored],
        )
        for f in fields:
            batch = batch.withColumn(f"dl__{f}", F.size(f"tokens__{f}"))
        batch = (
            batch.withColumn("tokens", F.col(f"tokens__{fields[0]}"))
            .withColumn("dl", F.col(f"dl__{fields[0]}"))
            .persist()
        )
    else:
        batch = valid.select(
            "url",
            standard_tokenize_col(F.lower(F.col("text"))).alias("tokens"),
            *dv_cols,
            *[F.col(c).alias(f"src__{c}") for c in stored],
        ).withColumn("dl", F.size("tokens")).persist()
    dlx = [f"dl__{f}" for f in fields] if multi else []
    try:
        n_batch = batch.count()
        if batch.select("url").distinct().count() != n_batch:
            raise ValueError("upsert batch contains duplicate urls")

        # ---- victims: src docs whose url is replaced, + existing deletes
        dm = spark.read.parquet(os.path.join(src_dir, "docmap"))
        victims = dm.join(
            F.broadcast(batch.select("url")), "url"
        ).select("shard", "local_id")
        deleted = {
            int(s): np.sort(np.asarray([l for _s, l in grp], dtype=np.int64))
            for s, grp in _group_pairs(victims.collect())
        }
        for s, arr in load_tombstones(src_dir).items():
            prev = deleted.get(int(s))
            deleted[int(s)] = (
                np.unique(np.concatenate([prev, arr])) if prev is not None else arr
            )

        # ---- kept main docmap: renumber dense per shard -----------------
        if deleted:
            tomb_df = _local_df(
                spark,
                [(s, int(l)) for s, arr in deleted.items() for l in arr],
                "shard int, local_id long",
            )
            kept = dm.join(F.broadcast(tomb_df), ["shard", "local_id"], "left_anti")
        else:
            kept = dm
        w = Window.partitionBy("shard").orderBy("local_id")
        kept = kept.withColumn(
            "new_local", F.row_number().over(w).cast("long") - 1
        )
        kept_rows_agg = (
            kept.groupBy("shard")
            .agg(
                F.count("*").alias("cnt"), F.sum("dl").alias("sdl"),
                *[F.sum(c).alias(c) for c in dlx],
            )
            .collect()
        )
        kept_counts = {r["shard"]: (r["cnt"], r["sdl"]) for r in kept_rows_agg}
        kept_field_sums = {
            c: sum(int(r[c] or 0) for r in kept_rows_agg) for c in dlx
        }

        # ---- delta docs: same shard hash, local ids continue the shard --
        base_df = _local_df(
            spark,
            [(s, kept_counts.get(s, (0, 0))[0]) for s in range(n_shards)],
            "shard int, shard_base long",
        )
        wd = Window.partitionBy("shard").orderBy("url")
        delta = (
            batch.withColumn(
                "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
            )
            .join(F.broadcast(base_df), "shard")
            .withColumn(
                "local_id",
                F.row_number().over(wd).cast("long") - 1 + F.col("shard_base"),
            )
        )

        # ---- global stats + ids (exact fresh-build stats) ---------------
        delta_rows_agg = (
            delta.groupBy("shard")
            .agg(
                F.count("*").alias("cnt"), F.sum("dl").alias("sdl"),
                *[F.sum(c).alias(c) for c in dlx],
            )
            .collect()
        )
        delta_agg = {r["shard"]: (r["cnt"], r["sdl"]) for r in delta_rows_agg}
        delta_field_sums = {
            c: sum(int(r[c] or 0) for r in delta_rows_agg) for c in dlx
        }
        n_docs = sum(c for c, _ in kept_counts.values()) + sum(
            c for c, _ in delta_agg.values()
        )
        sum_dl = int(
            sum(s or 0 for _, s in kept_counts.values())
            + sum(s or 0 for _, s in delta_agg.values())
        )
        avgdl = sum_dl / n_docs if n_docs else 0.0
        field_stats = {}
        if multi:
            # per-field POST-upsert stats (ES scores each field with its
            # own avgdl); field 0's numbers coincide with avgdl/sum_dl
            for f in fields:
                s = kept_field_sums[f"dl__{f}"] + delta_field_sums[f"dl__{f}"]
                field_stats[f] = {
                    "avgdl": s / n_docs if n_docs else 0.0,
                    "sum_dl": int(s),
                }
        offsets, acc = {}, 0
        for s in range(n_shards):
            offsets[s] = acc
            acc += kept_counts.get(s, (0, 0))[0] + delta_agg.get(s, (0, 0))[0]

        # ---- docmap: kept (renumbered) ++ delta (appended) --------------
        off_df = _local_df(
            spark,
            [(s, offsets[s]) for s in range(n_shards)],
            "shard int, shard_offset long",
        )
        kept_rows = kept.select(
            "shard", F.col("new_local").alias("local_id"), "url", "dl",
            *dlx, *dv_cols, *src_names,
        )
        delta_rows = delta.select(
            "shard", "local_id", "url", "dl", *dlx, *dv_cols, *src_names
        )
        (
            kept_rows.unionByName(delta_rows)
            .join(F.broadcast(off_df), "shard")
            .withColumn("doc_id", F.col("shard_offset") + F.col("local_id"))
            .select("shard", "local_id", "doc_id", "url", "dl", *dlx,
                    *dv_cols, *src_names)
            .repartition(n_shards, "shard")
            .sortWithinPartitions("local_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path("docmap"))
        )

        # ---- postings: rewrite main (no shuffle) ++ encode delta, merge
        # (one pass per indexed field; each field rewrites and encodes
        # against its OWN post-upsert avgdl, into postings/field=<f>) ---
        n_parts = max(
            1, min(n_buckets * n_shards, 2 * spark.sparkContext.defaultParallelism)
        )
        sort_keys = ["shard", "term", "local_id"] + (["pos"] if with_pos else [])
        for fld in fields:
            fsub = f"/field={fld}" if multi else ""
            avg_f = field_stats[fld]["avgdl"] if multi else avgdl
            tcol = f"tokens__{fld}" if multi else "tokens"
            dl_col = f"dl__{fld}" if multi else "dl"
            main_post = spark.read.parquet(
                os.path.join(src_dir, "postings" + fsub)
            )
            rewritten = main_post.mapInPandas(
                _make_rewriter(deleted, avg_f, k1, b, positions=with_pos),
                schema,
            )
            tok_col = (
                [F.posexplode(tcol).alias("pos", "term")]
                if with_pos
                else [F.explode(tcol).alias("term")]
            )
            tf = (
                delta.select(
                    "shard", "local_id", F.col(dl_col).alias("dl"), *tok_col
                )
                .withColumn(
                    "bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
                )
            )
            delta_post = (
                tf.repartition(n_parts, "bucket", "shard")
                .sortWithinPartitions(*sort_keys)
                .mapInArrow(
                    _make_encoder(avg_f, k1, b, positions=with_pos), schema
                )
            )
            merger = _make_merger(avg_f, k1, b, positions=with_pos)
            (
                rewritten.unionByName(delta_post)
                .repartition(n_parts, "bucket", "shard")
                .sortWithinPartitions("shard", "term")
                .mapInPandas(merger, schema)
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(path("postings" + fsub))
            )
    finally:
        batch.unpersist()

    # ---- derived tables + manifest (same shapes as the batch build) -----
    for fld in fields:
        fsub = f"/field={fld}" if multi else ""
        merged = spark.read.parquet(path("postings" + fsub))
        (
            merged.groupBy("bucket", "term")
            .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
            .repartition(max(1, n_buckets // 2), "bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path("term_stats" + fsub))
        )
    _local_df(
        spark,
        [(n_docs, float(avgdl), sum_dl, 0)],
        "n_docs long, avgdl double, sum_dl long, n_rejects long",
    ).coalesce(1).write.mode("overwrite").parquet(path("stats"))

    new_manifest = dict(
        manifest,
        n_docs=int(n_docs),
        avgdl=float(avgdl),
        sum_dl=sum_dl,
        shard_offsets=[offsets[s] for s in range(n_shards)],
        job_id=job_id,
    )
    if multi:
        new_manifest["field_stats"] = field_stats
    ckpt = {
        "job_id": job_id,
        "stages": ["docmap", "stats", "postings", "term_stats"],
        "seq": 0,
        "ts": time.time(),
    }
    with open(os.path.join(out_dir, "checkpoint.jsonl"), "w") as f:
        f.write(json.dumps(ckpt) + "\n")
        f.flush()
        os.fsync(f.fileno())
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(new_manifest, f, indent=2, sort_keys=True)
    return new_manifest


def _group_pairs(rows):
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(int(r["shard"]), []).append(
            (int(r["shard"]), int(r["local_id"]))
        )
    return by_shard.items()


def update_by_query(
    spark: SparkSession,
    src_dir: str,
    body: dict,
    transform,
    out_dir: str,
) -> dict:
    """ES `_update_by_query`: re-index every document matching the DSL
    body with `transform` applied — expressed as matched-set selection +
    replace-by-url upsert (build-aside at out_dir; src_dir untouched,
    publish via swap/alias like compaction).

    `transform(df) -> df` receives the matched docs' (url, text,
    <docvalue cols>) reconstructed from the index's STORED source
    (store_source must include 'text' — the honest requirement: an index
    without stored source cannot rewrite its own documents, exactly like
    ES without _source) and must return the same shape. The script-free
    callable replaces ES's painless ctx._source mutation; engine/scripts
    stays scoring-only by design.

    Cost shape: matched urls from the bucket-pruned postings kernels;
    the update batch is assumed small relative to the corpus (ES makes
    the same assumption — _update_by_query on the whole index is a
    rebuild); upsert_docs merges postings without touching unmatched
    buckets' doc rows beyond the one merge pass it already does."""
    from engine.dsl import matched_urls_for_query
    from engine.query import IndexReader

    query = body.get("query", body) if isinstance(body, dict) else body
    if "query" in query:
        query = query["query"]
    reader = IndexReader(spark, src_dir)
    fields = list(reader.manifest.get("text_fields") or ["text"])
    missing_src = [f for f in fields if f not in reader.stored_cols]
    if missing_src:
        raise ValueError(
            "update_by_query needs the index built with store_source "
            f"including every indexed text field (missing {missing_src} "
            "— the document bodies to rewrite)"
        )
    urls = matched_urls_for_query(reader, query)
    dv_cols = list(reader.manifest.get("docvalue_cols") or [])
    src = reader.stored_source_df().select("url", *fields)
    if dv_cols:
        dv = reader.docmap().select("url", *dv_cols)
        src = src.join(dv, "url")
    matched = src.join(F.broadcast(urls.distinct()), "url")
    batch = transform(matched)
    want = ["url", *fields] + dv_cols
    missing = [c for c in want if c not in batch.columns]
    if missing:
        raise ValueError(f"transform dropped required column(s) {missing}")
    return upsert_docs(spark, src_dir, batch.select(*want), out_dir)
