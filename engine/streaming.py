"""Incremental (streaming) index ingest + segment merge.

The reference's 30 s refresh interval (config/search_scheme.json:6, ST2 in
SURVEY.md 2.10) is Elasticsearch's micro-batch segment publication; Lucene
then merges segments in the background. The Spark-native equivalents:

- `stream_ingest`: Structured Streaming over a parquet file source ->
  `foreachBatch`: each micro-batch is tokenized, doc-id-assigned
  (deterministic per-shard counters carried in a driver-side state file,
  the streaming analog of the dense shard-contiguous ids), encoded with the
  SAME posting codec, and appended under segments/seg=<n>/ together with
  its docmap part. Append-only, crash-safe: a segment commits by appearing
  in the state file (write-then-commit, like the batch checkpoint).
- `merge_segments`: the Lucene-merge analog — a batch job that decodes all
  segments' postings per (bucket, shard, term), merges the doc-sorted runs,
  re-encodes with encode_groups, recomputes global stats, and writes a
  standard index layout queryable by engine.query.IndexReader. The merged
  index answers queries rank-identically to a one-shot batch build over the
  union corpus (tested), modulo doc-id assignment (ids are segment-ordered,
  so score ties may order differently; scores per url are identical).

Scale notes: segment encode is the same one-shuffle fused pipeline as the
batch build; the merge shuffles only the (already compressed) posting rows
— bytes proportional to the index, not to the corpus — and re-encodes
vectorized, carrying groups across Arrow batches.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import time

from engine import postings as P
from engine.index_build import (
    POSTING_SCHEMA,
    POSTING_SCHEMA_POS,
    _append_metrics,
    _local_df,
    _make_encoder,
    split_rejects,
)
from engine.textnorm import standard_tokenize_col


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "stream_state.json")


def _read_state(out_dir: str, n_shards: int) -> dict:
    p = _state_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"segments": [], "shard_counts": [0] * n_shards, "n_docs": 0, "sum_dl": 0}


def _write_state(out_dir: str, state: dict) -> None:
    tmp = _state_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(out_dir))


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    seg_id: int,
    n_shards: int = 8,
    n_buckets: int = 16,
    k1: float = P.K1,
    b: float = P.B,
    docvalue_cols: list[str] | None = None,
    index_options: str = "freqs",
) -> dict:
    """Encode one micro-batch as an append-only segment. Returns the updated
    state. Doc ids continue each shard's counter from the state file, so ids
    stay dense and deterministic across the stream.

    docvalue_cols: extra batch columns stored per doc in the segment
    docmap (same contract as build_index) — merge_segments carries them
    into the merged index so aggregations work on streamed corpora.
    index_options: "freqs" or "positions" (same contract as build_index);
    the stream's FIRST segment fixes it, later segments must match, and
    merge_segments produces an index of the same kind (positional streams
    merge their position streams and serve match_phrase)."""
    os.makedirs(out_dir, exist_ok=True)
    state = _read_state(out_dir, n_shards)
    fixed = state.get("index_options") or (
        state["segments"][0].get("index_options", "freqs")
        if state["segments"] else None
    )
    if fixed is not None and fixed != index_options:
        raise ValueError(
            f"stream at {out_dir} is {fixed!r}; segment {seg_id} requested "
            f"{index_options!r} — index_options is fixed by the first segment"
        )
    state["index_options"] = index_options
    if seg_id in [s["seg_id"] for s in state["segments"]]:
        return state  # idempotent re-delivery (foreachBatch replays)
    t_seg = time.monotonic()

    valid, _rejects = split_rejects(batch_df)
    d = valid.withColumn("shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int"))
    off = _local_df(
        spark,
        [(s, state["shard_counts"][s]) for s in range(n_shards)],
        "shard int, shard_base long",
    )
    w = Window.partitionBy("shard").orderBy("url")
    d = (
        d.join(F.broadcast(off), "shard")
        .withColumn("local_id", F.row_number().over(w).cast("long") - 1 + F.col("shard_base"))
        .select(
            "url", "shard", "local_id",
            standard_tokenize_col(F.lower(F.col("text"))).alias("tokens"),
            *(docvalue_cols or []),
        )
        .withColumn("dl", F.size("tokens"))
    )
    seg_dir = os.path.join(out_dir, "segments", f"seg={seg_id}")
    d.select(
        "shard", "local_id", "url", "dl", *(docvalue_cols or [])
    ).repartition(n_shards, "shard").write.mode(
        "overwrite"
    ).parquet(os.path.join(seg_dir, "docmap"))

    dm = spark.read.parquet(os.path.join(seg_dir, "docmap"))
    per_shard = {r["shard"]: r["cnt"] for r in dm.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    seg_sum_dl = dm.agg(F.sum("dl").alias("s")).collect()[0]["s"] or 0
    seg_docs = int(sum(per_shard.values()))

    # running avgdl over everything seen so far: segment impacts are encoded
    # against it; the merge recomputes exact impacts from (tf, dl) anyway
    run_docs = state["n_docs"] + seg_docs
    run_avgdl = (state["sum_dl"] + int(seg_sum_dl)) / run_docs if run_docs else 0.0

    with_pos = index_options == "positions"
    tok_col = (
        [F.posexplode("tokens").alias("pos", "term")]
        if with_pos
        else [F.explode("tokens").alias("term")]
    )
    tf = (
        d.select("shard", "local_id", "dl", *tok_col)
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )
    encoder = _make_encoder(run_avgdl, k1, b, positions=with_pos)
    sort_keys = ["shard", "term", "local_id"] + (["pos"] if with_pos else [])
    n_parts = max(1, min(n_buckets * n_shards, 2 * spark.sparkContext.defaultParallelism))
    (
        tf.repartition(n_parts, "bucket", "shard")
        .sortWithinPartitions(*sort_keys)
        .mapInArrow(encoder, POSTING_SCHEMA_POS if with_pos else POSTING_SCHEMA)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(seg_dir, "postings"))
    )

    for s, c in per_shard.items():
        state["shard_counts"][int(s)] += int(c)
    state["n_docs"] = run_docs
    state["sum_dl"] = state["sum_dl"] + int(seg_sum_dl)
    state["segments"].append({"seg_id": seg_id, "n_docs": seg_docs, "avgdl_at": run_avgdl})
    _write_state(out_dir, state)
    # ST1 telemetry: per-micro-batch progress rows (the streaming analog of
    # the reference's 1 s reads/inserts ticker, main.go:283-313)
    el = max(time.monotonic() - t_seg, 1e-9)
    _append_metrics(
        spark, out_dir, f"seg-{seg_id}",
        [
            ("stage:segment:docs", seg_docs),
            ("stage:segment:tokens", int(seg_sum_dl)),
            ("stage:segment:elapsed_ms", el * 1000),
            ("stage:segment:docs_per_sec", seg_docs / el),
        ],
    )
    return state


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    n_shards: int = 8,
    n_buckets: int = 16,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    trigger_once: bool = True,
    processing_time: str = "30 seconds",
    max_files_per_trigger: int = 1,
    docvalue_cols: list[str] | None = None,
):
    """Structured Streaming driver: file source -> foreachBatch ingest.
    trigger_once drains available input then stops (used in tests); the
    processing_time trigger is the ES refresh-interval analog."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, out_dir, int(batch_id), n_shards, n_buckets,
            docvalue_cols=docvalue_cols,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", os.path.join(out_dir, "_stream_ckpt")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


# ---------------------------------------------------------------------------
# segment merge (the Lucene background-merge analog)
# ---------------------------------------------------------------------------


def _make_merger(avgdl: float, k1: float, b: float, positions: bool = False):
    """mapInPandas: rows = per-segment postings sorted by (shard, term);
    decode each run, merge doc-sorted runs per group, re-encode vectorized.
    Groups straddling Arrow batches are carried like the build encoder.

    positions=True (positional segments/indexes): the token-position
    stream merges too — decoded to absolute positions, the occurrence
    slices are gathered in the merged posting order (doc ids are disjoint
    across segments, so no same-doc position-list union is ever needed),
    and within-posting deltas are re-derived before re-encode."""
    cols = ["bucket", "shard", "term", "docs_bin", "tfs_bin", "dls_bin", "blocks"]
    if positions:
        cols += ["pos_bin", "pos_offs"]

    def _emit(rows: list[tuple]) -> pd.DataFrame:
        starts: list[int] = []
        buckets, shards, terms = [], [], []
        l_parts: list[np.ndarray] = []
        t_parts: list[np.ndarray] = []
        d_parts: list[np.ndarray] = []
        p_parts: list[np.ndarray] = []
        off = 0
        i = 0
        while i < len(rows):
            j = i
            ls, ts, ds, ps = [], [], [], []
            while j < len(rows) and rows[j][1] == rows[i][1] and rows[j][2] == rows[i][2]:
                blocks = [
                    tuple(blk[k] for k in ("first_doc", "last_doc", "n", "doc_off",
                                           "tf_off", "dl_off", "max_impact"))
                    if isinstance(blk, dict) else tuple(blk)
                    for blk in rows[j][6]
                ]
                d_, t_, l_ = P.decode_term_postings(rows[j][3], rows[j][4], rows[j][5], blocks)
                ds.append(d_)
                ts.append(t_)
                ls.append(l_)
                if positions:
                    ps.append(
                        P.decode_term_positions(t_, rows[j][7], list(rows[j][8]), blocks)
                    )
                j += 1
            d_all = np.concatenate(ds)
            t_all = np.concatenate(ts)
            order = np.argsort(d_all, kind="stable")
            l_parts.append(np.concatenate(ls)[order])
            t_parts.append(t_all[order])
            d_parts.append(d_all[order])
            if positions:
                # gather occurrence slices in the merged posting order
                pos_all = np.concatenate(ps).astype(np.int64)
                tf64 = t_all.astype(np.int64)
                occ_off = np.concatenate(([0], np.cumsum(tf64)))[:-1]
                lens = tf64[order]
                srcs = occ_off[order]
                head = np.concatenate(([0], np.cumsum(lens)))[:-1].astype(np.int64)
                n_occ = int(lens.sum())
                idx = np.arange(n_occ) - np.repeat(head, lens) + np.repeat(srcs, lens)
                pos_perm = pos_all[idx]
                pdl = np.empty(n_occ, dtype=np.uint32)
                if n_occ:
                    pdl[1:] = (pos_perm[1:] - pos_perm[:-1]).astype(np.uint32)
                    pdl[head] = pos_perm[head].astype(np.uint32)
                p_parts.append(pdl)
            buckets.append(rows[i][0])
            shards.append(rows[i][1])
            terms.append(rows[i][2])
            starts.append(off)
            off += d_all.size
            i = j
        outs = P.encode_groups(
            np.concatenate(d_parts), np.concatenate(t_parts), np.concatenate(l_parts),
            np.asarray(starts, dtype=np.int64), avgdl, k1, b,
            pos_deltas=(
                np.concatenate(p_parts).astype(np.uint32) if positions else None
            ),
        )
        out_cols = {
            "bucket": np.asarray(buckets, dtype=np.int64),
            "shard": np.asarray(shards, dtype=np.int64),
            "term": np.asarray(terms, dtype=object),
            "df_local": np.array([o["df"] for o in outs], dtype=np.int64),
            "cf_local": np.array([o["cf"] for o in outs], dtype=np.int64),
            "docs_bin": [o["docs_bin"] for o in outs],
            "tfs_bin": [o["tfs_bin"] for o in outs],
            "dls_bin": [o["dls_bin"] for o in outs],
            "blocks": [o["blocks"] for o in outs],
        }
        if positions:
            out_cols["pos_bin"] = [o["pos_bin"] for o in outs]
            out_cols["pos_offs"] = [o["pos_offs"] for o in outs]
        return pd.DataFrame(out_cols)

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: list[tuple] = []
        for pdf in batches:
            rows = carry + list(pdf[cols].itertuples(index=False, name=None))
            if not rows:
                continue
            # hold back the trailing (shard, term) group — it may straddle
            k = len(rows) - 1
            while k > 0 and rows[k - 1][1] == rows[-1][1] and rows[k - 1][2] == rows[-1][2]:
                k -= 1
            carry = rows[k:]
            rows = rows[:k]
            if rows:
                yield _emit(rows)
        if carry:
            yield _emit(carry)

    return merge


def merge_segments(
    spark: SparkSession,
    out_dir: str,
    n_shards: int = 8,
    n_buckets: int = 16,
    k1: float = P.K1,
    b: float = P.B,
) -> dict:
    """Merge all streamed segments into a standard queryable index layout
    under out_dir (manifest + docmap + postings + term_stats + stats)."""
    state = _read_state(out_dir, n_shards)
    seg_root = os.path.join(out_dir, "segments")
    seg_dirs = sorted(
        (d for d in os.listdir(seg_root) if d.startswith("seg=")),
        key=lambda s: int(s.split("=")[1]),
    )
    committed = {s["seg_id"] for s in state["segments"]}
    seg_dirs = [d for d in seg_dirs if int(d.split("=")[1]) in committed]

    from functools import reduce

    def _union_read(sub: str) -> DataFrame:
        # seg=N/<sub>/bucket=K nesting defeats partition discovery across
        # segments — read each segment and union (segment count is small)
        parts = [spark.read.parquet(os.path.join(seg_root, d, sub)) for d in seg_dirs]
        return reduce(lambda a, b: a.unionByName(b), parts)

    dm = _union_read("docmap")
    # global doc_id = shard-contiguous dense ordinal (same scheme as batch)
    counts = {r["shard"]: r["cnt"] for r in dm.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for s in range(n_shards):
        offsets[s] = acc
        acc += counts.get(s, 0)
    off_df = _local_df(spark, [(s, offsets[s]) for s in range(n_shards)], "shard int, shard_offset long")
    (
        dm.join(F.broadcast(off_df), "shard")
        .withColumn("doc_id", F.col("shard_offset") + F.col("local_id"))
        .select(
            "shard", "local_id", "doc_id", "url", "dl",
            # docvalue columns from the segment docmaps survive the merge
            *[c for c in dm.columns if c not in
              {"shard", "local_id", "doc_id", "url", "dl"}],
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("local_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "docmap"))
    )
    n_docs = state["n_docs"]
    avgdl = state["sum_dl"] / n_docs if n_docs else 0.0

    post = _union_read("postings")
    with_pos = state.get("index_options", "freqs") == "positions"
    merger = _make_merger(avgdl, k1, b, positions=with_pos)
    n_parts = max(1, min(n_buckets * n_shards, 2 * spark.sparkContext.defaultParallelism))
    (
        post.repartition(n_parts, "bucket", "shard")
        .sortWithinPartitions("shard", "term")
        .mapInPandas(merger, POSTING_SCHEMA_POS if with_pos else POSTING_SCHEMA)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )
    merged = spark.read.parquet(os.path.join(out_dir, "postings"))
    (
        merged.groupBy("bucket", "term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .repartition(max(1, n_buckets // 2), "bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
    _local_df(
        spark, [(n_docs, float(avgdl), state["sum_dl"], 0)],
        "n_docs long, avgdl double, sum_dl long, n_rejects long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    manifest = {
        "n_shards": n_shards,
        "n_buckets": n_buckets,
        "k1": k1,
        "b": b,
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "sum_dl": int(state["sum_dl"]),
        "analyzer": "standard_lower_v1",
        "codec": "svb_delta_block128_v1",
        "shard_offsets": [offsets[s] for s in range(n_shards)],
        "job_id": f"merge-of-{len(seg_dirs)}-segments",
        "index_options": state.get("index_options", "freqs"),
        "docvalue_cols": [
            c for c in dm.columns
            if c not in {"shard", "local_id", "doc_id", "url", "dl"}
        ],
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def stream_percolate(
    spark: SparkSession,
    source_dir: str,
    queries: DataFrame,
    out_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    id_col: str = "url",
    text_col: str = "text",
    trigger_once: bool = True,
    processing_time: str = "30 seconds",
):
    """Streaming percolator — the alerting shape percolation exists for:
    every arriving doc batch is matched against the stored-query registry
    and the (query_id, doc_id, hits) alert rows append to a parquet sink.

    The batch operator (engine/query.py percolate) runs unchanged inside
    the stream: it is a stateless broadcast join + per-batch aggregate,
    so append mode needs no watermark and restart-safety comes from the
    checkpointed file source + idempotent parquet append (foreachBatch
    replays re-emit the same batch rows; dedupe downstream on
    (query_id, doc_id) if exactly-once alerts are required — documented
    divergence, same contract as the ingest path's idempotent
    re-delivery)."""
    from engine.query import percolate

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = percolate(queries, batch_df, id_col=id_col, text_col=text_col)
        out.write.mode("append").parquet(os.path.join(out_dir, "alerts"))

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", os.path.join(out_dir, "_perc_ckpt")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
