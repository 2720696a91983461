"""Attributable A/B for the round-5 position-stream block skipping:
same positional index, same phrases, alternating the skipping kernel vs
a decode-everything variant (the pre-round-5 behavior), interleaved per
phrase so host drift cancels.

Usage: python scripts/ab_pos_skip.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _candidates_decode_all(rows, slots, dels, allow=None):
    """Pre-round-5 _phrase_candidates: positions decode for EVERY block of
    every term row, before the doc intersection."""
    from engine import postings as P
    from engine.query import _live_mask, _norm_blocks

    by_term = {}
    for r in rows:
        blocks = _norm_blocks(r.blocks)
        docs, tfs, dls = P.decode_term_postings(
            r.docs_bin, r.tfs_bin, r.dls_bin, blocks
        )
        pos = P.decode_term_positions(tfs, r.pos_bin, list(r.pos_offs), blocks)
        occ = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
        by_term[r.term] = (docs, tfs.astype(np.int64), dls, pos, occ)
    slot_docs = []
    for alts in dict.fromkeys(tuple(s) for s in slots):
        present = [by_term[t][0] for t in alts if t in by_term]
        if not present:
            return None
        slot_docs.append(
            present[0] if len(present) == 1 else np.unique(np.concatenate(present))
        )
    slot_docs.sort(key=lambda d: d.size)
    cand = slot_docs[0]
    for d in slot_docs[1:]:
        idx = np.searchsorted(d, cand)
        np.minimum(idx, d.size - 1, out=idx)
        cand = cand[d[idx] == cand]
        if cand.size == 0:
            return None
    mask = _live_mask(cand, dels)
    if mask is not None:
        cand = cand[mask]
    if allow is not None and cand.size:
        idx = np.searchsorted(allow, cand)
        np.minimum(idx, allow.size - 1, out=idx)
        cand = cand[allow[idx] == cand] if allow.size else cand[:0]
    if cand.size == 0:
        return None
    return by_term, cand


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000

    import engine.query as Q
    from engine import synth
    from engine.index_build import build_index
    from engine.query import IndexReader, match_phrase_topk
    from engine.session import get_spark

    spark = get_spark("ab-pos-skip", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth.cached_pages(n_docs)
    work = tempfile.mkdtemp(prefix="sparkft_abskip_")
    idx = os.path.join(work, "idx")
    build_index(spark, corpus, idx, n_shards=8, n_buckets=32, bucket_chunk=32,
                index_options="positions")
    reader = IndexReader(spark, idx)

    sample = spark.read.parquet(corpus).select("text").limit(12).collect()
    phrases = []
    for r in sample:
        toks = r["text"].lower().split()
        if len(toks) >= 8:
            phrases.append(" ".join(toks[1:3]))
            phrases.append(" ".join(toks[4:7]))
    phrases = list(dict.fromkeys(p for p in phrases if p))[:12]

    skipping = Q._phrase_candidates  # round-5 kernel
    import engine.spans as S

    res = {"skip": [], "all": []}
    first = {}
    for ph in phrases:
        for mode in ("skip", "all", "all", "skip"):  # ABBA per phrase
            Q._phrase_candidates = skipping if mode == "skip" else _candidates_decode_all
            t0 = time.time()
            got = tuple(
                (r["url"], round(r["score"], 9))
                for r in match_phrase_topk(reader, ph, k=10).collect()
            )
            res[mode].append(time.time() - t0)
            if ph not in first:
                first[ph] = got
            assert got == first[ph], f"variant mismatch on {ph!r}"
    Q._phrase_candidates = skipping
    for m in res:
        res[m].sort()

    def pct(a, p):
        return round(a[min(len(a) - 1, int(p * len(a)))], 4)

    print(json.dumps({
        "n_docs": n_docs, "n_phrases": len(phrases),
        "skip_p50": pct(res["skip"], 0.5), "skip_p95": pct(res["skip"], 0.95),
        "all_p50": pct(res["all"], 0.5), "all_p95": pct(res["all"], 0.95),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
