"""Hybrid lexical + vector retrieval: reciprocal-rank fusion (the ES
`retriever: {rrf: ...}` block, RRF per Cormack/Clarke/Buettcher 2009).

The modern search stack pairs BM25 with embedding similarity; RRF fuses
the two WITHOUT score calibration — each ranking contributes
1 / (rank_constant + rank), so only positions matter and the fused
ordering is scale-free. Frozen spec (makes the DuckDB twin exact):

- lexical ranking: bm25_topk's top `window` docs re-ranked by 6-dp
  ROUNDED score desc then _id (url string) asc — the same float-noise
  guard as collapse/sampler;
- vector ranking: cosine_topk's top `window` (already frozen: 6-dp
  rounded cosine desc, neighbor_id asc); embeddings join documents by
  the frozen layout vec_id == doc_id, so both rankings speak _id;
- fused score = lex_contrib + vec_contrib in that fixed order, ids
  missing from a ranking contribute 0 (never penalized);
- output order: fused score desc (6-dp rounded), _id asc; top k.

Scale shape: both legs are bounded top-`window` retrievals (the BM25 leg
through the pruned kernels, the vector leg through the exact scan or the
LSH/IVF ANN paths — swap `knn_top` for lsh_ann_topk at corpus scale);
the fusion itself touches 2*window rows on the driver."""

from __future__ import annotations

import pandas as pd


def rrf_topk(
    reader,
    query,
    embeddings,
    query_vector: list,
    k: int = 10,
    rank_constant: int = 60,
    window: int = 100,
    mode: str = "or",
) -> "object":
    """(id, score, lex_rank, vec_rank) DataFrame — see module docstring."""
    from engine.query import bm25_topk
    from engine.simsearch import cosine_topk

    spark = reader.spark
    lex = bm25_topk(reader, query, k=window, mode=mode).toPandas()
    lex["score"] = lex["score"].round(6)
    lex = lex.sort_values(
        ["score", "url"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    lex_rank = {u: i + 1 for i, u in enumerate(lex["url"])}

    probes = spark.createDataFrame(
        [(-1, [float(x) for x in query_vector])],
        "probe_id long, embedding array<float>",
    )
    vec = cosine_topk(embeddings, probes, k=window).orderBy("rank").toPandas()
    vec_rank = {str(n): int(r) for n, r in zip(vec["neighbor_id"], vec["rank"])}

    ids = sorted(set(lex_rank) | set(vec_rank))
    rows = []
    for i in ids:
        lr, vr = lex_rank.get(i), vec_rank.get(i)
        s = (1.0 / (rank_constant + lr) if lr else 0.0) + (
            1.0 / (rank_constant + vr) if vr else 0.0
        )
        rows.append((i, round(s, 6), lr, vr))
    out = pd.DataFrame(rows, columns=["id", "score", "lex_rank", "vec_rank"])
    out = out.sort_values(
        ["score", "id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out["lex_rank"] = out["lex_rank"].astype("Int64")
    out["vec_rank"] = out["vec_rank"].astype("Int64")
    return spark.createDataFrame(
        out, "id string, score double, lex_rank long, vec_rank long"
    )
