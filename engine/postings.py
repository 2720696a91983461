"""Posting-list codec: delta + StreamVByte encoding with block-max metadata.

Layout (frozen; SURVEY.md section 4.3 item 2):
- Postings for one (shard, term) are doc-id-sorted and cut into blocks of
  ``BLOCK`` (=128) docs. Each block is encoded independently so the query
  engine can skip a whole block without decoding it (block-max WAND).
- Per block, three StreamVByte streams: doc-id deltas (first delta relative
  to the previous block's last doc id, -1 before block 0), term frequencies,
  and doc lengths (dl travels WITH the posting — Lucene-norms analog — so
  query-time scoring needs no global doc-length broadcast; that is the
  10^12-doc scale path).
- Block metadata: (first_doc, last_doc, n, byte offsets of the three streams,
  max_impact) where ``max_impact`` is the exact max over the block of the
  BM25 term impact tf/(tf + k1*(1-b+b*dl/avgdl)) — multiplying by idf gives
  the block's score upper bound.

StreamVByte (public format, Lemire et al.): per group of 4 values one control
byte (2 bits each = byte-length-1), data bytes follow, values little-endian.
Control bits for value j within its group live at bits 2j..2j+1. Everything
here is numpy-vectorized; no per-value Python in encode or decode.

The reference delegates all of this to Lucene (SURVEY.md 2.6 M1-M5); this is
the from-scratch replacement mandated by BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
K1 = 1.2
B = 0.75

_SHIFTS = np.array([0, 2, 4, 6], dtype=np.uint8)


def svb_encode(values: np.ndarray) -> bytes:
    """StreamVByte-encode a uint32 array. Returns control||data bytes."""
    a = np.ascontiguousarray(values, dtype="<u4")
    n = a.size
    if n == 0:
        return b""
    lens = np.ones(n, dtype=np.uint8)
    lens[a > 0xFF] = 2
    lens[a > 0xFFFF] = 3
    lens[a > 0xFFFFFF] = 4
    codes = (lens - 1).astype(np.uint8)
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    ctrl = (codes.reshape(-1, 4) << _SHIFTS).sum(axis=1, dtype=np.uint16).astype(np.uint8)
    byte_mat = a.view(np.uint8).reshape(n, 4)
    mask = np.arange(4, dtype=np.uint8) < lens[:, None]
    data = byte_mat[mask]  # row-major: per-value little-endian bytes in order
    return ctrl.tobytes() + data.tobytes()


def svb_decode(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Decode ``n`` uint32 values from a svb_encode() buffer."""
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    n_ctrl = (n + 3) // 4
    ctrl = raw[:n_ctrl]
    codes = ((ctrl[:, None] >> _SHIFTS) & 3).reshape(-1)[:n]
    lens = codes.astype(np.int64) + 1
    data = raw[n_ctrl : n_ctrl + int(lens.sum())]
    mat = np.zeros((n, 4), dtype=np.uint8)
    mask = np.arange(4) < lens[:, None]
    mat[mask] = data
    return mat.view("<u4").ravel().astype(np.uint32)


def bm25_impact(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """Exact BM25 term impact (idf excluded): tf/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl)))


def bm25_idf(df: int | np.ndarray, n_docs: int) -> float | np.ndarray:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def encode_term_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> dict:
    """Encode one (shard, term)'s doc-sorted postings.

    Returns dict with docs_bin/tfs_bin/dls_bin (concatenated per-block svb
    streams) and blocks: list of (first_doc, last_doc, n, doc_off, tf_off,
    dl_off, max_impact). Offsets index into the respective binary; a block's
    stream ends where the next block's begins (or at the end).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    assert n > 0
    deltas = np.diff(doc_ids, prepend=np.int64(-1)).astype(np.uint32)
    impacts = bm25_impact(np.asarray(tfs), np.asarray(dls), avgdl, k1, b)

    docs_parts: list[bytes] = []
    tfs_parts: list[bytes] = []
    dls_parts: list[bytes] = []
    blocks: list[tuple] = []
    doc_off = tf_off = dl_off = 0
    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        d = svb_encode(deltas[s:e])
        t = svb_encode(np.asarray(tfs[s:e], dtype=np.uint32))
        l = svb_encode(np.asarray(dls[s:e], dtype=np.uint32))
        blocks.append(
            (
                int(doc_ids[s]),
                int(doc_ids[e - 1]),
                int(e - s),
                doc_off,
                tf_off,
                dl_off,
                float(impacts[s:e].max()),
            )
        )
        docs_parts.append(d)
        tfs_parts.append(t)
        dls_parts.append(l)
        doc_off += len(d)
        tf_off += len(t)
        dl_off += len(l)
    return {
        "docs_bin": b"".join(docs_parts),
        "tfs_bin": b"".join(tfs_parts),
        "dls_bin": b"".join(dls_parts),
        "blocks": blocks,
        "df": int(n),
        "cf": int(np.asarray(tfs).sum()),
    }


def _block_bounds(blocks: list, i: int, which: int, total_len: int) -> tuple[int, int]:
    off = blocks[i][which]
    end = blocks[i + 1][which] if i + 1 < len(blocks) else total_len
    return off, end


def decode_block(
    docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes, blocks: list, i: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block i -> (doc_ids int64, tfs uint32, dls uint32)."""
    first_doc, _last, n, _do, _to, _lo, _mi = blocks[i]
    do, de = _block_bounds(blocks, i, 3, len(docs_bin))
    to, te = _block_bounds(blocks, i, 4, len(tfs_bin))
    lo, le = _block_bounds(blocks, i, 5, len(dls_bin))
    deltas = svb_decode(memoryview(docs_bin)[do:de], n).astype(np.int64)
    prev_last = blocks[i - 1][1] if i > 0 else -1
    doc_ids = np.cumsum(deltas) + prev_last
    tfs = svb_decode(memoryview(tfs_bin)[to:te], n)
    dls = svb_decode(memoryview(dls_bin)[lo:le], n)
    return doc_ids, tfs, dls


def decode_term_postings(
    docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes, blocks: list
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks of one (shard, term). Blocks are independent svb
    streams (each with its own control section), so decode block-by-block."""
    parts = [decode_block(docs_bin, tfs_bin, dls_bin, blocks, i) for i in range(len(blocks))]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )
