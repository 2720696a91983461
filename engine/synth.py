"""Deterministic synthetic web-page corpus + frozen query set.

Implements FIXTURES.md section 1 (`pages`) and section 3 (`queries`): a
seed-stable Common-Crawl-style table (url, warc_ts, html, text, lang) whose
`html` wraps `text` in deterministic boilerplate so the extractor
(engine/extract.py) is meaningfully exercised, with the frozen invariant
``extract(html) == text`` byte-identical per url.

Shape mirrors the reference source model (a single scanned collection with
nullable payloads, /root/reference/companybindex/main.go:105-113 and
transform/transform.go:37-45): ~1% null text and ~1% empty text rows exercise
the reject filters.

No wall-clock anywhere: warc_ts = 2026-01-01T00:00:00Z + i seconds.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07  # Zipf exponent: realistic web-text head skew
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def make_vocab(size: int = VOCAB_SIZE, seed: int = SEED) -> list[str]:
    """Seed-stable vocabulary of `size` distinct lowercase letter words."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < size:
        lens = rng.integers(2, 13, size=size)
        for ln in lens:
            w = "".join(rng.choice(_LETTERS, size=ln))
            if w not in seen:
                seen.add(w)
                vocab.append(w)
                if len(vocab) == size:
                    break
    return vocab


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def make_html(text: str | None, i: int) -> bytes | None:
    """Deterministic boilerplate wrapper; extract.py must invert it exactly."""
    if text is None:
        return None
    esc = _html.escape(text, quote=False)
    title = f"page {i:08d}"
    doc = (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body{margin:0}</style>"
        "<script>function junk(){var x=1;}</script>"
        "</head><body>"
        f"<p>{esc}</p>"
        "<script>junk();</script>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def _weighted_draw(rng: np.random.Generator, probs: np.ndarray, size: int) -> np.ndarray:
    """Bit-identical fast path for rng.choice(len(probs), size, p=probs):
    numpy's Generator.choice(replace=True, p=...) is exactly
    cdf.searchsorted(rng.random(size), side='right') on the normalized
    cumsum (verified identical on this numpy), but ~1.6x slower through
    the choice wrapper — and the single searchsorted call serializes.
    Chunking the uniforms across a thread pool gives the same values
    (searchsorted is pure + releases the GIL) with multi-core speed; the
    RNG stream advances exactly as choice would (one uniform per draw),
    so every later draw in the caller is unchanged."""
    cdf = probs.cumsum()
    cdf /= cdf[-1]
    u = rng.random(size)
    if size < 2_000_000:
        return cdf.searchsorted(u, side="right")
    from concurrent.futures import ThreadPoolExecutor

    n_chunks = min(16, max(2, size // 1_000_000))
    chunks = np.array_split(u, n_chunks)
    with ThreadPoolExecutor(max_workers=n_chunks) as ex:
        parts = list(ex.map(lambda c: cdf.searchsorted(c, side="right"), chunks))
    return np.concatenate(parts)


def generate_pages(n_docs: int, seed: int = SEED) -> pa.Table:
    """Seed-stable `pages` table as a pyarrow Table."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    doc_lens = rng.integers(5, 501, size=n_docs)
    # Flat draw of all tokens at once, then split per doc — vectorized.
    total = int(doc_lens.sum())
    token_ids = _weighted_draw(rng, probs, total)
    offsets = np.concatenate(([0], np.cumsum(doc_lens)))

    null_mask = rng.random(n_docs) < 0.01
    empty_mask = (~null_mask) & (rng.random(n_docs) < 0.01)
    lang_draw = rng.random(n_docs)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_docs):
        urls.append(f"https://site{i % 997}.example/{i:08d}")
        tss.append(EPOCH + timedelta(seconds=i))
        if null_mask[i]:
            text = None
        elif empty_mask[i]:
            text = ""
        else:
            text = " ".join(vocab[token_ids[offsets[i] : offsets[i + 1]]])
        texts.append(text)
        htmls.append(make_html(text, i))
        langs.append("en" if lang_draw[i] < 0.90 else ("cy" if lang_draw[i] < 0.99 else ""))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, n_docs: int, seed: int = SEED, row_group_size: int = 8192) -> None:
    import pyarrow.parquet as pq

    # small row groups => the scan is splittable => the tokenize/explode map
    # side parallelizes (a single row group would serialize it on one task)
    pq.write_table(generate_pages(n_docs, seed), path, row_group_size=row_group_size)


def cached_pages(n_docs: int, seed: int = SEED) -> str:
    """Path to a machine-local cached copy of the corpus. The table is
    deterministic, so it is content-addressed by (seed, n_docs): generated
    once, reused across bench invocations and scaling legs. Atomic rename —
    racing writers both produce the same bytes."""
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"sparkft_pages_{seed}_{n_docs}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp{os.getpid()}"
        write_pages(tmp, n_docs, seed)
        os.replace(tmp, path)
    return path


# query mode per frozen-query kind — shared by bench + tests so the
# mapping can't drift between the harnesses
MODE_BY_KIND = {"single": "or", "and": "and", "or": "or", "prefix": "prefix", "absent": "or"}


def frozen_queries(seed: int = SEED) -> list[dict]:
    """FIXTURES.md section 3: 20 deterministic queries over the vocabulary.

    Ranks are vocabulary Zipf ranks (rank 0 = head term), so head/mid/tail
    df mix is guaranteed by construction.
    """
    vocab = make_vocab()
    rng = np.random.default_rng(seed + 1)
    head = [0, 3, 7]
    mid = [150, 600]
    single = [[vocab[r]] for r in head + mid]
    two = [[vocab[int(a)], vocab[int(b)]] for a, b in rng.integers(0, 2000, size=(5, 2))]
    three = [
        [vocab[int(a)], vocab[int(b)], vocab[int(c)]]
        for a, b, c in rng.integers(0, 5000, size=(5, 3))
    ]
    prefix = [[vocab[int(r)][:4]] for r in rng.integers(0, 500, size=3)]
    absent = [["zzzzabsentterm"], ["qqqqmissing"]]
    out = []
    qid = 1
    for kind, qs in (
        ("single", single),
        ("and", two),
        ("or", three),
        ("prefix", prefix),
        ("absent", absent),
    ):
        for terms in qs:
            out.append({"query_id": qid, "kind": kind, "terms": terms, "k": 10})
            qid += 1
    return out
