"""BM25 top-k query engine over the built index.

Execution (SURVEY.md 3.3): analyze the query with the SAME frozen analyzer
used at index time -> look up per-term global df from term_stats (bucket-
pruned parquet read, tiny) -> compute Lucene idf on the driver -> read only
the query terms' posting rows (bucket directory pruning + term pushdown) ->
groupBy(shard).applyInPandas: per doc-shard top-k with block-max WAND (or
vectorized TAAT), bounded heap -> broadcast-join the tiny per-shard heaps
back to docmap for urls -> global orderBy(score desc, doc_id asc).limit(k).

Three physical algorithms, all rank-identical to the oracle:
- algo="wand": vectorized block-max pruning — doc space is cut at posting-
  block boundaries into disjoint intervals, processed in descending
  upper-bound order; intervals whose block-max sum can't beat theta are
  skipped without decoding, survivors are scored with numpy accumulation.
  The 10^12-doc scale path: work is bounded by the blocks whose upper
  bound beats theta, with zero per-posting Python.
- algo="wand_daat": classic doc-at-a-time Block-Max WAND (Ding & Suel,
  public) with lazy cursors — the literature-faithful cross-check.
- algo="taat": term-at-a-time vectorized numpy accumulation — decodes the
  query terms' postings fully; the brute-force cross-check at any scale.

Scoring spec is frozen (SURVEY.md 5.4): exact dl, idf = ln(1+(N-df+0.5)/
(df+0.5)), score = sum idf * tf/(tf+k1*(1-b+b*dl/avgdl)), ties doc_id asc.

Deletes (engine/deletes.py): tombstoned docs are masked at decode time in
every kernel — Lucene's live-docs-bitmap semantics. Global stats (n_docs,
df, avgdl) keep counting deleted docs until compaction, so masking only
REMOVES docs from results; surviving scores are unchanged. Block-max
metadata still upper-bounds the masked postings (deleting docs can only
lower a block's true max), so WAND/BMW pruning stays safe. The reader
loads tombstones once (point-in-time view, same contract as the
generation guard); construct a new reader to observe new deletes.
"""

from __future__ import annotations

import heapq
import json
import os
from collections import namedtuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import postings as P
from engine.oracle import analyze_query_py


class IndexReader:
    """Query-side handle on one built index dir. Caches are bound to the
    bytes present at first use (dataset handles, dictionary, docmap) — a
    reader is a searcher over one index generation; construct a NEW reader
    after rebuilding or merging into the same directory."""

    # cache the term dictionary / docmap only when comfortably in-memory;
    # above this the parquet scans (bucket-pruned) are the scale path
    CACHE_MAX_DOCS = 5_000_000
    # resident docmap url arrays (driver serving path) — tighter gate than
    # CACHE_MAX_DOCS because urls are the wide column (~100 B each)
    DOCMAP_MEM_MAX_DOCS = 2_000_000

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        snapshot_id: int | None = None,
        field: str | None = None,
    ):
        self.spark = spark
        self.dir = index_dir
        # pin the live-docs view to a delete snapshot (engine/deletes.py
        # list_snapshots): 0 = base build, k = after the k-th delete batch,
        # None = current. Postings/docmap are immutable between snapshots,
        # so pinning tombstones IS time travel for this index layout.
        self.snapshot_id = snapshot_id
        self._manifest_path = os.path.join(index_dir, "MANIFEST.json")
        with open(self._manifest_path) as f:
            self.manifest = json.load(f)
        # generation id: the manifest is (re)written LAST by build/merge, so
        # its mtime identifies the index generation this reader's caches are
        # bound to. Cached paths check it and raise instead of silently
        # serving stale terms/urls after an in-place rebuild.
        self._gen_mtime_ns = os.stat(self._manifest_path).st_mtime_ns
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]
        self.k1 = self.manifest["k1"]
        self.b = self.manifest["b"]
        self.n_buckets = self.manifest["n_buckets"]
        # "freqs" (default, pre-positions indexes) or "positions"
        self.index_options = self.manifest.get("index_options", "freqs")
        # multi-field indexes (engine/index_build.py text_fields): one
        # reader serves ONE field's postings/dictionary; for_field() hands
        # out sibling readers over the shared docmap/doc-id space. avgdl is
        # the FIELD's (ES: per-field norms/stats).
        self.text_fields: list[str] = self.manifest.get("text_fields", ["text"])
        self.multi_field = len(self.text_fields) > 1
        self.field = field or self.text_fields[0]
        if self.field not in self.text_fields:
            raise ValueError(
                f"field {self.field!r} is not indexed (text_fields={self.text_fields})"
            )
        fsub = f"/field={self.field}" if self.multi_field else ""
        self._post_sub = "postings" + fsub
        self._ts_sub = "term_stats" + fsub
        if self.multi_field:
            self.avgdl = self.manifest["field_stats"][self.field]["avgdl"]
        self.stored_cols: list[str] = self.manifest.get("stored_cols", [])
        self._field_readers: dict[str, "IndexReader"] = {self.field: self}
        self._ts_df: DataFrame | None = None
        self._dm_df: DataFrame | None = None
        self._pa_ds: dict = {}  # cached pyarrow dataset handles per subdir
        self._ts_cache: dict[str, int] | None = None  # term -> df (small idx)
        self._dm_cache: dict[int, list] | None = None  # shard -> url list
        self._tomb: dict[int, np.ndarray] | None = None  # shard -> sorted dels

    def _check_generation(self) -> None:
        """Raise if the index was rebuilt/merged in place since this reader
        was constructed — the cached dataset handles / dictionary / docmap
        would silently serve the OLD generation otherwise. An os.stat is
        ~1 us; construct a new IndexReader after any in-place rebuild."""
        now = os.stat(self._manifest_path).st_mtime_ns
        if now != self._gen_mtime_ns:
            raise RuntimeError(
                f"index at {self.dir} changed generation (manifest mtime "
                f"{self._gen_mtime_ns} -> {now}); this IndexReader's caches "
                "are stale — construct a new IndexReader"
            )

    def for_field(self, field: str) -> "IndexReader":
        """Sibling reader over another indexed field of the SAME index
        generation (shared docmap/doc ids/tombstones; per-field postings,
        dictionary, and avgdl). Cached per root reader, so multi-field
        queries pay the manifest read once per field per process."""
        if field not in self._field_readers:
            r = IndexReader(self.spark, self.dir, self.snapshot_id, field=field)
            r._field_readers = self._field_readers  # share the sibling cache
            self._field_readers[field] = r
        return self._field_readers[field]

    def _pa_dataset(self, sub: str):
        """Cached pyarrow dataset handle: file/partition discovery costs a
        few ms per open — pay it once per reader, not per query."""
        self._check_generation()
        if sub not in self._pa_ds:
            import pyarrow.dataset as ds

            self._pa_ds[sub] = ds.dataset(
                os.path.join(self.dir, sub), format="parquet", partitioning="hive"
            )
        return self._pa_ds[sub]

    def tombstones(self) -> dict[int, np.ndarray]:
        """{shard: sorted unique deleted local_id int64 array}, loaded once
        per reader (point-in-time live-docs view, like a Lucene searcher's
        deleted-docs bitmap). Tombstone batches are tiny by contract
        (engine/deletes.py), so they ride into the Spark kernels inside the
        applyInPandas closure."""
        if self._tomb is None:
            from engine.deletes import load_tombstones

            self._tomb = load_tombstones(self.dir, self.spark, as_of=self.snapshot_id)
        return self._tomb

    def _term_stats_df(self) -> DataFrame:
        self._check_generation()
        if self._ts_df is None:
            ts = self.spark.read.parquet(os.path.join(self.dir, self._ts_sub))
            if self.n_docs <= self.CACHE_MAX_DOCS:
                ts = ts.persist()
            self._ts_df = ts
        return self._ts_df

    def _bucket_of(self, terms: list[str]) -> list[int]:
        # driver-side XXH64 (bit-identical to Spark's xxhash64, tested) —
        # no Spark job just to route terms to buckets
        from engine.hashing import term_bucket

        return sorted({term_bucket(t, self.n_buckets) for t in terms})

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """Global df per term — bucket-pruned + term-pushdown read.

        On a local index dir this is a driver-side pyarrow dataset read
        (|q| bucket directories, term predicate into row groups) — no
        Spark job for a handful of dictionary rows; the Spark scan remains
        the fallback for remote dirs."""
        if not terms:
            return {}
        if self._ts_cache is not None:
            self._check_generation()
            return {t: self._ts_cache[t] for t in terms if t in self._ts_cache}
        buckets = self._bucket_of(terms)
        p = os.path.join(self.dir, self._ts_sub)
        if os.path.isdir(p):
            import pyarrow.dataset as ds

            if self.n_docs <= self.CACHE_MAX_DOCS:
                # small index: load the whole dictionary once (vocab grows
                # ~ docs^0.5-0.7, Heaps' law — a few MB here); per-query
                # lookups become dict hits. Above the gate the bucket-pruned
                # + term-pushdown read IS the scale path.
                tbl = self._pa_dataset(self._ts_sub).to_table(columns=["term", "df"])
                self._ts_cache = dict(
                    zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
                )
                return {t: self._ts_cache[t] for t in terms if t in self._ts_cache}
            tbl = self._pa_dataset(self._ts_sub).to_table(
                filter=ds.field("bucket").isin(buckets) & ds.field("term").isin(terms),
                columns=["term", "df"],
            )
            return dict(
                zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
            )
        ts = self._term_stats_df()
        rows = (
            ts.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: r["df"] for r in rows}

    def expand_prefix(self, prefix: str, max_expansions: int = 128) -> list[str]:
        """Prefix rewrite against the term dictionary (scoring_boolean).

        Bounded like Lucene's top_terms_N rewrite: at most max_expansions
        terms, highest-df first (a 1-char prefix over a web-scale vocabulary
        must not collect the whole dictionary to the driver). Local index
        dirs are served by a driver-side pyarrow range read (term_stats is
        term-sorted within buckets, so [prefix, prefix+1) prunes row
        groups); the Spark scan remains the remote-dir fallback."""
        p = os.path.join(self.dir, self._ts_sub)
        if prefix and os.path.isdir(p):
            import pyarrow.dataset as ds

            hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
            tbl = self._pa_dataset(self._ts_sub).to_table(
                filter=(ds.field("term") >= prefix) & (ds.field("term") < hi),
                columns=["term", "df"],
            )
            pairs = [
                (t, d)
                for t, d in zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
                if t.startswith(prefix)
            ]
            pairs.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in pairs[:max_expansions]]
        ts = self._term_stats_df()
        return [
            r["term"]
            for r in ts.filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        ]

    def expand_fuzzy(
        self,
        term: str,
        max_edits: int | None = None,
        max_expansions: int = 50,
        prefix_length: int = 0,
    ) -> list[str]:
        """Fuzzy rewrite against the term dictionary: terms within classic
        Levenshtein distance max_edits of `term`, highest-df first (term
        asc tiebreak), capped at max_expansions (ES fuzzy default 50).

        max_edits=None applies ES AUTO fuzziness: 0 edits for 1-2 char
        terms, 1 for 3-5, 2 above. prefix_length (ES fuzzy prefix_length)
        requires the first p chars to match exactly and enables the same
        range-pruned dictionary read as expand_prefix. Spec choices vs ES,
        frozen: classic Levenshtein (fuzzy_transpositions=false — Spark's
        and DuckDB's native levenshtein are both classic) and
        scoring_boolean rewrite (each expansion scored with its own idf,
        matching expand_prefix) instead of top_terms_blended_freqs.

        Scale: the cached-vocabulary driver path serves small indexes; a
        web-scale dictionary is matched by a distributed scan with the
        length-band predicate (|len(t)-len(q)| <= d) in codegen and
        Spark's thresholded levenshtein short-circuiting the DP — the
        dictionary is bucket-hashed, so no bucket pruning is possible for
        fuzzy (unlike exact-term lookups); pruning comes from prefix_length
        when set."""
        q = term
        if max_edits is None:  # ES AUTO
            max_edits = 0 if len(q) <= 2 else (1 if len(q) <= 5 else 2)
        if max_edits == 0:
            return [q] if self.term_stats([q]) else []
        lo_len, hi_len = len(q) - max_edits, len(q) + max_edits
        pref = q[:prefix_length]
        if self._ts_cache is None and self.n_docs <= self.CACHE_MAX_DOCS:
            self.term_stats([q])  # populates the whole-vocab cache
        if self._ts_cache is not None:
            self._check_generation()
            pairs = [
                (t, df)
                for t, df in self._ts_cache.items()
                if lo_len <= len(t) <= hi_len
                and t.startswith(pref)
                and _lev_within(q, t, max_edits)
            ]
            pairs.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in pairs[:max_expansions]]
        ts = self._term_stats_df()
        cond = F.length("term").between(lo_len, hi_len)
        if pref:
            hi = pref[:-1] + chr(ord(pref[-1]) + 1)
            cond = cond & (F.col("term") >= pref) & (F.col("term") < hi)
        rows = (
            ts.filter(cond)
            .filter(F.levenshtein(F.col("term"), F.lit(q), max_edits) != -1)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def _expand_matching(
        self, match_py, spark_cond, prefix_lit: str, max_expansions: int
    ) -> list[str]:
        """Shared bounded dictionary rewrite (wildcard/regexp): terms
        passing `match_py`, highest-df first (term asc tiebreak), capped at
        max_expansions — Lucene's top_terms_N rewrite bound. Serving order:
        whole-vocab driver cache (small index) -> literal-prefix-pruned
        local pyarrow read -> distributed scan with `spark_cond`."""
        if self._ts_cache is None and self.n_docs <= self.CACHE_MAX_DOCS:
            self.term_stats([prefix_lit or "\x00"])  # populate the cache
        if self._ts_cache is not None:
            self._check_generation()
            pairs = [(t, d) for t, d in self._ts_cache.items() if match_py(t)]
            pairs.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in pairs[:max_expansions]]
        p = os.path.join(self.dir, self._ts_sub)
        if prefix_lit and os.path.isdir(p):
            import pyarrow.dataset as ds

            hi = prefix_lit[:-1] + chr(ord(prefix_lit[-1]) + 1)
            tbl = self._pa_dataset(self._ts_sub).to_table(
                filter=(ds.field("term") >= prefix_lit) & (ds.field("term") < hi),
                columns=["term", "df"],
            )
            pairs = [
                (t, d)
                for t, d in zip(
                    tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
                )
                if match_py(t)
            ]
            pairs.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in pairs[:max_expansions]]
        ts = self._term_stats_df()
        rows = (
            ts.filter(spark_cond)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def expand_wildcard(self, pattern: str, max_expansions: int = 128) -> list[str]:
        """Wildcard rewrite (`*` = any sequence, `?` = one char — the ES
        wildcard query alphabet) against the term dictionary, df-ordered
        and capped like expand_prefix. The literal run before the first
        wildcard prunes the dictionary read; a leading-wildcard pattern
        scans the whole dictionary (the same cost ES warns about). The
        pattern is NOT analyzed (ES wildcard operates on raw terms)."""
        import re as _re

        lit = _re.match(r"[^*?]*", pattern).group(0)
        if lit == pattern:  # no wildcards: plain term lookup
            return [pattern] if self.term_stats([pattern]) else []
        rx = _re.compile(
            "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in pattern
            )
        )
        # LIKE translation is exact for the */? alphabet over \w+ terms
        # (terms never contain % or _)
        like = pattern.replace("*", "%").replace("?", "_")
        return self._expand_matching(
            lambda t: rx.fullmatch(t) is not None,
            F.col("term").like(like),
            lit,
            max_expansions,
        )

    def expand_regexp(self, pattern: str, max_expansions: int = 128) -> list[str]:
        """Regexp rewrite (ES regexp query: the pattern is implicitly
        anchored at both ends and not analyzed) against the term
        dictionary, df-ordered and capped. Portability contract: patterns
        must stay within the syntax shared by Python re, Java regex, and
        RE2 (classes, alternation, ?/*/+ quantifiers) — the frozen oracle
        (DuckDB regexp_full_match) runs RE2."""
        import re as _re

        lit = _re.match(r"[^\\\[\](){}.*+?|^$]*", pattern).group(0)
        if lit == pattern:
            return [pattern] if self.term_stats([pattern]) else []
        rx = _re.compile(pattern)
        return self._expand_matching(
            lambda t: rx.fullmatch(t) is not None,
            F.col("term").rlike(f"^(?:{pattern})$"),
            lit,
            max_expansions,
        )

    def postings(self, terms: list[str]) -> DataFrame:
        buckets = self._bucket_of(terms)
        post = self.spark.read.parquet(os.path.join(self.dir, self._post_sub))
        return post.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    def docmap(self) -> DataFrame:
        self._check_generation()
        if self._dm_df is None:
            dm = self.spark.read.parquet(os.path.join(self.dir, "docmap"))
            if self.n_docs <= self.CACHE_MAX_DOCS:
                dm = dm.persist()
            self._dm_df = dm
        return self._dm_df

    # a query whose total posting count is below this is served entirely
    # on the driver (node-local read of |q| bucket dirs + in-process
    # kernels) — the Lucene-searcher-style serving path; bigger queries
    # scatter-gather through Spark. ~5M postings decode to a few tens of
    # MB of numpy — comfortable driver work either way.
    LOCAL_MAX_POSTINGS = 5_000_000

    def postings_local(self, terms: list[str]):
        """Driver-side postings read for a small query: pyarrow dataset
        scan of the terms' bucket directories (hive partition pruning +
        term row-group pushdown). Returns {shard: [row, ...]} with the
        same attribute shape the Spark kernels consume, or None when the
        postings aren't a local directory."""
        p = os.path.join(self.dir, self._post_sub)
        if not os.path.isdir(p):
            return None
        import pyarrow.dataset as ds

        tbl = self._pa_dataset(self._post_sub).to_table(
            filter=ds.field("bucket").isin(self._bucket_of(terms))
            & ds.field("term").isin(terms),
            columns=["shard", "term", "docs_bin", "tfs_bin", "dls_bin", "blocks"],
        )
        by_shard: dict[int, list] = {}
        cols = [tbl.column(c).to_pylist() for c in
                ("shard", "term", "docs_bin", "tfs_bin", "dls_bin", "blocks")]
        for shard, term, d_bin, t_bin, l_bin, blocks in zip(*cols):
            by_shard.setdefault(int(shard), []).append(
                _PostRow(term, d_bin, t_bin, l_bin, blocks)
            )
        return by_shard

    def postings_pos_local(self, terms: list[str]):
        """postings_local twin for positional indexes: same pruned pyarrow
        read plus the pos_bin/pos_offs position stream (match_phrase's
        input). None when the postings aren't a local directory."""
        p = os.path.join(self.dir, self._post_sub)
        if not os.path.isdir(p):
            return None
        import pyarrow.dataset as ds

        names = ("shard", "term", "docs_bin", "tfs_bin", "dls_bin", "blocks",
                 "pos_bin", "pos_offs")
        tbl = self._pa_dataset(self._post_sub).to_table(
            filter=ds.field("bucket").isin(self._bucket_of(terms))
            & ds.field("term").isin(terms),
            columns=list(names),
        )
        by_shard: dict[int, list] = {}
        cols = [tbl.column(c).to_pylist() for c in names]
        for shard, term, d_bin, t_bin, l_bin, blocks, p_bin, p_offs in zip(*cols):
            by_shard.setdefault(int(shard), []).append(
                _PosRow(term, d_bin, t_bin, l_bin, blocks, p_bin, p_offs)
            )
        return by_shard

    def docmap_lookup_local(
        self, shards: list[int], local_ids: list[int]
    ) -> "dict[tuple[int, int], str] | None":
        """Driver-side url lookup for a handful of winner rows: a pyarrow
        dataset read with shard (hive partition) + local_id filters — the
        same directory/row-group pruning as docmap_pruned, WITHOUT paying a
        Spark job launch for k rows. Returns None when the docmap isn't a
        local directory (caller falls back to the Spark path)."""
        p = os.path.join(self.dir, "docmap")
        if not os.path.isdir(p):
            return None
        import pyarrow.dataset as ds

        self._check_generation()
        if self.n_docs <= self.DOCMAP_MEM_MAX_DOCS:
            # small index: resident per-shard url arrays (local ids are
            # dense shard ordinals, so lookup is a list index). Above the
            # gate the pruned read below is the 10^12-doc path.
            if self._dm_cache is None:
                tbl = self._pa_dataset("docmap").to_table(
                    columns=["shard", "local_id", "url"]
                )
                cache: dict[int, list] = {}
                for s, l, u in zip(
                    tbl.column("shard").to_pylist(),
                    tbl.column("local_id").to_pylist(),
                    tbl.column("url").to_pylist(),
                ):
                    lst = cache.setdefault(int(s), [])
                    if len(lst) <= l:
                        lst.extend([None] * (l + 1 - len(lst)))
                    lst[l] = u
                self._dm_cache = cache
            return {
                (int(s), int(l)): self._dm_cache[int(s)][int(l)]
                for s in shards
                for l in local_ids
                if int(s) in self._dm_cache and int(l) < len(self._dm_cache[int(s)])
            }
        tbl = self._pa_dataset("docmap").to_table(
            filter=ds.field("shard").isin([int(s) for s in shards])
            & ds.field("local_id").isin([int(l) for l in local_ids]),
            columns=["shard", "local_id", "url"],
        )
        return {
            (int(s), int(l)): u
            for s, l, u in zip(
                tbl.column("shard").to_pylist(),
                tbl.column("local_id").to_pylist(),
                tbl.column("url").to_pylist(),
            )
        }

    def docmap_pruned(self, shards: list[int], local_ids: list[int]) -> DataFrame:
        """Docmap read restricted to the winner rows: shard isin -> parquet
        PartitionFilters (shard is the partition key, directory pruning);
        local_id isin -> row-group pruning (docmap is local_id-sorted within
        each shard, so min/max stats skip non-matching groups). At 10^12
        docs this touches <= |shards| directories instead of the table."""
        return self.docmap().filter(
            F.col("shard").isin([int(s) for s in shards])
            & F.col("local_id").isin([int(l) for l in local_ids])
        )

    def shard_doclens(
        self, fields: list[str], shards: list[int] | None = None
    ) -> dict[int, tuple[np.ndarray, dict[str, np.ndarray]]]:
        """Per-shard doc-length ("norms") arrays for the given indexed
        fields: {shard: (sorted local_id array, {field: aligned dl
        array})} — the docmap's dl__<field> columns (plain `dl` on a
        single-field index). combined_fields needs every queried field's
        length for every candidate doc, exactly like Lucene reading each
        field's norms. The read is column-pruned to |fields|+2 int
        columns and partition-pruned to the requested shards; it is the
        driver-side twin of the Spark path's docmap cogroup."""
        import pyarrow.dataset as ds

        dl_col = {
            f: (f"dl__{f}" if self.multi_field else "dl") for f in fields
        }
        flt = None
        if shards is not None:
            flt = ds.field("shard").isin([int(s) for s in shards])
        tbl = self._pa_dataset("docmap").to_table(
            filter=flt,
            columns=["shard", "local_id"] + sorted(set(dl_col.values())),
        )
        sh = tbl.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        lid = tbl.column("local_id").to_numpy(zero_copy_only=False)
        cols = {
            c: tbl.column(c).to_numpy(zero_copy_only=False)
            for c in set(dl_col.values())
        }
        out: dict[int, tuple[np.ndarray, dict[str, np.ndarray]]] = {}
        for s in np.unique(sh):
            m = sh == s
            order = np.argsort(lid[m], kind="stable")
            out[int(s)] = (
                lid[m][order],
                {f: cols[dl_col[f]][m][order] for f in fields},
            )
        return out

    def stored_source_df(self) -> DataFrame:
        """The stored `_source` columns as a (url, <col>, ...) DataFrame —
        the ES stored-fields analog (build_index(store_source=...) keeps
        them in the docmap as src__<col>; the reference mapping stores
        non-indexed fields the same way, config/search_scheme.json:213-224).
        Parquet column pruning means this view costs nothing until a
        query actually selects a stored column; highlight/_source serve
        from it without the caller passing a corpus."""
        if not self.stored_cols:
            raise ValueError(
                "index stores no source columns — build with "
                "store_source=True (or a column list) to enable "
                "_source/highlight without a corpus"
            )
        return self.docmap().select(
            "url", *[F.col(f"src__{c}").alias(c) for c in self.stored_cols]
        )

    def get_source(self, urls: list[str]) -> dict[str, dict]:
        """Driver-side stored-source point fetch for a handful of hit
        urls: XXH64 shard routing + ONE pruned pyarrow read per touched
        shard (url isin pushdown), the same cost shape as mget — never a
        docmap scan. Returns {url: {col: value}} for found urls. Falls
        back to a pushed-predicate Spark filter on remote dirs."""
        if not self.stored_cols:
            raise ValueError("index stores no source columns")
        if not urls:
            return {}
        phys = [f"src__{c}" for c in self.stored_cols]
        dm_dir = os.path.join(self.dir, "docmap")
        out: dict[str, dict] = {}
        if os.path.isdir(dm_dir):
            import pyarrow.compute as pc
            import pyarrow.dataset as ds

            from engine.hashing import xxh64

            self._check_generation()
            n_shards = self.manifest["n_shards"]
            by_shard: dict[int, list[str]] = {}
            for u in urls:
                by_shard.setdefault(xxh64(u.encode()) % n_shards, []).append(u)
            for shard, us in by_shard.items():
                part = os.path.join(dm_dir, f"shard={shard}")
                if not os.path.isdir(part):
                    continue
                tbl = ds.dataset(part).to_table(
                    columns=["url"] + phys, filter=pc.field("url").isin(us)
                )
                for row in tbl.to_pylist():
                    out[row["url"]] = {
                        c: row[p] for c, p in zip(self.stored_cols, phys)
                    }
            return out
        rows = (
            self.docmap()
            .filter(F.col("url").isin(list(urls)))
            .select("url", *phys)
            .collect()
        )
        return {
            r["url"]: {c: r[p] for c, p in zip(self.stored_cols, phys)}
            for r in rows
        }

    def shard_offsets(self) -> list[int]:
        """Global doc_id offset per shard (doc_id = offset + local_id).
        From the manifest when present; derived from the docmap otherwise
        (legacy indexes / merged segment dirs)."""
        offs = self.manifest.get("shard_offsets")
        if offs is None:
            rows = (
                self.docmap()
                .groupBy("shard")
                .agg(F.min("doc_id").alias("off"))
                .collect()
            )
            by_shard = {r["shard"]: int(r["off"]) for r in rows}
            offs = [by_shard.get(s, -1) for s in range(self.manifest["n_shards"])]
            self.manifest["shard_offsets"] = offs
        return offs


# ---------------------------------------------------------------------------
# per-shard kernels (run inside applyInPandas)
# ---------------------------------------------------------------------------


_BLOCK_KEYS = ("first_doc", "last_doc", "n", "doc_off", "tf_off", "dl_off", "max_impact")

_PostRow = namedtuple("_PostRow", ["term", "docs_bin", "tfs_bin", "dls_bin", "blocks"])
_PosRow = namedtuple(
    "_PosRow", ["term", "docs_bin", "tfs_bin", "dls_bin", "blocks", "pos_bin", "pos_offs"]
)


def _lev_within(a: str, b: str, d: int) -> bool:
    """Bounded classic Levenshtein: True iff dist(a, b) <= d. Unit costs,
    no transpositions — must agree exactly with Spark's F.levenshtein and
    DuckDB's levenshtein() (both classic). Early-exits a row whose minimum
    already exceeds d."""
    if abs(len(a) - len(b)) > d:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        row_min = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if cur[j] < row_min:
                row_min = cur[j]
        if row_min > d:
            return False
        prev = cur
    return prev[-1] <= d


def _norm_blocks(blocks) -> list[tuple]:
    """Arrow list<struct> arrives as dicts in pandas; the codec indexes
    positionally — normalize once per list."""
    return [
        tuple(blk[k] for k in _BLOCK_KEYS) if isinstance(blk, dict) else tuple(blk)
        for blk in blocks
    ]


def _live_mask(d: np.ndarray, dels: np.ndarray | None) -> np.ndarray | None:
    """Boolean keep-mask of d (sorted doc ids) against the shard's sorted
    tombstone array — None when nothing is deleted (the common case pays
    one branch, no allocation). searchsorted, not np.isin: both sides are
    sorted, O((|d|+|dels|) log) with no hashing."""
    if dels is None or dels.size == 0:
        return None
    idx = np.searchsorted(dels, d)
    np.minimum(idx, dels.size - 1, out=idx)
    return dels[idx] != d


class _Cursor:
    """Lazy block-decoding cursor over one term's posting list.

    dels (the shard's sorted tombstone array) is applied per decoded
    block; a fully-deleted block is skipped transparently. Block skip
    metadata (last_doc, max_impact) still bounds the masked list, so the
    WAND pruning that consults it stays exact."""

    __slots__ = ("docs_bin", "tfs_bin", "dls_bin", "blocks", "idf",
                 "blk", "pos", "d", "t", "l", "ub", "dels")

    def __init__(self, row, idf: float, dels: np.ndarray | None = None):
        self.docs_bin = row.docs_bin
        self.tfs_bin = row.tfs_bin
        self.dls_bin = row.dls_bin
        self.blocks = _norm_blocks(row.blocks)
        self.idf = idf
        self.ub = idf * max(blk[6] for blk in self.blocks)  # list-level UB
        self.dels = dels
        self.blk = -1
        self.d = self.t = self.l = None
        self.pos = 0
        self._load(0)

    def _load(self, i: int) -> None:
        while i < len(self.blocks):
            self.d, self.t, self.l = P.decode_block(
                self.docs_bin, self.tfs_bin, self.dls_bin, self.blocks, i
            )
            keep = _live_mask(self.d, self.dels)
            if keep is not None:
                self.d, self.t, self.l = self.d[keep], self.t[keep], self.l[keep]
            if self.d.size:
                self.blk = i
                self.pos = 0
                return
            i += 1  # every live posting in this block was deleted
        self.blk = len(self.blocks)
        self.pos = 0

    def exhausted(self) -> bool:
        return self.blk >= len(self.blocks)

    def cur_doc(self) -> int:
        return int(self.d[self.pos])

    def advance_to(self, target: int) -> None:
        """Position at the first doc >= target (block skip + searchsorted)."""
        if self.exhausted():
            return
        if target <= self.cur_doc():
            return
        # skip whole blocks by last_doc metadata — no decode
        i = self.blk
        while i < len(self.blocks) and self.blocks[i][1] < target:
            i += 1
        if i >= len(self.blocks):
            self.blk = len(self.blocks)
            return
        if i != self.blk:
            self._load(i)
            if self.exhausted():
                return
        self.pos = int(np.searchsorted(self.d, target, side="left"))
        if self.pos >= self.d.size:
            # the block's tail at/after target was entirely tombstoned —
            # the next live posting lives in a later block
            self._load(self.blk + 1)

    def block_ub_at(self, target: int) -> tuple[float, int]:
        """(idf * max_impact, last_doc) of the block that would contain the
        first posting >= target — metadata only, no decode. (0, +inf) when
        the list has nothing at or after target."""
        i = self.blk
        while i < len(self.blocks) and self.blocks[i][1] < target:
            i += 1
        if i >= len(self.blocks):
            return 0.0, np.iinfo(np.int64).max
        return self.idf * self.blocks[i][6], self.blocks[i][1]

    def next_doc(self) -> None:
        self.pos += 1
        if self.pos >= len(self.d):
            self._load(self.blk + 1)  # skips fully-tombstoned blocks / exhausts

    def score_cur(self, k1: float, b: float, avgdl: float) -> float:
        tf = float(self.t[self.pos])
        dl = float(self.l[self.pos])
        return self.idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _wand_shard_topk(
    rows, idfs: dict[str, float], k: int, k1: float, b: float, avgdl: float,
    dels: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Block-Max WAND over one shard. Returns [(local_id, score)] top-k.

    Heap keys are (score, -local_id) so the weakest entry is the lowest
    score with the HIGHEST doc id — exact tiebreak doc_id asc. Pruning is
    strict (skip only when upper bound < theta) so score==theta candidates
    still get evaluated and can win ties.
    """
    cursors = [c for c in (_Cursor(r, idfs[r.term], dels) for r in rows
                           if idfs.get(r.term)) if not c.exhausted()]
    heap: list[tuple[float, int]] = []  # (score, -local)

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        cursors = [c for c in cursors if not c.exhausted()]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur_doc())
        # pivot: first prefix whose summed list UBs reach theta
        th = theta()
        acc, pivot = 0.0, -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc >= th:
                pivot = i
                break
        if pivot < 0:
            break  # even all lists together can't reach theta
        pivot_doc = cursors[pivot].cur_doc()
        # lists beyond the pivot sitting on the SAME doc contribute to it —
        # fold them into the prefix so the aligned bound counts them
        while pivot + 1 < len(cursors) and cursors[pivot + 1].cur_doc() == pivot_doc:
            pivot += 1
        # block-max refinement ALIGNED at the pivot doc (Ding & Suel):
        # for each prefix list, the max impact of the block that would
        # contain pivot_doc — metadata only, no decode.
        aligned = [c.block_ub_at(pivot_doc) for c in cursors[: pivot + 1]]
        block_acc = sum(ub for ub, _ in aligned)
        if block_acc < th:
            # no doc in [pivot_doc, d') can beat theta, where d' is bounded
            # by the soonest aligned-block boundary AND by the next list's
            # current doc (lists beyond the pivot weren't counted).
            boundary = min(last for _, last in aligned) + 1
            if pivot + 1 < len(cursors):
                boundary = min(boundary, cursors[pivot + 1].cur_doc())
            boundary = max(boundary, pivot_doc + 1)
            for c in cursors[: pivot + 1]:
                if c.cur_doc() < boundary:
                    c.advance_to(boundary)
            continue
        if cursors[0].cur_doc() == pivot_doc:
            # all lists before the pivot sit on pivot_doc -> fully score it
            s = 0.0
            for c in cursors:
                if not c.exhausted() and c.cur_doc() == pivot_doc:
                    s += c.score_cur(k1, b, avgdl)
            cand = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, cand)
            elif cand > heap[0]:
                heapq.heapreplace(heap, cand)
            for c in cursors:
                if not c.exhausted() and c.cur_doc() == pivot_doc:
                    c.next_doc()
        else:
            # advance the leading lists up to the pivot doc
            for c in cursors[:pivot]:
                if c.cur_doc() < pivot_doc:
                    c.advance_to(pivot_doc)
    return [(-nl, s) for s, nl in heap]


def _bmw_shard_topk(
    rows, idfs: dict[str, float], k: int, k1: float, b: float, avgdl: float,
    dels: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Vectorized Block-Max pruning ("wand" algo): the scale kernel.

    The doc-id axis is cut at every posting-block boundary into disjoint
    intervals; within an interval each term contributes at most one block,
    so the interval's upper bound is a plain sum of block max_impacts.
    Intervals are processed in DESCENDING upper-bound order (fast theta
    ramp, MaxScore-style); an interval with ub < theta is skipped without
    decoding, and a surviving interval is scored with the same vectorized
    unique/bincount accumulation as TAAT — zero per-posting Python, unlike
    the classic cursor loop (kept as algo="wand_daat" for cross-checking).
    Exact: intervals partition doc space, so every doc is fully scored in
    exactly one interval; skipping is strict (ub < theta), preserving
    score==theta candidates for the doc-id tiebreak."""
    terms = []
    for r in rows:
        idf = idfs.get(r.term)
        if not idf:
            continue
        blocks = _norm_blocks(r.blocks)
        terms.append(
            {
                "row": r,
                "blocks": blocks,
                "firsts": np.array([bl[0] for bl in blocks], dtype=np.int64),
                "lasts": np.array([bl[1] for bl in blocks], dtype=np.int64),
                "maxes": np.array([bl[6] for bl in blocks]) * idf,
                "idf": idf,
                "decoded": {},
            }
        )
    if not terms:
        return []
    bounds = np.unique(
        np.concatenate([np.concatenate([t["firsts"], t["lasts"] + 1]) for t in terms])
    )
    lo, hi = bounds[:-1], bounds[1:]  # hi exclusive
    n_iv = lo.size
    ub = np.zeros(n_iv)
    active = []  # per term: (block_idx[n_iv], overlaps[n_iv])
    for t in terms:
        j = np.searchsorted(t["lasts"], lo, side="left")
        jj = np.minimum(j, t["firsts"].size - 1)
        # boundaries guarantee: block j overlaps interval i iff it covers it
        ov = (j < t["firsts"].size) & (t["firsts"][jj] <= lo)
        ub += np.where(ov, t["maxes"][jj], 0.0)
        active.append((jj, ov))

    heap: list[tuple[float, int]] = []  # (score, -doc)

    def _decode(t: dict, j: int):
        got = t["decoded"].get(j)
        if got is None:
            r = t["row"]
            d, tf, dl = P.decode_block(r.docs_bin, r.tfs_bin, r.dls_bin, t["blocks"], j)
            keep = _live_mask(d, dels)
            if keep is not None:
                d, tf, dl = d[keep], tf[keep], dl[keep]
            got = (d, t["idf"] * P.bm25_impact(tf, dl, avgdl, k1, b))
            t["decoded"][j] = got
        return got

    for i in np.argsort(-ub, kind="stable"):
        if len(heap) >= k and (not heap or ub[i] < heap[0][0]):
            continue  # strict skip: score==theta docs still get evaluated (k=0: skip all)
        locs_parts, contrib_parts = [], []
        for t, (jj, ov) in zip(terms, active):
            if not ov[i]:
                continue
            d, imp = _decode(t, int(jj[i]))
            a = int(np.searchsorted(d, lo[i], side="left"))
            z = int(np.searchsorted(d, hi[i], side="left"))
            if a < z:
                locs_parts.append(d[a:z])
                contrib_parts.append(imp[a:z])
        if not locs_parts:
            continue
        locs = np.concatenate(locs_parts)
        contribs = np.concatenate(contrib_parts)
        uniq, inv = np.unique(locs, return_inverse=True)
        scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
        # intervals partition doc space, so only the interval's own top-k
        # (same (score desc, doc asc) total order as the heap) can reach the
        # global top-k — vectorized argpartition prune, then <= k heap ops
        # per surviving interval instead of one per candidate doc. This was
        # the last per-posting-row Python on the query hot path.
        order = _topk_order(uniq, scores, min(k, uniq.size))
        for i in order.tolist():
            cand = (float(scores[i]), -int(uniq[i]))
            if len(heap) < k:
                heapq.heappush(heap, cand)
            elif cand > heap[0]:
                heapq.heapreplace(heap, cand)
            else:
                break  # order is descending: the rest can't beat theta
    return [(-nl, s) for s, nl in heap]


def _taat_shard_topk(
    rows, idfs: dict[str, float], k: int, k1: float, b: float, avgdl: float, mode: str,
    field_opts: str = "default", dels: np.ndarray | None = None,
    local_filter=None, local_boost=None, local_rescore=None,
) -> list[tuple[int, float]]:
    """Vectorized term-at-a-time accumulation over one shard.

    field_opts implements the reference's per-field index options
    (search_scheme.json, SURVEY 2.6 M1/M2) as scoring variants:
    - "nonorms" (norms: false): length normalization off -> b = 0
    - "doconly" (index_options: docs): postings carry membership only ->
      tf scored as 1
    local_filter: optional (sorted local_ids) -> keep-mask callback (ES
    filter context, engine/docvalues.py) applied to the candidate docs
    AFTER score accumulation and BEFORE top-k selection — scores of
    surviving docs are unchanged (idf/avgdl stay corpus-global, like ES).
    """
    locals_parts, contrib_parts = [], []
    n_terms = 0
    b_eff = 0.0 if field_opts == "nonorms" else b
    for r in rows:
        idf = idfs.get(r.term)
        if not idf:
            continue
        n_terms += 1
        d, t, l = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks))
        keep = _live_mask(d, dels)
        if keep is not None:
            d, t, l = d[keep], t[keep], l[keep]
        if field_opts == "doconly":
            t = np.ones_like(t)
        contrib = idf * P.bm25_impact(t, l, avgdl, k1, b_eff)
        locals_parts.append(d)
        contrib_parts.append(contrib)
    if not locals_parts:
        return []
    locs = np.concatenate(locals_parts)
    contribs = np.concatenate(contrib_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
    if mode == "and":
        hits = np.bincount(inv, minlength=uniq.size)
        keep = hits == n_terms
        uniq, scores = uniq[keep], scores[keep]
    if local_filter is not None and uniq.size:
        keep = local_filter(uniq)
        uniq, scores = uniq[keep], scores[keep]
    if local_boost is not None and uniq.size:
        # function_score: additive per-doc boost from docvalues, applied
        # after accumulation and BEFORE the top-k cut (exact — not an ES
        # rescore window; every matched doc competes with its final score)
        scores = scores + local_boost(uniq)
    if local_rescore is not None and uniq.size:
        # script_score: the compiled script REPLACES the accumulated
        # score (engine/scripts.py) — again before the cut, so the top-k
        # selection runs on final scores
        scores = local_rescore(uniq, scores)
    if uniq.size == 0:
        return []
    kk = min(k, uniq.size)
    order = _topk_order(uniq, scores, kk)
    return [(int(uniq[i]), float(scores[i])) for i in order]


def _field_contrib(
    field_opts: str, idf: float, t: np.ndarray, l: np.ndarray,
    avgdl: float, k1: float, b: float,
) -> np.ndarray:
    """Per-posting score contribution under one per-field index-option
    variant (SURVEY 2.6 M1/M2): nonorms -> b=0; doconly -> tf scored 1."""
    if field_opts == "nonorms":
        return idf * P.bm25_impact(t, l, avgdl, k1, 0.0)
    if field_opts == "doconly":
        return idf * P.bm25_impact(np.ones_like(t), l, avgdl, k1, b)
    return idf * P.bm25_impact(t, l, avgdl, k1, b)


def _dismax_shard_topk(
    rows, idfs: dict[str, float], k: int, k1: float, b: float, avgdl: float,
    fields: tuple[str, ...], tie_breaker: float,
    dels: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """dis_max multi-field top-k over one shard (ES dis_max semantics:
    score = max over fields + tie_breaker * sum of the other fields).

    The reference mapping indexes corporate_name nine ways
    (config/search_scheme.json:140-180); a real search service queries
    several subfields at once with best-fields blending. Here every field
    variant shares the SAME postings (same analyzer chain feeding tf/dl),
    so one decode pass yields per-field contribution arrays and the
    combination is pure numpy — per-field top-k lists would be WRONG
    (a doc outside every field's top-k can still win on the blended
    score when tie_breaker > 0), so blending happens on full per-doc
    field scores before any truncation."""
    locs_parts: list[np.ndarray] = []
    contrib_parts: dict[str, list[np.ndarray]] = {f: [] for f in fields}
    for r in rows:
        idf = idfs.get(r.term)
        if not idf:
            continue
        d, t, l = P.decode_term_postings(
            r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
        )
        keep = _live_mask(d, dels)
        if keep is not None:
            d, t, l = d[keep], t[keep], l[keep]
        locs_parts.append(d)
        for f in fields:
            contrib_parts[f].append(_field_contrib(f, idf, t, l, avgdl, k1, b))
    if not locs_parts:
        return []
    locs = np.concatenate(locs_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    per_field = np.stack(
        [
            np.bincount(inv, weights=np.concatenate(contrib_parts[f]), minlength=uniq.size)
            for f in fields
        ]
    )
    mx = per_field.max(axis=0)
    score = mx + tie_breaker * (per_field.sum(axis=0) - mx)
    order = _topk_order(uniq, score, min(k, uniq.size))
    return [(int(uniq[i]), float(score[i])) for i in order]


def _mf_shard_topk(
    rows_by_field: dict[str, list],
    idfs_by_field: dict[str, dict[str, float]],
    blended_idfs: dict[str, float],
    avgdl_by_field: dict[str, float],
    boosts: dict[str, float],
    mtype: str,
    tie_breaker: float,
    k: int,
    k1: float,
    b: float,
    dels: np.ndarray | None = None,
    dl_lookup: tuple[np.ndarray, dict[str, np.ndarray]] | None = None,
    local_filter=None,
    n_required: int = 0,
) -> list[tuple[int, float]]:
    """True multi-field top-k over one shard — fields with their OWN
    postings/df/avgdl (ES multi_match over e.g. title+body), unlike
    _dismax_shard_topk whose "fields" are scoring variants of one posting
    set.

    best_fields: per-field full match scores, blended max + tie_breaker *
    rest (ES wraps per-field match queries in dis_max). most_fields: sum
    of per-field scores. cross_fields: term-centric — per term, the
    per-field impacts compete (max across fields, boosts applied before
    the max) under ONE blended idf whose df is the max across fields
    (Lucene BlendedTermQuery's df blending); per-doc score = sum over
    terms. combined_fields: Lucene CombinedFieldQuery — the fields score
    as ONE synthetic field: per (doc, term) tf = sum of boost-weighted
    per-field tfs, per-doc length = sum of boost-weighted per-field
    lengths (ES requires boosts >= 1), avgdl = sum of boost-weighted
    per-field avgdls, idf = the same max-df blend as cross_fields; score
    = sum over terms of idf * impact(tf_c, dl_c, avgdl_c). The combined
    per-doc length needs every queried field's length for every candidate
    (Lucene reads each field's norms), so combined_fields takes
    dl_lookup = (sorted local_id array, {field: aligned dl array}) for
    the shard — the docmap's dl__<field> columns, this engine's norms.
    Blending happens on full per-doc arrays before any truncation
    (a doc outside every field's top-k can still win the blend).

    n_required > 0 = ES operator=and with that many analyzed query
    terms. Field-centric types (best_fields/most_fields: each field is
    its own match query) keep a field's score only when the doc contains
    ALL query terms IN that field, and drop docs no field fully matched;
    term-centric types (cross_fields/combined_fields) require each term
    in AT LEAST ONE field (Lucene's blended-term conjunction)."""
    combined = mtype == "combined_fields"
    decoded: list[tuple[str, str, np.ndarray, np.ndarray]] = []
    all_docs: list[np.ndarray] = []
    for f, rows in rows_by_field.items():
        avgdl_f, boost_f = avgdl_by_field[f], boosts[f]
        for r in rows:
            d, t, l = P.decode_term_postings(
                r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
            )
            keep = _live_mask(d, dels)
            if keep is not None:
                d, t, l = d[keep], t[keep], l[keep]
            if d.size == 0:
                continue
            payload = (
                t.astype(np.float64)
                if combined
                else boost_f * P.bm25_impact(t, l, avgdl_f, k1, b)
            )
            decoded.append((f, r.term, d, payload))
            all_docs.append(d)
    if not all_docs:
        return []
    uniq = np.unique(np.concatenate(all_docs))
    nu = uniq.size
    if combined:
        lids, dls_of = dl_lookup
        pos = np.searchsorted(lids, uniq)
        dl_c = np.zeros(nu)
        avgdl_c = 0.0
        for f, boost_f in boosts.items():
            dl_c += boost_f * dls_of[f][pos].astype(np.float64)
            avgdl_c += boost_f * avgdl_by_field[f]
        per_term: dict[str, np.ndarray] = {}
        for f, term, d, tf in decoded:
            if term not in blended_idfs:
                continue
            arr = per_term.setdefault(term, np.zeros(nu))
            np.add.at(arr, np.searchsorted(uniq, d), boosts[f] * tf)
        score = np.zeros(nu)
        for term, tfc in per_term.items():
            score += blended_idfs[term] * P.bm25_impact(tfc, dl_c, avgdl_c, k1, b)
        if n_required:
            if len(per_term) < n_required:
                return []
            cnt = np.zeros(nu, dtype=np.int64)
            for tfc in per_term.values():
                cnt += tfc > 0
            keep = cnt >= n_required
            uniq, score = uniq[keep], score[keep]
            nu = uniq.size
            if nu == 0:
                return []
    elif mtype == "cross_fields":
        score = np.zeros(nu)
        per_term: dict[str, np.ndarray] = {}
        for f, term, d, imp in decoded:
            if term not in blended_idfs:
                continue
            arr = per_term.setdefault(term, np.zeros(nu))
            np.maximum.at(arr, np.searchsorted(uniq, d), imp)
        for term, arr in per_term.items():
            score += blended_idfs[term] * arr
        if n_required:
            # and: every query term in AT LEAST ONE field (blended-term
            # conjunction) — a term with zero per-doc impact everywhere
            # in this shard simply never satisfies it
            if len(per_term) < n_required:
                return []
            cnt = np.zeros(nu, dtype=np.int64)
            for arr in per_term.values():
                cnt += arr > 0
            keep = cnt >= n_required
            uniq, score = uniq[keep], score[keep]
            nu = uniq.size
            if nu == 0:
                return []
    else:
        per_field: dict[str, np.ndarray] = {}
        hits_field: dict[str, np.ndarray] = {}
        for f, term, d, imp in decoded:
            idf = idfs_by_field[f].get(term)
            if not idf:
                continue
            sf = per_field.setdefault(f, np.zeros(nu))
            sf += np.bincount(
                np.searchsorted(uniq, d), weights=idf * imp, minlength=nu
            )
            if n_required:
                hf = hits_field.setdefault(f, np.zeros(nu, dtype=np.int64))
                hf[np.searchsorted(uniq, d)] += 1  # one row per (f,term)
        if not per_field:
            return []
        if n_required:
            # and, field-centric: each field is its own operator=and
            # match — its score survives only where the doc holds ALL
            # query terms in THAT field; docs no field fully matched drop
            any_full = np.zeros(nu, dtype=bool)
            for f, sf in per_field.items():
                full = hits_field.get(f)
                full = (
                    np.zeros(nu, dtype=bool)
                    if full is None
                    else full >= n_required
                )
                sf *= full
                any_full |= full
            if not any_full.any():
                return []
        mat = np.stack(list(per_field.values()))
        tot = mat.sum(axis=0)
        if mtype == "most_fields":
            score = tot
        else:  # best_fields
            mx = mat.max(axis=0)
            score = mx + tie_breaker * (tot - mx)
        if n_required:
            uniq, score = uniq[any_full], score[any_full]
            nu = uniq.size
            if nu == 0:
                return []
    if local_filter is not None:
        # ES filter context: restricts the matched set, never the scores —
        # the docvalue mask applies AFTER accumulation (the per-term
        # searchsorted positions above index into the UNFILTERED uniq)
        keep = local_filter(uniq)
        uniq, score = uniq[keep], score[keep]
        nu = uniq.size
        if nu == 0:
            return []
    order = _topk_order(uniq, score, min(k, nu))
    return [(int(uniq[i]), float(score[i])) for i in order]


def _bool_shard_topk(
    rows,
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    must: frozenset[str],
    must_not: frozenset[str],
    msm: int,
    field_opts: str = "default",
    dels: np.ndarray | None = None,
    local_filter=None,
) -> list[tuple[int, float]]:
    """ES bool query over one shard: score = sum of matching must+should
    clause scores; docs must match EVERY must term, at least `msm` should
    terms, and NO must_not term (must_not is a pure filter — it never
    contributes to the score, per ES bool semantics).

    Vectorized like TAAT: one decode per term, np.unique/bincount
    accumulation, then three boolean masks (must-hit count, should-hit
    count, exclusion) before the top-k order. must/should doc arrays are
    subsets of the scored doc set, so searchsorted against the sorted
    uniq array lands exactly — no hash joins, no per-doc Python."""
    locs_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    must_doc_parts: list[np.ndarray] = []
    should_doc_parts: list[np.ndarray] = []
    excl_parts: list[np.ndarray] = []
    must_seen: set[str] = set()
    for r in rows:
        blocks = _norm_blocks(r.blocks)
        if r.term in must_not:
            d, _, _ = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, blocks)
            excl_parts.append(d)
            continue
        idf = idfs.get(r.term)
        if not idf:
            continue
        d, t, l = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, blocks)
        keep = _live_mask(d, dels)
        if keep is not None:
            d, t, l = d[keep], t[keep], l[keep]
        locs_parts.append(d)
        contrib_parts.append(_field_contrib(field_opts, idf, t, l, avgdl, k1, b))
        if r.term in must:
            must_seen.add(r.term)
            must_doc_parts.append(d)
        else:
            should_doc_parts.append(d)
    if len(must_seen) < len(must):
        # a required term has no postings in this shard -> no shard doc
        # can satisfy the conjunction (docs live in exactly one shard)
        return []
    if not locs_parts:
        return []
    locs = np.concatenate(locs_parts)
    contribs = np.concatenate(contrib_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
    keep = np.ones(uniq.size, dtype=bool)
    if must:
        hits = np.zeros(uniq.size, dtype=np.int64)
        for d in must_doc_parts:
            hits[np.searchsorted(uniq, d)] += 1
        keep &= hits == len(must)
    if msm > 0:
        s_hits = np.zeros(uniq.size, dtype=np.int64)
        for d in should_doc_parts:
            s_hits[np.searchsorted(uniq, d)] += 1
        keep &= s_hits >= msm
    if excl_parts:
        keep &= ~np.isin(uniq, np.concatenate(excl_parts))
    uniq, scores = uniq[keep], scores[keep]
    if uniq.size == 0:
        return []
    if local_filter is not None:
        # ES filter context: docvalue mask over the surviving candidates
        # only (uniq stays sorted after boolean slicing), applied after
        # clause accumulation so scores are untouched
        fkeep = local_filter(uniq)
        uniq, scores = uniq[fkeep], scores[fkeep]
        if uniq.size == 0:
            return []
    order = _topk_order(uniq, scores, min(k, uniq.size))
    return [(int(uniq[i]), float(scores[i])) for i in order]


def _topk_order(uniq: np.ndarray, scores: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-kk by (score desc, doc asc): argpartition prune
    then exact lexsort of the survivors — O(n + k log k), not O(n log n).
    The partition boundary is widened to include every score tied with the
    k-th so the doc-id tiebreak stays exact."""
    n = uniq.size
    if kk >= n:
        return np.lexsort((uniq, -scores))
    part = np.argpartition(-scores, kk - 1)
    thresh = scores[part[kk - 1]]
    cand = np.flatnonzero(scores >= thresh)
    order = cand[np.lexsort((uniq[cand], -scores[cand]))][:kk]
    return order


# ---------------------------------------------------------------------------
# the distributed query
# ---------------------------------------------------------------------------


def bm25_topk(
    reader: IndexReader,
    query: str | list[str],
    k: int = 10,
    mode: str = "or",
    algo: str = "wand",
    field_opts: str = "default",
    lookup: str = "auto",
    execution: str = "auto",
    filters=(),
    stats_override=None,
    boost=None,
    script=None,
) -> DataFrame:
    """Top-k (url, doc_id, score) DataFrame, ordered score desc, doc_id asc.

    mode: "or" (ranked union), "and" (conjunctive), "prefix" (dictionary
    expansion of a single prefix, then ranked union), "fuzzy" (dictionary
    expansion by bounded edit distance, ES AUTO fuzziness, then ranked
    union; expand_fuzzy for the knobs), "wildcard" (`*`/`?` pattern over
    the dictionary, not analyzed), "regexp" (anchored regex over the
    dictionary, not analyzed) — all rewrites are df-ordered and bounded.
    field_opts: "default" | "nonorms" (M1) | "doconly" (M2) scoring
    variants per the reference's per-field index options.
    lookup: how the k winner urls are fetched from the docmap — "local"
    (driver-side pyarrow filtered read, zero extra Spark jobs; the latency
    path), "spark" (pruned distributed scan; the plan-auditable path the
    batch API also uses), "auto" = local when the docmap dir is local.
    execution: where the per-shard kernels run — "spark" (scatter-gather
    applyInPandas; the 10^12-doc path), "local" (driver-side pyarrow
    postings read + in-process kernels; the Lucene-searcher-style serving
    path, ~ms instead of a job launch), "auto" = local when the index dir
    is local AND the query's total posting count (known exactly from the
    dictionary dfs) fits LOCAL_MAX_POSTINGS. All paths are rank-identical
    (same kernels, same bytes).

    filters: ES filter-context clauses (engine/docvalues.py TermFilter /
    RangeFilter / ExistsFilter over docvalues, conjunctive) restricting
    the result set without changing surviving docs' scores; routed to the
    exact TAAT kernel with a post-accumulation docvalue mask.

    bm25_topk_rows returns the same winners as plain tuples without the
    result-DataFrame round-trip — the serving-path API."""
    kind, payload = _bm25_topk_impl(
        reader, query, k, mode, algo, field_opts, lookup, execution, filters,
        stats_override, boost, script,
    )
    if kind == "df":
        return payload
    spark = reader.spark
    if not payload:
        return spark.range(0).select(
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("double").alias("score"),
        )
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def bm25_topk_rows(
    reader: IndexReader,
    query: str | list[str],
    k: int = 10,
    mode: str = "or",
    algo: str = "wand",
    field_opts: str = "default",
    filters=(),
) -> list[tuple[str, int, float]]:
    """Serving-path twin of bm25_topk: the same analysis, kernels, and
    winner selection, returned as [(url, doc_id, score)] with NO result
    DataFrame — for a query server, the ~40 ms of JVM round-trips that
    building and collecting a 10-row DataFrame costs is the latency floor,
    and this path removes it. Rank-identical to bm25_topk by construction
    (tested): both run _bm25_topk_impl."""
    kind, payload = _bm25_topk_impl(
        reader, query, k, mode, algo, field_opts, lookup="auto",
        execution="auto", filters=filters,
    )
    if kind == "rows":
        return payload
    return [(r["url"], r["doc_id"], r["score"]) for r in payload.collect()]


def _bm25_topk_impl(
    reader: IndexReader,
    query: str | list[str],
    k: int,
    mode: str,
    algo: str,
    field_opts: str,
    lookup: str,
    execution: str,
    filters=(),
    stats_override=None,
    boost=None,
    script=None,
):
    """Shared top-k engine. Returns ("rows", [(url, doc_id, score), ...])
    when the result is materialized driver-side (local kernels and/or local
    docmap lookup), or ("df", DataFrame) when the url join runs as a Spark
    plan (remote docmap / lookup="spark")."""
    spark = reader.spark
    if mode in ("wildcard", "regexp") and isinstance(query, str):
        # patterns are NOT analyzed (ES wildcard/regexp operate on raw
        # dictionary terms; the analyzer would strip the metacharacters)
        terms = [query]
    else:
        terms = analyze_query_py(query) if isinstance(query, str) else list(dict.fromkeys(query))
    if mode == "prefix":
        assert len(terms) == 1
        terms = reader.expand_prefix(terms[0])
        mode = "or"
    elif mode == "fuzzy":
        assert len(terms) == 1
        terms = reader.expand_fuzzy(terms[0])  # ES AUTO edits, 50 expansions
        mode = "or"
    elif mode == "wildcard":
        assert len(terms) == 1
        terms = reader.expand_wildcard(terms[0])
        mode = "or"
    elif mode == "regexp":
        assert len(terms) == 1
        terms = reader.expand_regexp(terms[0])
        mode = "or"
    stats = reader.term_stats(terms)
    live_terms = [t for t in terms if t in stats]
    # conjunctive semantics: a required term absent from the index means no
    # document can match (aligned with bm25_topk_batch; frozen by test)
    all_terms_live = len(live_terms) == len(terms)
    terms = live_terms

    if not terms or (mode == "and" and not all_terms_live):
        return "rows", []
    if mode == "and" and algo in ("wand", "wand_daat"):
        algo = "taat"  # conjunctive path is the vectorized intersection
    if field_opts != "default" and algo in ("wand", "wand_daat"):
        # stored block-max impacts bound DEFAULT scoring only; variant
        # scoring can exceed them (e.g. nonorms on long docs) -> exact TAAT
        algo = "taat"
    if algo in ("wand", "wand_daat") and len(terms) > 8:
        # many-term queries (prefix expansions): block pruning degenerates
        # (interval/cursor overhead); vectorized TAAT is exact and faster
        algo = "taat"
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        # filter context: block-max theta pruning would need filtered
        # upper bounds it doesn't have — exact vectorized TAAT + a
        # post-accumulation docvalue mask is the correct kernel
        shard_filter = build_shard_filter(reader, filters)
        algo = "taat"
    shard_boost = None
    if boost is not None:
        from engine.docvalues import build_shard_boost

        # function_score: boosted totals exceed the stored block-max
        # bounds, so pruning is unsound -> exact TAAT
        shard_boost = build_shard_boost(reader, boost[0], boost[1])
        algo = "taat"
    shard_script = None
    if script is not None:
        from engine.scripts import build_shard_script

        # script_score: the script REPLACES the score, so stored bounds
        # say nothing about final totals -> exact TAAT
        shard_script = build_shard_script(reader, script)
        algo = "taat"

    if stats_override is None:
        idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in terms}
        avgdl = reader.avgdl
    else:
        # federated scoring (multi_index_topk): corpus-global idf/avgdl
        # replace this index's local stats. Stored block-max impacts are
        # local-avgdl-baked, so their bounds are unsound under override —
        # exact TAAT only.
        g_idfs, g_avgdl = stats_override
        idfs = {t: float(g_idfs[t]) for t in terms}
        avgdl = float(g_avgdl)
        if algo in ("wand", "wand_daat"):
            algo = "taat"
    k1, b = reader.k1, reader.b
    n_terms = len(terms)
    tomb = reader.tombstones()  # {} on an index with no deletes

    def run_kernel(rows, dels=None, shard=None) -> list[tuple[int, float]]:
        # ONE dispatch shared by the local and Spark paths — their rank
        # identity (tested) depends on running the exact same kernel code
        if mode == "and" and len({r.term for r in rows}) < n_terms:
            return []
        if algo == "wand" and mode == "or":
            return _bmw_shard_topk(rows, idfs, k, k1, b, avgdl, dels)
        if algo == "wand_daat" and mode == "or":
            return _wand_shard_topk(rows, idfs, k, k1, b, avgdl, dels)
        lf = None
        if shard_filter is not None:
            lf = lambda u, s=shard: shard_filter(s, u)  # noqa: E731
        lb = None
        if shard_boost is not None:
            lb = lambda u, s=shard: shard_boost(s, u)  # noqa: E731
        lr = None
        if shard_script is not None:
            lr = lambda u, sc, s=shard: shard_script(s, u, sc)  # noqa: E731
        return _taat_shard_topk(
            rows, idfs, k, k1, b, avgdl, mode, field_opts, dels, lf, lb, lr
        )

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(
            list(pdf.itertuples()), tomb.get(int(pdf_key[0])), int(pdf_key[0])
        )
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    heap_rows: list[tuple[int, int, float]] | None = None
    total_postings = sum(stats[t] for t in terms)
    if execution == "local" or (
        execution == "auto" and total_postings <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(terms)
        if by_shard is not None:
            # NOTE: thread-pooling the per-shard kernels was measured 4-5x
            # SLOWER here (interleaved A/B, head-term query: 113 ms
            # sequential vs 522 ms with an 8-thread pool) — the kernel's
            # Python-side control flow serializes on the GIL and thrashes.
            # Kernel-bound queries belong on the Spark scatter-gather path
            # (execution="spark" / above LOCAL_MAX_POSTINGS), which
            # parallelizes across real worker processes.
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard), shard)
            ]

    if heap_rows is None:
        per_shard = (
            reader.postings(terms)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        # The per-shard heaps are tiny (<= k x n_shards rows) by
        # construction: collect them and pick the global top-k driver-side
        # (doc_id = shard offset + local_id, no docmap needed for
        # ranking); urls then come from a PRUNED docmap read instead of
        # broadcast-joining the heap against every docmap row (the
        # 10^12-doc scan this replaces).
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    return _finalize_topk(reader, heap_rows, k, lookup)


def _finalize_topk(
    reader: IndexReader, heap_rows: list[tuple[int, int, float]], k: int, lookup: str
):
    """Shared winner-selection tail: per-shard heap rows -> global top-k
    (doc_id = shard offset + local_id) -> urls from a PRUNED docmap read
    (local pyarrow when the dir is local, broadcast-joined Spark plan
    otherwise) — never a full docmap scan."""
    spark = reader.spark
    if not heap_rows:
        return "rows", []
    offsets = reader.shard_offsets()
    winners = sorted(
        ((s, l, offsets[s] + l, sc) for s, l, sc in heap_rows),
        key=lambda t: (-t[3], t[2]),
    )[:k]
    shards = sorted({t[0] for t in winners})
    locals_ = sorted({t[1] for t in winners})
    urls = (
        reader.docmap_lookup_local(shards, locals_) if lookup in ("auto", "local") else None
    )
    if urls is not None:
        return "rows", [(urls[(s, l)], d, sc) for s, l, d, sc in winners]
    win_df = spark.createDataFrame(
        pd.DataFrame(winners, columns=["shard", "local_id", "doc_id", "score"]),
        "shard int, local_id long, doc_id long, score double",
    )
    dm = reader.docmap_pruned(shards, locals_)
    return "df", (
        dm.select("shard", "local_id", "url")
        .join(F.broadcast(win_df), ["shard", "local_id"])
        .select("url", "doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def bm25_dismax_topk(
    reader: IndexReader,
    query: str | list[str],
    k: int = 10,
    tie_breaker: float = 0.3,
    fields: tuple[str, ...] = ("default", "nonorms", "doconly"),
    execution: str = "auto",
    lookup: str = "auto",
) -> DataFrame:
    """Multi-field dis_max top-k (url, doc_id, score) over the real index.

    Scores the analyzed query against several per-field scoring variants of
    the SAME indexed text (the reference's multi-field mapping indexes one
    value many ways, search_scheme.json:140-180; default/nonorms/doconly
    correspond to its text/nonorms/doconly subfields) and blends per ES
    dis_max: score = best field + tie_breaker * (others). One postings
    read serves every field — the variants differ only in the scoring
    formula, so no extra IO or shuffle vs a single-field query. Same
    local/Spark adaptive execution and pruned docmap lookup as bm25_topk;
    ties doc_id asc."""
    spark = reader.spark
    terms = analyze_query_py(query) if isinstance(query, str) else list(dict.fromkeys(query))
    stats = reader.term_stats(terms)
    terms = [t for t in terms if t in stats]
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    if not terms:
        return empty
    idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in terms}
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl

    tomb = reader.tombstones()

    def run_kernel(rows, dels=None) -> list[tuple[int, float]]:
        return _dismax_shard_topk(
            rows, idfs, k, k1, b, avgdl, tuple(fields), tie_breaker, dels
        )

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(list(pdf.itertuples()), tomb.get(int(pdf_key[0])))
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    heap_rows: list[tuple[int, int, float]] | None = None
    if execution == "local" or (
        execution == "auto" and sum(stats[t] for t in terms) <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(terms)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard))
            ]
    if heap_rows is None:
        per_shard = (
            reader.postings(terms)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return empty
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def parse_field_boosts(fields: list) -> list[tuple[str, float]]:
    """ES "title^2"-style field specs -> [(name, boost)]."""
    out = []
    for f in fields:
        if isinstance(f, str):
            name, _, bs = f.partition("^")
            out.append((name, float(bs) if bs else 1.0))
        else:
            out.append((str(f[0]), float(f[1])))
    return out


_MfRow = namedtuple("_MfRow", "field term docs_bin tfs_bin dls_bin blocks")
_MfPosRow = namedtuple(
    "_MfPosRow",
    "field term docs_bin tfs_bin dls_bin blocks pos_bin pos_offs",
)


class MultiFieldPostings:
    """Union postings source over several field views of ONE index
    generation, feeding search_aggs / search_sort / search_count /
    matched_urls (their `src=` hook) with field-tagged rows for a
    multi-field matcher.

    Scale shape: all fields share one docmap, so local doc ids are
    field-independent and a multi-field matched set is computable PER
    SHARD from the union of the fields' postings — the same
    zero-extra-shuffle shape as the single-field kernels. Each
    (field, live-terms) read is bucket-pruned + term-pushdown; the
    matched set never leaves its shard."""

    def __init__(
        self,
        reader: "IndexReader",
        fields: list[str],
        terms,
        require_all: bool = False,
        needs_pos: bool = False,
    ):
        """terms: one list shared by every field, or {field: [term, ...]}
        when the read list is field-specific (per-field prefix/fuzzy
        expansions — round-5 phrase_prefix/bool_prefix contexts); a
        field absent from the dict reads nothing."""
        self.reader = reader
        self.needs_pos = needs_pos
        self.pairs: list[tuple] = []  # (field, field_reader, live_terms)
        self.total_postings = 0
        for f in fields:
            tl = terms.get(f, []) if isinstance(terms, dict) else terms
            if not tl:
                continue
            r = reader.for_field(f)
            st = r.term_stats(tl)
            live = [t for t in tl if t in st]
            # require_all: a conjunctive (phrase) context — a field with
            # ANY dead slot term matches nothing and reads nothing
            if live and (not require_all or len(live) == len(tl)):
                self.pairs.append((f, r, live))
                self.total_postings += sum(st[t] for t in live)

    def local(self):
        """{shard: [row, ...]} with rows carrying .field, or None when the
        postings aren't a local directory (caller takes the Spark path)."""
        merged: dict[int, list] = {}
        for f, r, live in self.pairs:
            by = (
                r.postings_pos_local(live) if self.needs_pos
                else r.postings_local(live)
            )
            if by is None:
                return None
            for shard, rows in by.items():
                merged.setdefault(shard, []).extend(
                    _MfPosRow(
                        f, x.term, x.docs_bin, x.tfs_bin, x.dls_bin,
                        x.blocks, x.pos_bin, x.pos_offs,
                    ) if self.needs_pos
                    else _MfRow(
                        f, x.term, x.docs_bin, x.tfs_bin, x.dls_bin, x.blocks
                    )
                    for x in rows
                )
        return merged

    def df(self) -> DataFrame:
        """Union postings DataFrame with a `field` literal column (the
        rows reach the matcher as itertuples, so the tag rides along)."""
        out = None
        for f, r, live in self.pairs:
            d = r.postings(live).withColumn("field", F.lit(f))
            out = d if out is None else out.unionByName(d)
        assert out is not None, "caller gates on total_postings == 0"
        return out


def multifield_matcher(
    reader: "IndexReader",
    fields: list,
    query: str | list[str],
    mtype: str = "best_fields",
    operator: str = "or",
    minimum_should_match: int | None = None,
):
    """(src, matcher) for composing multi_match / combined_fields as a
    QUERY CONTEXT (aggs / sort / _count / matched_urls): only the matched
    SET is needed, never scores. Returns None when the matched set is
    empty everywhere by construction (no term live in any field, or an
    unsatisfiable requirement).

    Matched-set laws mirror _mf_shard_topk's n_required scoring masks:
      field-centric (best_fields / most_fields): a field matches a doc
        when it holds >= req of the ANALYZED query terms (req = all
        terms under operator=and, else minimum_should_match or 1); the
        doc matches when ANY field does.
      term-centric (cross_fields / combined_fields): a term matches a
        doc when ANY field holds it; the doc matches when >= req of the
        analyzed terms do.
    req counts the FULL analyzed term list, so a term dead in every
    field still raises the bar under operator=and (Lucene: msm above the
    satisfiable clause count is unsatisfiable, not clamped)."""
    if mtype not in ("best_fields", "most_fields", "cross_fields", "combined_fields"):
        raise ValueError(f"unknown multi_match type {mtype!r}")
    if operator not in ("or", "and"):
        raise ValueError(f"multi_match operator must be or/and, got {operator!r}")
    if operator == "and" and minimum_should_match is not None:
        raise ValueError("operator=and already requires every term; "
                         "minimum_should_match composes with operator=or only")
    names = [n for n, _ in parse_field_boosts(fields)]
    for n in names:
        if n not in reader.text_fields:
            raise ValueError(
                f"field {n!r} is not indexed (text_fields={reader.text_fields})"
            )
    terms = (
        analyze_query_py(query) if isinstance(query, str)
        else list(dict.fromkeys(query))
    )
    req = len(terms) if operator == "and" else int(minimum_should_match or 1)
    if not terms or req > len(terms):
        return None
    src = MultiFieldPostings(reader, names, terms)
    if src.total_postings == 0:
        return None
    field_centric = mtype in ("best_fields", "most_fields")

    def _at_least(arrs: list[np.ndarray], need: int) -> np.ndarray | None:
        """Docs appearing in >= `need` of the (unique-doc) arrays."""
        arrs = [a for a in arrs if a.size]
        if not arrs or len(arrs) < need:
            return None
        if need <= 1:
            return arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
        cat, cnt = np.unique(np.concatenate(arrs), return_counts=True)
        m = cat[cnt >= need]
        return m if m.size else None

    def matcher(rows: list, dels) -> np.ndarray:
        per: dict[tuple, np.ndarray] = {}
        for r in rows:
            d, _t, _l = P.decode_term_postings(
                r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
            )
            per[(r.field, r.term)] = d
        if field_centric:
            sets = [
                m for f in names
                if (m := _at_least(
                    [per[(f, t)] for t in terms if (f, t) in per], req
                )) is not None
            ]
            m = (
                None if not sets
                else sets[0] if len(sets) == 1
                else np.unique(np.concatenate(sets))
            )
        else:
            unions = [
                u for t in terms
                if (u := _at_least(
                    [per[(f, t)] for f in names if (f, t) in per], 1
                )) is not None
            ]
            m = _at_least(unions, req)
        if m is None or m.size == 0:
            return np.empty(0, dtype=np.int64)
        keep = _live_mask(m, dels)
        return m if keep is None else m[keep]

    return src, matcher


def multifield_phrase_matcher(
    reader: "IndexReader",
    fields: list,
    phrase: str | list[str],
    slop: int = 0,
    kind: str = "phrase",
    max_expansions: int = 50,
):
    """(src, matcher) for composing multi_match type=phrase (or
    phrase_prefix, round-5 lift) as a QUERY CONTEXT (aggs / sort /
    _count): ES scores these as a dis_max of per-field queries, so the
    matched set is the UNION of the fields' matching docs. Per field,
    the matched set is the exact/sloppy phrase kernel run unbounded with
    scores discarded (the single-field phrase_matcher law); a field
    missing ANY slot term matches nothing (conjunctive) and its
    postings aren't read. kind="phrase_prefix": the LAST token expands
    against each FIELD's own dictionary (df-ordered, max_expansions
    cap — the match_phrase_prefix_topk rewrite) into that field's final
    slot alternatives; a field with an empty expansion is dead. Returns
    None when every field is dead. Pair with needs_pos=True."""
    _require_positions(
        reader, f"multi_match type={kind} (agg/count context)"
    )
    from engine.textnorm import standard_tokenize_py

    names = [n for n, _ in parse_field_boosts(fields)]
    for n in names:
        if n not in reader.text_fields:
            raise ValueError(
                f"field {n!r} is not indexed (text_fields={reader.text_fields})"
            )
    terms = (
        standard_tokenize_py(phrase.lower()) if isinstance(phrase, str)
        else list(phrase)
    )
    if not terms:
        return None
    slots_of: dict[str, list] = {}
    if kind == "phrase":
        distinct = list(dict.fromkeys(terms))
        src = MultiFieldPostings(
            reader, names, distinct, require_all=True, needs_pos=True
        )
        if not src.pairs:
            return None
        for f, _r, _l in src.pairs:
            slots_of[f] = [[t] for t in terms]
    elif kind == "phrase_prefix":
        head, pre = terms[:-1], terms[-1]
        terms_by_field: dict[str, list] = {}
        for f in names:
            r = reader.for_field(f)
            st = r.term_stats(list(dict.fromkeys(head))) if head else {}
            if any(t not in st for t in head):
                continue
            exps = list(r.expand_prefix(pre, max_expansions))
            if not exps:
                continue
            terms_by_field[f] = list(dict.fromkeys(head + exps))
            slots_of[f] = [[t] for t in head] + [exps]
        if not terms_by_field:
            return None
        src = MultiFieldPostings(
            reader, names, terms_by_field, require_all=True, needs_pos=True
        )
        if not src.pairs:
            return None
    else:
        raise ValueError(f"unknown multi-field phrase context kind {kind!r}")
    # per-field kernel params (avgdl is per-field; scores are discarded
    # so only dl-norm shape differs — kept per-field for exactness)
    params = {f: (r.k1, r.b, r.avgdl) for f, r, _ in src.pairs}

    def matcher(rows: list, dels) -> np.ndarray:
        by_field: dict[str, list] = {}
        for r in rows:
            by_field.setdefault(r.field, []).append(r)
        sets = []
        for f, frows in by_field.items():
            k1, b, avgdl = params[f]
            slots = slots_of[f]
            if slop:
                top = _phrase_slop_shard_topk(
                    frows, slots, slop, 1.0, 1 << 31, k1, b, avgdl, dels
                )
            else:
                top = _phrase_shard_topk(
                    frows, slots, 1.0, 1 << 31, k1, b, avgdl, dels
                )
            if top:
                sets.append(np.array([t[0] for t in top], dtype=np.int64))
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))

    return src, matcher


def multifield_union_matcher(reader: "IndexReader", fields: list,
                             terms_by_field: dict):
    """(src, matcher) for OR-union multi-field query contexts whose
    matched set is "any listed term in any listed field" — multi_match
    type=bool_prefix (per-field analyzed head terms + the last token's
    per-field prefix expansions; ES scores it as a dis_max of per-field
    match_bool_prefix OR unions, round-5 lift). terms_by_field maps each
    field to ITS OWN read list; a field absent (or empty) reads nothing.
    Returns None when no field has a live term. needs_pos=False."""
    names = [n for n, _ in parse_field_boosts(fields)]
    for n in names:
        if n not in reader.text_fields:
            raise ValueError(
                f"field {n!r} is not indexed (text_fields={reader.text_fields})"
            )
    src = MultiFieldPostings(reader, names, terms_by_field)
    if src.total_postings == 0:
        return None

    def matcher(rows: list, dels) -> np.ndarray:
        arrs = []
        for r in rows:
            d, _t, _l = P.decode_term_postings(
                r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
            )
            if d.size:
                arrs.append(d)
        if not arrs:
            return np.empty(0, dtype=np.int64)
        m = np.unique(np.concatenate(arrs))
        keep = _live_mask(m, dels)
        return m if keep is None else m[keep]

    return src, matcher


def bm25_multifield_topk(
    reader: IndexReader,
    query: str | list[str],
    fields: list,
    k: int = 10,
    mtype: str = "best_fields",
    tie_breaker: float = 0.0,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
    operator: str = "or",
    minimum_should_match: int | None = None,
) -> DataFrame:
    """ES multi_match over a multi-field index (url, doc_id, score):
    per-field postings + per-field df/avgdl, blended per `mtype`
    (best_fields / most_fields / cross_fields / combined_fields —
    semantics in _mf_shard_topk). fields: ["title^2", "text"] boost
    syntax (combined_fields requires boosts >= 1, the ES contract).

    Scale shape matches bm25_topk: the per-field postings reads are each
    bucket-pruned + term-pushdown (a query touches |q| bucket dirs PER
    FIELD, not the index); kernels run per shard (local driver-side for
    small queries, Spark scatter-gather above LOCAL_MAX_POSTINGS); only
    k-row heaps leave the shards; urls come from a pruned docmap read.
    combined_fields additionally reads the queried fields' doc lengths
    (the docmap dl__<field> columns — this engine's norms): driver-side
    a shard-pruned columnar read, Spark-side a per-shard cogroup of the
    postings with the docmap's length columns, so norms never broadcast
    and never leave their shard. Rank identity local-vs-Spark is by
    construction (same kernel) and tested, as is equivalence of a
    two-field index's per-field views with two separately built
    single-field indexes."""
    spark = reader.spark
    if mtype not in ("best_fields", "most_fields", "cross_fields", "combined_fields"):
        raise ValueError(f"unknown multi_match type {mtype!r}")
    fb = parse_field_boosts(fields)
    if mtype == "combined_fields" and any(w < 1.0 for _, w in fb):
        raise ValueError("combined_fields requires per-field boosts >= 1")
    for name, _ in fb:
        if name not in reader.text_fields:
            raise ValueError(
                f"field {name!r} is not indexed (text_fields={reader.text_fields})"
            )
    if operator not in ("or", "and"):
        raise ValueError(f"multi_match operator must be or/and, got {operator!r}")
    if operator == "and" and minimum_should_match is not None:
        raise ValueError("operator=and already requires every term; "
                         "minimum_should_match composes with operator=or only")
    terms = analyze_query_py(query) if isinstance(query, str) else list(dict.fromkeys(query))
    # operator=and requires every ANALYZED term; minimum_should_match=N
    # requires at least N — both ride the same kernel masks (semantics
    # per _mf_shard_topk's n_required docstring: field-centric for
    # best/most_fields, term-centric for cross/combined_fields; the
    # masks compare >=, so any threshold works)
    n_required = (
        len(terms) if operator == "and" else int(minimum_should_match or 0)
    )
    if n_required > len(terms):
        # Lucene: msm above the clause count is unsatisfiable, not clamped
        return _empty_topk(reader.spark)
    readers = {name: reader.for_field(name) for name, _ in fb}
    stats = {name: readers[name].term_stats(terms) for name, _ in fb}
    live = [t for t in terms if any(t in stats[name] for name, _ in fb)]
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    if not live or (n_required and len(live) < n_required):
        return empty
    n_docs = reader.n_docs
    idfs_by_field = {
        name: {t: float(P.bm25_idf(df, n_docs)) for t, df in stats[name].items()}
        for name, _ in fb
    }
    blended_idfs = {
        t: float(
            P.bm25_idf(max(stats[name].get(t, 0) for name, _ in fb), n_docs)
        )
        for t in live
    }
    avgdl_by_field = {name: readers[name].avgdl for name, _ in fb}
    boosts = dict(fb)
    k1, b = reader.k1, reader.b
    tomb = reader.tombstones()
    combined = mtype == "combined_fields"
    field_names = [name for name, _ in fb]
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        # filter context composes exactly like bm25_topk's: a
        # candidates-only docvalue mask per shard, applied after blend
        # accumulation (scores of survivors are unchanged, per ES)
        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(
        rows_by_field, dels=None, dl_lookup=None, shard=None
    ) -> list[tuple[int, float]]:
        lf = None
        if shard_filter is not None:
            lf = lambda u, s=shard: shard_filter(s, u)  # noqa: E731
        return _mf_shard_topk(
            rows_by_field, idfs_by_field, blended_idfs, avgdl_by_field,
            boosts, mtype, tie_breaker, k, k1, b, dels, dl_lookup, lf,
            n_required,
        )

    heap_rows: list[tuple[int, int, float]] | None = None
    total_postings = sum(sum(stats[name].values()) for name, _ in fb)
    if execution == "local" or (
        execution == "auto" and total_postings <= reader.LOCAL_MAX_POSTINGS
    ):
        per_field_shards = {
            name: readers[name].postings_local(live) for name, _ in fb
        }
        if all(v is not None for v in per_field_shards.values()):
            shards = sorted(
                {s for v in per_field_shards.values() for s in v}
            )
            doclens = (
                reader.shard_doclens(field_names, shards)
                if combined and shards
                else {}
            )
            heap_rows = [
                (shard, local, score)
                for shard in shards
                for local, score in run_kernel(
                    {
                        name: per_field_shards[name].get(shard, [])
                        for name, _ in fb
                    },
                    tomb.get(shard),
                    doclens.get(shard),
                    shard,
                )
            ]
    if heap_rows is None:
        cols = ["shard", "term", "docs_bin", "tfs_bin", "dls_bin", "blocks"]
        parts = [
            readers[name].postings(live).select(*cols, F.lit(name).alias("field"))
            for name, _ in fb
        ]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)

        def _rows_by_field(pdf: pd.DataFrame) -> dict[str, list]:
            rows_by_field: dict[str, list] = {}
            for r in pdf.itertuples():
                rows_by_field.setdefault(r.field, []).append(r)
            return rows_by_field

        def _emit(shard: int, top: list) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "shard": np.full(len(top), shard, dtype=np.int32),
                    "local_id": np.array([t[0] for t in top], dtype=np.int64),
                    "score": np.array([t[1] for t in top], dtype=np.float64),
                }
            )

        if combined:
            # norms stay shard-local: cogroup the postings with the
            # docmap's (local_id, dl__<f>) columns per shard — no
            # broadcast of per-doc lengths, no extra shuffle (both sides
            # hash on shard)
            dl_col = {
                name: (f"dl__{name}" if reader.multi_field else "dl")
                for name in field_names
            }
            dmap = reader.docmap().select(
                "shard", "local_id", *sorted(set(dl_col.values()))
            )

            def shard_topk_cg(
                key: tuple, pdf: pd.DataFrame, dm: pd.DataFrame
            ) -> pd.DataFrame:
                if pdf.empty or dm.empty:
                    return _emit(int(key[0]), [])
                order = np.argsort(dm["local_id"].to_numpy(), kind="stable")
                lids = dm["local_id"].to_numpy()[order]
                dls_of = {
                    f: dm[dl_col[f]].to_numpy()[order] for f in field_names
                }
                top = run_kernel(
                    _rows_by_field(pdf), tomb.get(int(key[0])), (lids, dls_of),
                    int(key[0]),
                )
                return _emit(int(key[0]), top)

            per_shard = (
                union.groupBy("shard")
                .cogroup(dmap.groupBy("shard"))
                .applyInPandas(
                    shard_topk_cg, "shard int, local_id long, score double"
                )
            )
        else:

            def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                top = run_kernel(
                    _rows_by_field(pdf), tomb.get(int(pdf_key[0])),
                    None, int(pdf_key[0]),
                )
                return _emit(int(pdf_key[0]), top)

            per_shard = union.groupBy("shard").applyInPandas(
                shard_topk, "shard int, local_id long, score double"
            )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return empty
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def bm25_synonym_topk(
    reader: IndexReader,
    groups: list[list[str]],
    k: int = 10,
    mode: str = "or",
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """Search-time synonym expansion with Lucene SynonymQuery scoring —
    the engine-side equivalent of ES's search-time `synonym_graph` token
    filter (the reference delegates synonyms entirely to Elasticsearch
    analyzer settings; search_scheme.json declares the analyzers).

    Each group is a set of terms treated as ONE pseudo-term, scored with
    Lucene's blended statistics (SynonymQuery): per doc, tf = SUM of the
    member tfs; df = MAX of the member dfs (so a rare alias never inflates
    the idf of its common synonym). Groups then combine exactly like plain
    terms in a match query: OR sums group scores; AND requires every group
    to match (a group with no live member under AND -> empty, the frozen
    conjunctive semantics shared with bm25_topk/bool). A single-term group
    degenerates to plain BM25 scoring by construction (tested identity).

    Plan shape: one bucket-pruned postings read covers the union of all
    member terms; per shard a vectorized kernel concatenates each group's
    decoded postings, group-sums tf per doc (np.unique + bincount), and
    applies idf(max df) * impact(tf_sum, dl) — no joins, no extra shuffle
    vs a plain match of the same number of terms. Same adaptive
    local/Spark execution + pruned docmap lookup as bm25_topk."""
    spark = reader.spark
    groups = [list(dict.fromkeys(g)) for g in groups if g]
    all_terms = sorted({t for g in groups for t in g})
    stats = reader.term_stats(all_terms)
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    live_groups = [[t for t in g if t in stats] for g in groups]
    if mode == "and" and any(not g for g in live_groups):
        return empty
    live_groups = [g for g in live_groups if g]
    if not live_groups:
        return empty
    # blended group idf: df = max over live members (Lucene SynonymQuery)
    gidfs = [
        float(P.bm25_idf(max(stats[t] for t in g), reader.n_docs))
        for g in live_groups
    ]
    term_grp = {t: gi for gi, g in enumerate(live_groups) for t in g}
    terms = sorted(term_grp)
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    n_groups = len(live_groups)
    tomb = reader.tombstones()
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(rows, dels=None, shard=None) -> list[tuple[int, float]]:
        by_grp: dict[int, list[tuple]] = {}
        for r in rows:
            d, t, l = P.decode_term_postings(
                r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
            )
            keep = _live_mask(d, dels)
            if keep is not None:
                d, t, l = d[keep], t[keep], l[keep]
            if d.size:
                by_grp.setdefault(term_grp[r.term], []).append((d, t, l))
        if not by_grp or (mode == "and" and len(by_grp) < n_groups):
            return []
        locs_all, contribs_all = [], []
        for gi, parts in by_grp.items():
            d = np.concatenate([p[0] for p in parts])
            t = np.concatenate([p[1] for p in parts])
            l = np.concatenate([p[2] for p in parts])
            uniq, inv = np.unique(d, return_inverse=True)
            tf_sum = np.bincount(inv, weights=t, minlength=uniq.size)
            dls = np.zeros(uniq.size, dtype=np.int64)
            dls[inv] = l  # dl is a per-doc constant across members
            locs_all.append(uniq)
            contribs_all.append(gidfs[gi] * P.bm25_impact(tf_sum, dls, avgdl, k1, b))
        locs = np.concatenate(locs_all)
        contribs = np.concatenate(contribs_all)
        uniq, inv = np.unique(locs, return_inverse=True)
        scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
        if mode == "and":
            keep = np.bincount(inv, minlength=uniq.size) == len(by_grp)
            uniq, scores = uniq[keep], scores[keep]
        if uniq.size == 0:
            return []
        if shard_filter is not None:
            # ES filter context: candidates-only docvalue mask
            fkeep = shard_filter(shard, uniq)
            uniq, scores = uniq[fkeep], scores[fkeep]
            if uniq.size == 0:
                return []
        kk = min(k, uniq.size)
        order = _topk_order(uniq, scores, kk)
        return list(zip(uniq[order].tolist(), scores[order].tolist()))

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(
            list(pdf.itertuples()), tomb.get(int(pdf_key[0])), int(pdf_key[0])
        )
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    heap_rows: list[tuple[int, int, float]] | None = None
    if execution == "local" or (
        execution == "auto"
        and sum(stats[t] for t in terms) <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(terms)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard), shard)
            ]
    if heap_rows is None:
        per_shard = (
            reader.postings(terms)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return empty
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def bm25_bool_topk(
    reader: IndexReader,
    must: str | list[str] = (),
    should: str | list[str] = (),
    must_not: str | list[str] = (),
    k: int = 10,
    minimum_should_match: int | None = None,
    field_opts: str = "default",
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES-style bool query top-k (url, doc_id, score) over the real index.

    Semantics (ES bool): every `must` term is required and contributes to
    the score; `should` terms contribute when they match, with at least
    `minimum_should_match` of them required (ES default: 1 when there are
    no must clauses, else 0); `must_not` terms are a pure filter — a doc
    containing any is excluded, and they never affect the score. A must
    term absent from the index matches nothing (conjunctive semantics,
    aligned with mode="and"); an absent should/must_not term is a no-op.
    A term listed in both must and should is treated as must (scored
    once). mode="or" == bool(should=terms, msm<=1); mode="and" ==
    bool(must=terms).

    One postings read covers all three clause lists (must_not costs its
    postings IO but no scoring); the per-shard kernel is vectorized
    (np.unique/bincount + searchsorted masks, no per-doc Python) and runs
    on the same adaptive local/Spark scatter-gather as bm25_topk, with the
    same pruned docmap lookup. Ties doc_id asc."""

    def _analyze(q) -> list[str]:
        if isinstance(q, str):
            return analyze_query_py(q)
        return list(dict.fromkeys(q))

    must_terms = _analyze(must)
    should_terms = [t for t in _analyze(should) if t not in set(must_terms)]
    not_terms = [
        t for t in _analyze(must_not)
        if t not in set(must_terms) and t not in set(should_terms)
    ]
    msm = minimum_should_match
    if msm is None:
        msm = 0 if must_terms else 1
    spark = reader.spark
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    stats = reader.term_stats(must_terms + should_terms + not_terms)
    if any(t not in stats for t in must_terms):
        return empty
    should_terms = [t for t in should_terms if t in stats]
    not_terms = [t for t in not_terms if t in stats]
    scoring = must_terms + should_terms
    if not scoring or msm > len(should_terms):
        return empty
    idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in scoring}
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    must_set, not_set = frozenset(must_terms), frozenset(not_terms)
    n_must = len(must_terms)

    tomb = reader.tombstones()
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        # filter context: same candidates-only docvalue mask as bm25_topk,
        # applied inside the kernel after clause accumulation
        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(rows, dels=None, shard=None) -> list[tuple[int, float]]:
        lf = None
        if shard_filter is not None:
            lf = lambda u, s=shard: shard_filter(s, u)  # noqa: E731
        return _bool_shard_topk(
            rows, idfs, k, k1, b, avgdl, must_set, not_set, msm, field_opts,
            dels, lf,
        )

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(
            list(pdf.itertuples()), tomb.get(int(pdf_key[0])), int(pdf_key[0])
        )
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    all_terms = scoring + not_terms
    heap_rows: list[tuple[int, int, float]] | None = None
    if execution == "local" or (
        execution == "auto"
        and sum(stats[t] for t in all_terms) <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(all_terms)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard), shard)
            ]
    if heap_rows is None:
        per_shard = (
            reader.postings(all_terms)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return empty
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def _terms_set_shard_topk(
    rows,
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    required_fn,
    shard: int,
    dels: np.ndarray | None = None,
    local_filter=None,
) -> list[tuple[int, float]]:
    """ES terms_set query over one shard (Lucene CoveringQuery): a doc
    matches when it contains at least required(doc) of the query terms,
    where required(doc) comes from a numeric docvalue
    (minimum_should_match_field). Score = sum of the matching terms' BM25
    contributions (each term scores like a should clause).

    Frozen spec: required = max(1, docvalue) — a doc always needs at
    least one matching term (Lucene's scorer iterates the clause union,
    so a zero/negative field value can never admit a term-free doc); a
    NULL docvalue excludes the doc (ES missing-field semantics).

    Same vectorized shape as _bool_shard_topk: one decode per term,
    unique/bincount accumulation; the per-doc threshold is gathered for
    CANDIDATE docs only (uniq ids), never the shard's full docmap."""
    locs_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    for r in rows:
        idf = idfs.get(r.term)
        if not idf:
            continue
        blocks = _norm_blocks(r.blocks)
        d, t, l = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, blocks)
        keep = _live_mask(d, dels)
        if keep is not None:
            d, t, l = d[keep], t[keep], l[keep]
        locs_parts.append(d)
        contrib_parts.append(idf * P.bm25_impact(t, l, avgdl, k1, b))
    if not locs_parts:
        return []
    locs = np.concatenate(locs_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    scores = np.bincount(
        inv, weights=np.concatenate(contrib_parts), minlength=uniq.size
    )
    # each posting row is one distinct (term, doc) pair, so the bincount
    # of inv IS the per-doc matching-term count
    s_hits = np.bincount(inv, minlength=uniq.size)
    req = required_fn(shard, uniq)
    keep = ~np.isnan(req) & (s_hits >= np.maximum(req, 1.0))
    uniq, scores = uniq[keep], scores[keep]
    if uniq.size == 0:
        return []
    if local_filter is not None:
        # ES filter context: docvalue mask over surviving candidates only
        fkeep = local_filter(uniq)
        uniq, scores = uniq[fkeep], scores[fkeep]
        if uniq.size == 0:
            return []
    order = _topk_order(uniq, scores, min(k, uniq.size))
    return [(int(uniq[i]), float(scores[i])) for i in order]


def terms_set_topk(
    reader: IndexReader,
    terms: list[str],
    minimum_should_match_field: str,
    k: int = 10,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES terms_set query top-k (url, doc_id, score): docs containing at
    least `doc[minimum_should_match_field]` of `terms`, scored as the
    BM25 sum of their matching terms — the per-DOC msm variant of the
    bool query (Lucene CoveringQuery). Frozen semantics in
    _terms_set_shard_topk's docstring. Adaptive local/Spark execution,
    pruned docmap lookup, tombstone-masked; ties doc_id asc."""
    from engine.docvalues import gather_docvalues

    dv_cols = reader.manifest.get("docvalue_cols") or []
    if minimum_should_match_field not in dv_cols:
        raise ValueError(
            f"terms_set field {minimum_should_match_field!r} not in index "
            f"docvalues {dv_cols}; rebuild with build_index(..., "
            "docvalue_cols=[...])"
        )
    qterms = list(dict.fromkeys(terms))
    spark = reader.spark
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    stats = reader.term_stats(qterms)
    present = [t for t in qterms if t in stats]
    if not present:
        return empty
    idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in present}
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    index_dir, field = reader.dir, minimum_should_match_field
    tomb = reader.tombstones()

    def required_fn(shard: int, uniq: np.ndarray) -> np.ndarray:
        tbl = gather_docvalues(index_dir, int(shard), [field], uniq)
        return (
            tbl.column(field)
            .cast("float64")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )

    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(shard: int, rows) -> list[tuple[int, float]]:
        lf = None
        if shard_filter is not None:
            lf = lambda u, s=shard: shard_filter(s, u)  # noqa: E731
        return _terms_set_shard_topk(
            rows, idfs, k, k1, b, avgdl, required_fn, shard, tomb.get(shard),
            lf,
        )

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(int(pdf_key[0]), list(pdf.itertuples()))
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    heap_rows: list[tuple[int, int, float]] | None = None
    if execution == "local" or (
        execution == "auto"
        and sum(stats[t] for t in present) <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(present)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(shard, rows)
            ]
    if heap_rows is None:
        per_shard = (
            reader.postings(present)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return empty
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def match_bool_prefix_topk(
    reader: IndexReader,
    text: str,
    k: int = 10,
    max_expansions: int = 128,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES match_bool_prefix query top-k: analyze the text; every token
    but the last becomes a should term clause, the LAST token becomes a
    prefix clause (the search-box "user is mid-word" query). Frozen
    rewrite: the prefix clause expands df-ordered against the dictionary
    (top_terms_{max_expansions}, same bound as mode="prefix"), each
    expansion scoring as itself (scoring_boolean) — the whole query is
    then one ranked OR union over leading terms + expansions, served by
    the shared adaptive kernels. An empty expansion leaves the leading
    terms ranking alone (ES: the prefix clause simply matches nothing
    under OR semantics)."""
    toks = analyze_query_py(text)
    spark = reader.spark
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    if not toks:
        return empty
    lead, last = toks[:-1], toks[-1]
    terms = list(dict.fromkeys(lead + reader.expand_prefix(last, max_expansions)))
    if not terms:
        return empty
    return bm25_topk(
        reader, terms, k=k, mode="or", execution=execution, lookup=lookup,
        filters=filters,
    )


def _boosting_shard_topk(
    rows,
    idfs: dict[str, float],
    neg_set: frozenset[str],
    negative_boost: float,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    dels: np.ndarray | None = None,
    local_filter=None,
) -> list[tuple[int, float]]:
    """ES boosting query over one shard: positive terms score like the
    OR TAAT kernel; docs also containing ANY negative term keep their
    positive score multiplied by negative_boost (demotion, not
    exclusion — the distinction from bool must_not). Same vectorized
    shape as _bool_shard_topk: one decode per term, unique/bincount
    accumulation, one isin demote mask."""
    locs_parts, contrib_parts, neg_parts = [], [], []
    for r in rows:
        blocks = _norm_blocks(r.blocks)
        if r.term in neg_set:
            d, _, _ = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, blocks)
            neg_parts.append(d)
            continue
        idf = idfs.get(r.term)
        if not idf:
            continue
        d, t, l = P.decode_term_postings(r.docs_bin, r.tfs_bin, r.dls_bin, blocks)
        keep = _live_mask(d, dels)
        if keep is not None:
            d, t, l = d[keep], t[keep], l[keep]
        locs_parts.append(d)
        contrib_parts.append(idf * P.bm25_impact(t, l, avgdl, k1, b))
    if not locs_parts:
        return []
    locs = np.concatenate(locs_parts)
    uniq, inv = np.unique(locs, return_inverse=True)
    scores = np.bincount(
        inv, weights=np.concatenate(contrib_parts), minlength=uniq.size
    )
    if neg_parts:
        demote = np.isin(uniq, np.concatenate(neg_parts))
        scores = np.where(demote, scores * negative_boost, scores)
    if local_filter is not None:
        # ES filter context: candidates-only docvalue mask, post-demotion
        fkeep = local_filter(uniq)
        uniq, scores = uniq[fkeep], scores[fkeep]
        if uniq.size == 0:
            return []
    order = _topk_order(uniq, scores, min(k, uniq.size))
    return [(int(uniq[i]), float(scores[i])) for i in order]


def bm25_boosting_topk(
    reader: IndexReader,
    positive: str | list[str],
    negative: str | list[str],
    negative_boost: float = 0.5,
    k: int = 10,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES `boosting` query top-k: rank by the positive query's BM25 (OR
    over its analyzed terms, the frozen subset — ES allows any subquery),
    demoting docs that also match the negative query by multiplying
    their score with negative_boost in [0, 1). Unlike bool must_not the
    negative docs stay in the ranking — ES's 'relevance backoff' for
    disfavored-but-valid results. Adaptive local/Spark execution, pruned
    docmap lookup, tombstone-masked; ties doc_id asc."""
    if not (0.0 <= negative_boost < 1.0):
        raise ValueError(f"negative_boost must be in [0, 1), got {negative_boost}")

    def _analyze(q) -> list[str]:
        if isinstance(q, str):
            return analyze_query_py(q)
        return list(dict.fromkeys(q))

    pos_terms = _analyze(positive)
    neg_terms = [t for t in _analyze(negative) if t not in set(pos_terms)]
    spark = reader.spark
    stats = reader.term_stats(pos_terms + neg_terms)
    pos_terms = [t for t in pos_terms if t in stats]
    neg_terms = [t for t in neg_terms if t in stats]
    if not pos_terms:
        return _empty_topk(spark)
    idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in pos_terms}
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    neg_set = frozenset(neg_terms)
    tomb = reader.tombstones()
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(rows, dels=None, shard=None) -> list[tuple[int, float]]:
        lf = None
        if shard_filter is not None:
            lf = lambda u, s=shard: shard_filter(s, u)  # noqa: E731
        return _boosting_shard_topk(
            rows, idfs, neg_set, negative_boost, k, k1, b, avgdl, dels, lf
        )

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        top = run_kernel(
            list(pdf.itertuples()), tomb.get(int(pdf_key[0])), int(pdf_key[0])
        )
        return pd.DataFrame(
            {
                "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                "local_id": np.array([t[0] for t in top], dtype=np.int64),
                "score": np.array([t[1] for t in top], dtype=np.float64),
            }
        )

    all_terms = pos_terms + neg_terms
    heap_rows: list[tuple[int, int, float]] | None = None
    if execution == "local" or (
        execution == "auto"
        and sum(stats[t] for t in all_terms) <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_local(all_terms)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard), shard)
            ]
    if heap_rows is None:
        per_shard = (
            reader.postings(all_terms)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return _empty_topk(spark)
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def bm25_topk_batch(
    reader: IndexReader,
    queries: dict[int, list[str]],
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Evaluate MANY queries in ONE distributed pass (the reference query
    set is a batch — this is the throughput path, vs bm25_topk's latency
    path). One postings read covers the union of all query terms (bucket-
    pruned); per shard, a vectorized TAAT kernel scores every query against
    the decoded postings; per-shard top-k heaps are unioned and reduced to
    global top-k per query with a window. Returns (query_id, url, doc_id,
    score, rank). Compute scales with shards x queries; shuffle is only the
    tiny per-shard heap output."""
    spark = reader.spark
    queries = {int(q): [t for t in dict.fromkeys(ts)] for q, ts in queries.items()}
    all_terms = sorted({t for ts in queries.values() for t in ts})
    stats = reader.term_stats(all_terms)
    live_terms = [t for t in all_terms if t in stats]
    empty = spark.range(0).select(
        F.lit(None).cast("long").alias("query_id"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("int").alias("rank"),
    )
    if not live_terms:
        return empty
    idfs = {t: float(P.bm25_idf(stats[t], reader.n_docs)) for t in live_terms}
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    # batch-internal memoization (the ES request-cache analog, scoped to
    # this batch): real batches are duplicate-heavy, and two queries with
    # the same live-term multiset and the same original arity have
    # IDENTICAL results by construction — so each distinct signature
    # scores once per shard and fans its top-k out to every owning qid.
    # Distinct-query batches pay one dict insert per query and nothing
    # else; results are bit-identical to the unmemoized loop (tested).
    sig_items: dict[tuple, list[int]] = {}
    for qid, ts in queries.items():
        live = tuple(t for t in ts if t in idfs)
        sig_items.setdefault((live, len(ts)), []).append(qid)
    sitems = [
        (list(sig[0]), sig[1], qids) for sig, qids in sig_items.items()
    ]
    tomb = reader.tombstones()

    def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rows = list(pdf.itertuples())
        dels = tomb.get(int(pdf_key[0]))
        decoded: dict[str, tuple] = {}
        for r in rows:
            d, t, l = P.decode_term_postings(
                r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
            )
            keep = _live_mask(d, dels)
            if keep is not None:
                d, t, l = d[keep], t[keep], l[keep]
            decoded[r.term] = (d, idfs[r.term] * P.bm25_impact(t, l, avgdl, k1, b))
        out_q, out_l, out_s = [], [], []
        for terms, n_q, qids in sitems:
            hit = [decoded[t] for t in terms if t in decoded]
            if not hit or (mode == "and" and len(hit) != n_q):
                continue
            locs = np.concatenate([h[0] for h in hit])
            contribs = np.concatenate([h[1] for h in hit])
            uniq, inv = np.unique(locs, return_inverse=True)
            scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
            if mode == "and":
                keep = np.bincount(inv, minlength=uniq.size) == len(hit)
                uniq, scores = uniq[keep], scores[keep]
            if uniq.size == 0:
                continue
            kk = min(k, uniq.size)
            order = _topk_order(uniq, scores, kk)
            top_l, top_s = uniq[order], scores[order]
            for qid in qids:
                out_q.append(np.full(kk, qid, dtype=np.int64))
                out_l.append(top_l)
                out_s.append(top_s)
        if not out_q:
            return pd.DataFrame({"shard": [], "query_id": [], "local_id": [], "score": []}).astype(
                {"shard": "int32", "query_id": "int64", "local_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "shard": np.full(sum(len(x) for x in out_q), pdf_key[0], dtype=np.int32),
                "query_id": np.concatenate(out_q),
                "local_id": np.concatenate(out_l),
                "score": np.concatenate(out_s),
            }
        )

    per_shard = (
        reader.postings(live_terms)
        .groupBy("shard")
        .applyInPandas(shard_topk, "shard int, query_id long, local_id long, score double")
    )
    # The heap union is shards x queries x k rows — too many to collect to
    # the driver (1.9M rows at 32 shards x 6k queries), so the per-query
    # global top-k stays DISTRIBUTED: doc_id from the broadcast shard
    # offsets, then a window over query_id. The winner set (queries x k)
    # is persisted, its (shard, local_id) bounds cost one cheap aggregate
    # on the cached rows, and the docmap lookup is pruned to the winner
    # shards + local_id range — never a full per-batch docmap scan. A
    # value-list isin over 60k local_ids would itself be slower than the
    # scan (giant row-group filter expression), hence the range form.
    from pyspark.sql import Window

    offsets = reader.shard_offsets()
    off_df = spark.createDataFrame(
        pd.DataFrame({"shard": range(len(offsets)), "off": offsets}),
        "shard int, off long",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    win = (
        per_shard.join(F.broadcast(off_df), "shard")
        .withColumn("doc_id", F.col("off") + F.col("local_id"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("shard", "query_id", "local_id", "doc_id", "score", "rank")
        .collect()
    )
    if not win:
        return empty
    win_pdf = pd.DataFrame(
        [(r["shard"], r["query_id"], r["local_id"], r["doc_id"], r["score"], r["rank"]) for r in win],
        columns=["shard", "query_id", "local_id", "doc_id", "score", "rank"],
    )
    win_df = spark.createDataFrame(
        win_pdf, "shard int, query_id long, local_id long, doc_id long, score double, rank int"
    )
    dm = reader.docmap().filter(
        F.col("shard").isin(sorted(win_pdf["shard"].unique().tolist()))
        & F.col("local_id").between(
            int(win_pdf["local_id"].min()), int(win_pdf["local_id"].max())
        )
    )
    return (
        dm.select("shard", "local_id", "url")
        .join(F.broadcast(win_df), ["shard", "local_id"])
        .select("query_id", "url", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# pure-DataFrame BM25 (no index) — the relational cross-check path
# ---------------------------------------------------------------------------


def bm25_topk_dataframe(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = P.K1,
    b: float = P.B,
    field_opts: str = "default",
) -> DataFrame:
    """Brute-force BM25 as a single declarative DataFrame plan (tokenize ->
    stats -> tf -> score -> top-k). SQL-expressible, used for the DuckDB
    oracle contract; Catalyst broadcasts the 1-row stats and tiny df table
    automatically."""
    from engine.textnorm import standard_tokenize_col

    terms = list(dict.fromkeys(terms))
    toks = docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("doc_id"),
        standard_tokenize_col(F.lower(F.col(text_col))).alias("tokens"),
    )
    toks = toks.withColumn("dl", F.size("tokens"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # M1/M2 index-option variants (SURVEY 2.6): nonorms -> b=0;
    # doconly -> tf scored as 1
    b_eff = 0.0 if field_opts == "nonorms" else b
    tf_expr = F.lit(1.0) if field_opts == "doconly" else F.col("tf")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * tf_expr
            / (tf_expr + k1 * (1.0 - b_eff + b_eff * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return scored


def highlight_fragments(
    hits: "DataFrame",
    corpus: "DataFrame",
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    frag_size: int = 80,
    pad: int = 30,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> "DataFrame":
    """ES-style highlighting, simplified to a frozen column-op contract:
    for each hit row (any DataFrame carrying `id_col`, e.g. a bm25 top-k),
    the `frag_size`-char fragment of the doc's text starting `pad` chars
    before the EARLIEST case-insensitive substring occurrence of any query
    term, with every word-boundary term occurrence inside the fragment
    wrapped in pre/post tags. Hits whose text contains no term occurrence
    (possible when the match came from another field) emit no row.

    All JVM column ops (locate / substring / regexp_replace — no UDF);
    the hit set is broadcast (top-k-sized by construction), so the corpus
    side stays a pruned scan: only id + text columns are read and the
    join filter reaches the parquet scan via the broadcast hash join.
    The regex stays in the Java/RE2 common dialect ((?i), \\b, literal
    alternation) so the DuckDB oracle differs only in backreference
    spelling ($1 vs \\1)."""
    import re as _re

    lows = list(dict.fromkeys(t.lower() for t in terms))
    hay = F.lower(F.col(text_col))
    locs = [F.when(F.locate(t, hay) > 0, F.locate(t, hay)) for t in lows]
    pos = locs[0] if len(locs) == 1 else F.least(*locs)  # least() needs >= 2
    start = F.greatest(F.lit(1), pos - F.lit(pad))
    frag = F.substring(F.col(text_col), start, F.lit(frag_size))
    alt = "|".join(_re.escape(t) for t in lows)
    marked = F.regexp_replace(
        frag, f"(?i)\\b({alt})\\b", f"{pre_tag}$1{post_tag}"
    )
    keep = [c for c in hits.columns]
    return (
        corpus.select(id_col, text_col)
        .join(F.broadcast(hits), id_col)
        .withColumn("_pos", pos)
        .filter(F.col("_pos").isNotNull())
        .select(*keep, marked.alias("fragment"))
    )


def mlt_topk(
    reader: "IndexReader",
    like_text: str,
    max_query_terms: int = 5,
    k: int = 10,
    **bm25_kwargs,
):
    """ES `more_like_this` (frozen single-`like` form): analyze the like
    text, keep its `max_query_terms` most significant terms by
    tf x BM25-idf — idf = ln(1 + (n_docs - df + 0.5) / (df + 0.5)),
    descending, term-asc tiebreak — and run the standard BM25 top-k with
    them. Terms absent from the index dictionary are skipped (they carry
    no signal and ES's analyzer does the same in the coordinating node).

    Term selection is driver-side by contract: the like text is ONE
    document (ES also analyzes it on the coordinator); its df lookups are
    a pruned term_stats read, not a corpus pass. The selection uses raw
    double scores (no rounding): both engines compute the identical IEEE
    expression, so the SQL oracle reproduces the exact term set."""
    import math
    from collections import Counter

    from engine.textnorm import standard_tokenize_py

    tf = Counter(standard_tokenize_py(like_text.lower()))
    stats = reader.term_stats(list(tf))
    n = float(reader.n_docs)
    scored = [
        (t, c * math.log(1.0 + (n - stats[t] + 0.5) / (stats[t] + 0.5)))
        for t, c in tf.items()
        if t in stats
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    terms = [t for t, _ in scored[:max_query_terms]]
    if not terms:
        return reader.spark.createDataFrame([], "url string, score double")
    return bm25_topk(reader, terms, k=k, **bm25_kwargs)


def mlt_multifield_topk(
    reader: "IndexReader",
    like_text: str,
    fields: list,
    max_query_terms: int = 5,
    k: int = 10,
    filters=(),
) -> DataFrame:
    """ES `more_like_this` over SEVERAL fields (round-5 lift): candidate
    (field, term) pairs score ltf x that FIELD's BM25-idf (each field's
    own df/n_docs via its for_field view), the global top
    `max_query_terms` pairs are kept — frozen tie rule: score desc,
    field asc, term asc (Lucene's MoreLikeThis priority queue does not
    specify cross-field tie order) — and the result is the bool-should
    of the per-field term queries: per-field BM25 legs run UNBOUNDED
    and SUM per doc (blend_dismax_frames tie_breaker=1). Selection is
    driver-side by the same contract as mlt_topk (the like text is ONE
    document; df lookups are pruned term_stats reads)."""
    import math
    from collections import Counter

    from engine.textnorm import standard_tokenize_py

    ltf = Counter(standard_tokenize_py(like_text.lower()))
    cands: list[tuple[float, str, str]] = []
    views: dict[str, "IndexReader"] = {}
    for name in fields:
        if "^" in str(name):
            raise ValueError(
                "more_like_this fields do not take ^boosts (documented "
                "divergence: per-field boosting of selected terms)"
            )
        if name not in reader.text_fields:
            raise ValueError(
                f"more_like_this field {name!r} is not indexed "
                f"(text_fields={reader.text_fields})"
            )
        r = reader if name == reader.field else reader.for_field(name)
        views[name] = r
        stats = r.term_stats(list(ltf))
        n = float(r.n_docs)
        for t, c in ltf.items():
            if t in stats:
                cands.append((
                    c * math.log(1.0 + (n - stats[t] + 0.5) / (stats[t] + 0.5)),
                    name, t,
                ))
    cands.sort(key=lambda x: (-x[0], x[1], x[2]))
    by_field: dict[str, list[str]] = {}
    for _, name, t in cands[:max_query_terms]:
        by_field.setdefault(name, []).append(t)
    frames = []
    for name, terms in by_field.items():
        frames.append(
            bm25_topk(views[name], terms, k=1 << 31, filters=filters).toPandas()
        )
    return blend_dismax_frames(reader.spark, frames, 1.0, k)


def percolate(
    queries: "DataFrame",
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    mode_col: str = "mode",
) -> "DataFrame":
    """ES percolator: match DOCUMENTS against STORED QUERIES — the
    reverse of search, the alerting/routing primitive. `queries` rows are
    (query_id, terms array<string>, mode 'or'|'and'); a doc matches an
    'or' query when any stored term is in its analyzed token set, an
    'and' query when all are. Returns (query_id, doc_id, hits) with
    hits = distinct stored terms present.

    Scale shape: queries explode to (query_id, term) rows and BROADCAST
    (stored-query sets are registry-sized, tiny vs the corpus); each doc
    explodes its DISTINCT tokens once; the match is a term-keyed join +
    per-(query, doc) hit count checked against the query's term count —
    word-count shaped, no per-row Python, never an |queries| x |docs|
    cross join."""
    from engine.textnorm import standard_tokenize_col

    terms = F.array_distinct(F.col(terms_col))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.size(terms).alias("n_terms"),
        F.col(mode_col).alias("mode"),
        F.explode(terms).alias("term"),
    )
    t = F.col(text_col)
    d = docs.filter(t.isNotNull() & (t != "")).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(standard_tokenize_col(F.lower(t)))
        ).alias("term"),
    )
    hits = (
        d.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id", "n_terms", "mode")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    keep = F.when(F.col("mode") == "and", F.col("hits") == F.col("n_terms")).otherwise(
        F.col("hits") > 0
    )
    return hits.filter(keep).select("query_id", "doc_id", "hits")


def term_vectors(reader: "IndexReader", doc_text: str) -> "DataFrame":
    """ES `_termvectors` (frozen subset): per analyzed term of one
    document — term_freq within the doc and doc_freq from the index.
    Single-doc API by contract (like ES): analysis is driver-side, df is
    a pruned term_stats read, never a corpus pass. Returns (term, tf,
    df) rows; terms absent from the index dictionary report df = 0 (a
    doc not yet ingested still gets its vector)."""
    from collections import Counter

    from engine.textnorm import standard_tokenize_py

    tf = Counter(standard_tokenize_py(doc_text.lower()))
    stats = reader.term_stats(list(tf))
    rows = [(t, int(c), int(stats.get(t, 0))) for t, c in sorted(tf.items())]
    return reader.spark.createDataFrame(rows, "term string, tf long, df long")


def mterm_vectors(reader: "IndexReader", docs: "list[tuple[str, str]]") -> "DataFrame":
    """ES `_mtermvectors`: term vectors for a batch of (doc_id, text)
    pairs in ONE dictionary probe — the union of every doc's analyzed
    terms feeds a single pruned term_stats read (vs N probes for N
    single-doc calls). Returns (doc_id, term, tf, df) rows, doc order
    preserved within the sorted-term contract of term_vectors."""
    from collections import Counter

    from engine.textnorm import standard_tokenize_py

    tfs = [(did, Counter(standard_tokenize_py(text.lower()))) for did, text in docs]
    all_terms = sorted({t for _d, c in tfs for t in c})
    stats = reader.term_stats(all_terms)
    rows = [
        (did, t, int(c), int(stats.get(t, 0)))
        for did, cnt in tfs
        for t, c in sorted(cnt.items())
    ]
    return reader.spark.createDataFrame(
        rows, "doc_id string, term string, tf long, df long"
    )


EXPLAIN_SCHEMA = (
    "term string, tf long, df long, idf double, impact double, "
    "contribution double"
)


def explain_score(
    reader: "IndexReader",
    query: "str | list[str]",
    url: str,
) -> "DataFrame":
    """ES `_explain` (frozen subset): the per-term BM25 breakdown for one
    (query, document) pair, computed FROM THE INDEX — a pruned docmap
    point lookup (driver-side XXH64 shard routing, url predicate pushed
    to the parquet scan) plus the same bucket-pruned postings read the
    kernels use; never a corpus or full-index scan.

    Rows: (term, tf, df, idf, impact, contribution), floats rounded 6 on
    output; the UNROUNDED contributions sum to the kernel's score for the
    doc (asserted in tests). Query terms absent from the doc or the
    dictionary emit no row (ES: "no matching term"). Raises KeyError for
    an unknown url; a tombstoned doc returns zero rows (masked, like the
    kernels)."""
    return reader.spark.createDataFrame(
        explain_rows(reader, query, url), EXPLAIN_SCHEMA
    )


def explain_rows(
    reader: "IndexReader",
    query: "str | list[str]",
    url: str,
) -> "list[tuple]":
    """explain_score's engine core: the same per-term breakdown as plain
    tuples, no result-DataFrame round-trip — the serving-path form that
    `search(..., explain=true)` calls once per hit (local-dir postings
    make each call a pyarrow point read)."""
    import math

    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from engine.hashing import xxh64
    from engine.oracle import analyze_query_py

    terms = (
        analyze_query_py(query) if isinstance(query, str)
        else list(dict.fromkeys(query))
    )
    stats = reader.term_stats(terms)
    live = [t for t in terms if t in stats]
    shard = xxh64(url.encode()) % reader.manifest["n_shards"]
    dm = ds.dataset(
        os.path.join(reader.dir, "docmap", f"shard={shard}")
    ).to_table(columns=["local_id", "dl"], filter=pc.field("url") == url)
    if dm.num_rows == 0:
        raise KeyError(f"url {url!r} not in index {reader.dir}")
    local_id = int(dm.column("local_id")[0].as_py())
    dl = float(dm.column("dl")[0].as_py())
    tomb = reader.tombstones().get(shard)
    if tomb is not None and np.searchsorted(tomb, local_id) < tomb.size and int(
        tomb[np.searchsorted(tomb, local_id)]
    ) == local_id:
        return []
    if not live:
        return []

    by_shard = reader.postings_local(live)
    if by_shard is not None:
        rows = by_shard.get(shard, [])
    else:  # non-local postings: one tiny pruned Spark read — the shard
        # predicate is pushed into the parquet scan (PushedFilters), so a
        # head term never pulls other shards' posting rows to the driver.
        rows = reader.postings(live).filter(F.col("shard") == shard).collect()
    n, avgdl, k1, b = (
        float(reader.n_docs),
        float(reader.avgdl),
        float(reader.manifest["k1"]),
        float(reader.manifest["b"]),
    )
    out = []
    for r in rows:
        docs, tfs, _dls = P.decode_term_postings(
            r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
        )
        i = int(np.searchsorted(docs, local_id))
        if i >= docs.size or int(docs[i]) != local_id:
            continue
        tf = float(tfs[i])
        df = float(stats[r.term])
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        impact = tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out.append(
            (
                r.term,
                int(tf),
                int(df),
                round(idf, 6),
                round(impact, 6),
                round(idf * impact, 6),
            )
        )
    out.sort(key=lambda x: x[0])
    return out


def _lev_dist(a: str, b: str) -> int:
    """Classic Levenshtein (no transpositions — matches Spark's and
    DuckDB's native levenshtein)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def suggest_terms(
    reader: "IndexReader",
    term: str,
    max_edits: int = 2,
    size: int = 5,
    prefix_length: int = 0,
) -> "DataFrame":
    """ES term suggester (frozen spec): dictionary terms within classic
    Levenshtein distance `max_edits` of the lowercased input, the input
    term itself excluded, ordered (distance asc, df desc, term asc), top
    `size` — suggest_mode=always, classic distance (Spark's and DuckDB's
    native levenshtein; fuzzy_transpositions=false, same freeze as
    expand_fuzzy). Returns (suggestion, df, distance) rows.

    Serving order mirrors expand_fuzzy: whole-vocab driver cache (small
    index, no Spark job) -> distributed term_stats scan with the
    length-band predicate in codegen and thresholded levenshtein;
    prefix_length adds the range-pruned dictionary read."""
    q = term.lower()
    lo_len, hi_len = len(q) - max_edits, len(q) + max_edits
    pref = q[:prefix_length]
    schema = "suggestion string, df long, distance long"
    if reader._ts_cache is None and reader.n_docs <= reader.CACHE_MAX_DOCS:
        reader.term_stats([q])  # populates the whole-vocab cache
    if reader._ts_cache is not None:
        reader._check_generation()
        rows = [
            (t, int(d), _lev_dist(q, t))
            for t, d in reader._ts_cache.items()
            if t != q
            and lo_len <= len(t) <= hi_len
            and t.startswith(pref)
            and _lev_within(q, t, max_edits)
        ]
        rows.sort(key=lambda x: (x[2], -x[1], x[0]))
        return reader.spark.createDataFrame(rows[:size], schema)
    ts = reader._term_stats_df()
    cond = F.length("term").between(lo_len, hi_len) & (F.col("term") != q)
    if pref:
        hi = pref[:-1] + chr(ord(pref[-1]) + 1)
        cond = cond & (F.col("term") >= pref) & (F.col("term") < hi)
    return (
        ts.filter(cond)
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(q)).cast("long"))
        .filter(F.col("distance") <= max_edits)
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(size)
        .select(F.col("term").alias("suggestion"), "df", "distance")
    )


def suggest_complete(
    reader: "IndexReader", prefix: str, size: int = 10
) -> "DataFrame":
    """ES completion suggester (frozen spec): dictionary terms starting
    with the lowercased prefix, ranked weight desc then term asc, top
    `size`, returned as (suggestion, weight) with weight = the term's df
    (the engine has no per-suggestion weights field; document frequency
    is the popularity signal, same ordering ES uses when weights tie).

    Serving: local index dirs read term_stats with a [prefix, prefix+1)
    pyarrow range filter (term-sorted row groups prune — the same pruned
    read expand_prefix uses, FST-like in cost: never the whole
    dictionary); remote dirs fall back to a range-pruned Spark scan."""
    p = prefix.lower()
    schema = "suggestion string, weight long"
    if not p:
        return reader.spark.createDataFrame([], schema)
    hi = p[:-1] + chr(ord(p[-1]) + 1)
    ts_dir = os.path.join(reader.dir, reader._ts_sub)
    if os.path.isdir(ts_dir):
        import pyarrow.dataset as ds

        tbl = reader._pa_dataset(reader._ts_sub).to_table(
            filter=(ds.field("term") >= p) & (ds.field("term") < hi),
            columns=["term", "df"],
        )
        pairs = [
            (t, int(d))
            for t, d in zip(
                tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
            )
            if t.startswith(p)
        ]
        pairs.sort(key=lambda x: (-x[1], x[0]))
        return reader.spark.createDataFrame(pairs[:size], schema)
    return (
        reader._term_stats_df()
        .filter((F.col("term") >= p) & (F.col("term") < hi))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(size)
        .select(F.col("term").alias("suggestion"), F.col("df").alias("weight"))
    )


def suggest_phrase(
    reader: "IndexReader",
    text: str,
    size: int = 5,
    max_edits: int = 2,
    per_slot: int = 5,
) -> "DataFrame":
    """ES phrase suggester ("did you mean"), frozen spec:

    - slots = the analyzed input (order + duplicates kept);
    - per-slot corrections = the term suggester's top `per_slot`
      (distance asc, df desc, term asc within `max_edits`, input term
      excluded) — suggest_terms IS the candidate generator, so both of
      its serving paths (cached vocab / distributed term_stats scan)
      back this too;
    - max_errors = 1 (the ES default): each candidate phrase replaces
      exactly ONE slot with one of its corrections;
    - score = the Laplace-smoothed unigram log-likelihood
      sum_slots ln((df+1)/(n_docs+1)), summed in slot order — the frozen
      divergence from ES's shingle-LM (this engine indexes no shingle
      field; ES's own docs require one for LM smoothing to work, and the
      unigram LM is the degenerate laplace(0.5)-like baseline);
    - confidence = 1 (ES default): only phrases scoring STRICTLY above
      the original phrase's own score are returned;
    - order: 6-dp-rounded score desc, suggestion asc (the rounding makes
      the DuckDB twin's float sums tie-stable), top `size`.

    Returns (suggestion string, score double) rows. Cost shape: one
    suggest_terms per slot (distributed when the vocab cache is cold) +
    O(slots * per_slot) driver-side arithmetic — never corpus work."""
    import math

    from engine.textnorm import standard_tokenize_py

    slots = standard_tokenize_py(text.lower())
    schema = "suggestion string, score double"
    if not slots:
        return reader.spark.createDataFrame([], schema)
    n1 = float(reader.n_docs + 1)
    base_df = reader.term_stats(slots)  # absent terms -> df 0

    def lp(term: str, df_override: int | None = None) -> float:
        df = base_df.get(term, 0) if df_override is None else df_override
        return math.log((df + 1) / n1)

    base_lps = [lp(t) for t in slots]
    base_score = sum(base_lps)
    out: list[tuple[str, float]] = []
    for i, slot in enumerate(slots):
        cands = suggest_terms(
            reader, slot, max_edits=max_edits, size=per_slot
        ).collect()
        for c in cands:
            score = sum(
                lp(c["suggestion"], int(c["df"])) if j == i else base_lps[j]
                for j in range(len(slots))
            )
            if score > base_score:
                phrase = " ".join(
                    c["suggestion"] if j == i else slots[j]
                    for j in range(len(slots))
                )
                out.append((phrase, round(score, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return reader.spark.createDataFrame(out[:size], schema)


def mget(
    reader: "IndexReader",
    urls: "list[str]",
    fields: "list[str] | None" = None,
) -> "DataFrame":
    """ES `_mget`: point-fetch documents by _id (url), one row per
    requested id in request order: (url, found, doc_id, <requested
    docvalue columns>). Missing ids and tombstoned docs report
    found=false with null attributes (ES reports deleted docs as not
    found). doc_id is the engine-internal global ordinal (shard offset +
    local id), null when not found.

    Cost shape: driver-side XXH64 shard routing groups the ids by shard;
    local index dirs serve each touched shard with ONE pruned pyarrow
    read carrying an `isin` url predicate (row-group pruning, no Spark
    job); remote dirs fall back to a docmap scan with the same pushed
    predicate — never a full corpus materialization."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from engine.hashing import xxh64

    fields = list(fields or [])
    dv_cols = reader.manifest.get("docvalue_cols") or []
    bad = [f for f in fields if f not in dv_cols and f not in reader.stored_cols]
    if bad:
        raise ValueError(
            f"field(s) {bad} not in index docvalues {dv_cols} "
            f"or stored columns {reader.stored_cols}"
        )
    # stored-source fields live in the docmap as src__<f>; docvalues win on
    # a name collision (they are the typed aggregation copy)
    phys = {f: (f if f in dv_cols else f"src__{f}") for f in fields}
    ftypes = {f: _spark_vtype(reader, phys[f]) for f in fields}
    schema = "url string, found boolean, doc_id long" + "".join(
        f", {f} {ftypes[f]}" for f in fields
    )
    if not urls:
        return reader.spark.createDataFrame([], schema)
    n_shards = reader.manifest["n_shards"]
    offsets = reader.shard_offsets()
    tomb = reader.tombstones()
    by_shard: dict[int, list[str]] = {}
    for u in urls:
        by_shard.setdefault(xxh64(u.encode()) % n_shards, []).append(u)
    cols = ["url", "local_id"] + [phys[f] for f in fields]
    hits: dict[str, tuple] = {}
    dm_dir = os.path.join(reader.dir, "docmap")
    if os.path.isdir(dm_dir):
        reader._check_generation()
        for shard, us in by_shard.items():
            part = os.path.join(dm_dir, f"shard={shard}")
            if not os.path.isdir(part):
                continue
            tbl = ds.dataset(part).to_table(
                columns=cols, filter=pc.field("url").isin(us)
            )
            dels = tomb.get(shard)
            for row in tbl.to_pylist():
                lid = int(row["local_id"])
                if dels is not None and lid in dels:
                    continue
                hits[row["url"]] = (
                    offsets[shard] + lid,
                    tuple(row[phys[f]] for f in fields),
                )
    else:
        rows = (
            reader.docmap()
            .filter(F.col("url").isin(list(urls)))
            .select("shard", *cols)
            .collect()
        )
        for row in rows:
            dels = tomb.get(int(row["shard"]))
            lid = int(row["local_id"])
            if dels is not None and lid in dels:
                continue
            hits[row["url"]] = (
                offsets[int(row["shard"])] + lid,
                tuple(row[phys[f]] for f in fields),
            )
    out = [
        (u, True, hits[u][0], *hits[u][1]) if u in hits
        else (u, False, None, *([None] * len(fields)))
        for u in urls
    ]
    return reader.spark.createDataFrame(out, schema)


def matched_queries(
    reader: "IndexReader",
    urls: "list[str]",
    named: "dict[str, tuple[list[str], str]]",
) -> "dict[str, list[str]]":
    """ES named queries: which `_name`d text clauses match each of the
    given documents — the engine primitive behind the per-hit
    `matched_queries` response array. `named` maps clause name ->
    (analyzed terms, operator 'or'|'and'); returns {url: [names]} with
    names in `named` insertion order (ES preserves clause order).

    Semantics mirror the scoring kernels exactly: 'or' matches when ANY
    live member term occurs in the doc; 'and' requires EVERY term (a term
    absent from the dictionary makes an 'and' clause unmatchable — the
    frozen conjunctive rule shared with bm25_topk). Tombstoned/missing
    urls match nothing.

    Cost shape: one mget routes the urls (pruned per-shard docmap reads);
    ONE postings read covers the union of every clause's terms
    (bucket-pruned, driver-local when the dir is); membership is a
    searchsorted probe of each decoded doc list against the page's local
    ids — the decode cost is the same postings IO a query for those terms
    would pay, amortized over all clauses and all k urls."""
    from engine.hashing import xxh64

    all_terms = sorted({t for ts, _ in named.values() for t in ts})
    stats = reader.term_stats(all_terms)
    n_shards = reader.manifest["n_shards"]
    tomb = reader.tombstones()
    # url -> (shard, local_id), tombstone-masked, via the mget routing
    doc_of: dict[str, tuple[int, int]] = {}
    offsets = reader.shard_offsets()
    for r in mget(reader, list(urls)).collect():
        if r["found"]:
            shard = xxh64(r["url"].encode()) % n_shards
            doc_of[r["url"]] = (shard, int(r["doc_id"]) - offsets[shard])
    live = [t for t in all_terms if t in stats]
    # (shard, term) -> sorted decoded local-id array
    docs_of: dict[tuple[int, str], np.ndarray] = {}
    if live and doc_of:
        by_shard = reader.postings_local(live)
        if by_shard is None:
            shards = sorted({s for s, _ in doc_of.values()})
            by_shard = {}
            for r in (
                reader.postings(live)
                .filter(F.col("shard").isin(shards))
                .collect()
            ):
                by_shard.setdefault(int(r["shard"]), []).append(r)
        for shard, rows in by_shard.items():
            dels = tomb.get(shard)
            for r in rows:
                d, _t, _l = P.decode_term_postings(
                    r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
                )
                keep = _live_mask(d, dels)
                docs_of[(shard, r.term)] = d if keep is None else d[keep]

    def _has(shard: int, lid: int, term: str) -> bool:
        d = docs_of.get((shard, term))
        if d is None or d.size == 0:
            return False
        i = int(np.searchsorted(d, lid))
        return i < d.size and int(d[i]) == lid

    out: dict[str, list[str]] = {}
    for u in urls:
        names = []
        loc = doc_of.get(u)
        if loc is not None:
            shard, lid = loc
            for name, (ts, op) in named.items():
                if not ts:
                    continue
                if op == "and":
                    ok = all(t in stats and _has(shard, lid, t) for t in ts)
                else:
                    ok = any(_has(shard, lid, t) for t in ts if t in stats)
                if ok:
                    names.append(name)
        out[u] = names
    return out


def _spark_vtype(reader: "IndexReader", fld: str) -> str:
    import pyarrow as pa

    t = reader._pa_dataset("docmap").schema.field(fld).type
    if pa.types.is_timestamp(t):
        return "timestamp_ntz"
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    return "string"


def _phrase_candidates(rows: list, slots: list[list[str]], dels, allow=None):
    """Decode positional posting rows and intersect the slots' doc lists
    (conjunctive, live-filtered). Each slot is a list of alternative terms
    (singletons for plain match_phrase; the expansion set for the
    match_phrase_prefix last slot) — a candidate doc must contain at least
    one alternative of EVERY slot. `allow` (sorted local ids) restricts
    candidates to an explicit doc set — the rescore-window / query-tree
    hook. Returns (by_term, cand) or None when the phrase cannot match in
    this shard.

    Position-stream block skipping (round-5): the doc/tf/dl streams decode
    first (cheap — they also carry the intersection), and the POSITION
    stream — the wide one, sum(tf) values vs df — decodes only for blocks
    whose [first_doc, last_doc] range contains a surviving candidate.
    A rare head-term in a selective phrase decodes a few blocks instead
    of its whole position stream; a shard with no candidates decodes no
    positions at all. Correct on any block subset because each posting's
    first position delta is stored raw (the per-posting rebase never
    crosses a block)."""
    decoded: dict[str, tuple] = {}
    for r in rows:
        blocks = _norm_blocks(r.blocks)
        docs, tfs, dls = P.decode_term_postings(
            r.docs_bin, r.tfs_bin, r.dls_bin, blocks
        )
        decoded[r.term] = (r, blocks, docs, tfs, dls)
    slot_docs = []
    for alts in dict.fromkeys(tuple(s) for s in slots):  # distinct slots
        present = [decoded[t][2] for t in alts if t in decoded]
        if not present:
            return None  # conjunctive: slot absent from this shard
        slot_docs.append(
            present[0] if len(present) == 1 else np.unique(np.concatenate(present))
        )
    # doc intersection, rarest-first (sorted arrays -> searchsorted chain)
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
    by_term: dict[str, tuple] = {}
    for t, (r, blocks, docs, tfs, dls) in decoded.items():
        nb = len(blocks)
        first = np.fromiter((b[0] for b in blocks), dtype=np.int64, count=nb)
        last = np.fromiter((b[1] for b in blocks), dtype=np.int64, count=nb)
        lo = np.searchsorted(cand, first, side="left")
        sel = (lo < cand.size) & (cand[np.minimum(lo, cand.size - 1)] <= last)
        offs = list(r.pos_offs)
        if sel.all():
            pos = P.decode_term_positions(tfs, r.pos_bin, offs, blocks)
            tfs64 = tfs.astype(np.int64)
            by_term[t] = (docs, tfs64, dls,
                          pos, np.concatenate(([0], np.cumsum(tfs64))))
            continue
        ns = np.fromiter((b[2] for b in blocks), dtype=np.int64, count=nb)
        keep = np.repeat(sel, ns)
        docs_f, tfs_f, dls_f = docs[keep], tfs[keep], dls[keep]
        blocks_f = [b for b, s in zip(blocks, sel) if s]
        offs_f = [o for o, s in zip(offs, sel) if s]
        pos = P.decode_term_positions(tfs_f, r.pos_bin, offs_f, blocks_f)
        tfs64 = tfs_f.astype(np.int64)
        by_term[t] = (docs_f, tfs64, dls_f,
                      pos, np.concatenate(([0], np.cumsum(tfs64))))
    return by_term, cand


def _slot_occurrences(
    by_term: dict, cand: np.ndarray, alts: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(doc, pos) arrays of one slot's occurrences inside the candidate
    docs, sorted by (doc, pos). Single-term slots come out sorted for free
    (postings are doc- then position-ordered); multi-alternative slots
    (prefix expansions) are merged with one lexsort."""
    ds, ps = [], []
    for t in alts:
        if t not in by_term:
            continue
        docs, tfs, _dls, pos, occ = by_term[t]
        j = np.searchsorted(docs, cand)
        np.minimum(j, docs.size - 1, out=j)
        j = j[docs[j] == cand] if docs.size else j[:0]
        lens = tfs[j]
        srcs = occ[j]
        n_occ = int(lens.sum())
        head = np.concatenate(([0], np.cumsum(lens)))[:-1]
        gather = np.arange(n_occ) - np.repeat(head, lens) + np.repeat(srcs, lens)
        keep_docs = docs[j]
        ds.append(np.repeat(keep_docs, lens))
        ps.append(pos[gather].astype(np.int64))
    if not ds:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if len(ds) == 1:
        return ds[0], ps[0]
    d = np.concatenate(ds)
    p = np.concatenate(ps)
    order = np.lexsort((p, d))
    return d[order], p[order]


def _phrase_score_rows(
    by_term: dict,
    slots: list[list[str]],
    match_docs: np.ndarray,
    pf: np.ndarray,
    idf_sum: float,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> list[tuple[int, float]]:
    """Shared phrase-scoring tail: dl lookup from the first slot whose
    term carries the matched docs, Lucene pseudo-term saturation, top-k."""
    dl = np.zeros(match_docs.size, dtype=np.float64)
    found = np.zeros(match_docs.size, dtype=bool)
    for t in dict.fromkeys(t for s in slots for t in s):
        if t not in by_term:
            continue
        docs, _tfs, dls, _pos, _occ = by_term[t]
        j = np.searchsorted(docs, match_docs)
        np.minimum(j, docs.size - 1, out=j)
        hit = (~found) & (docs[j] == match_docs)
        dl[hit] = dls[j[hit]]
        found |= hit
        if found.all():
            break
    scores = idf_sum * (pf / (pf + k1 * (1.0 - b + b * dl / avgdl)))
    sel = _topk_order(match_docs, scores, k)
    return [(int(match_docs[i]), float(scores[i])) for i in sel]


def _phrase_shard_topk(
    rows: list,
    slots: list[list[str]],
    idf_sum: float,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    dels: "np.ndarray | None",
    allow: "np.ndarray | None" = None,
) -> list[tuple[int, float]]:
    """Per-shard exact match_phrase kernel over positional postings.

    rows: posting rows (with pos_bin/pos_offs) for the phrase's DISTINCT
    terms in this shard; slots: one term-alternative list per phrase slot
    (singletons except the match_phrase_prefix expansion slot). Candidates
    = the conjunctive doc intersection; each candidate is verified by
    intersecting its per-slot position sets shifted by the slot offset
    (slot i's positions minus i) — the survivors' count is the phrase
    frequency. Lucene PhraseQuery scoring: the whole phrase behaves as ONE
    pseudo-term with tf = phrase_freq and idf = the sum of the member
    terms' idfs (duplicate slots counted),
    score = idf_sum * pf / (pf + k1*(1 - b + b*dl/avgdl)).

    Work is O(decoded postings of the rarest-term-bounded candidate set)
    and FULLY vectorized: after the conjunctive doc intersection, every
    slot's candidate occurrences become 64-bit (doc << 32 | pos - slot)
    keys and the phrase starts are one iterated sorted-set intersection
    over the whole shard — no per-candidate Python loop, so a head-bigram
    phrase with thousands of matching docs costs a handful of numpy
    passes."""
    got = _phrase_freqs(rows, slots, 0, dels, allow)
    if got is None:
        return []
    by_term, match_docs, pf = got
    return _phrase_score_rows(
        by_term, slots, match_docs, pf, idf_sum, k, k1, b, avgdl
    )


def _phrase_freqs(
    rows: list,
    slots: list[list[str]],
    slop: int,
    dels: "np.ndarray | None",
    allow: "np.ndarray | None" = None,
) -> "tuple[dict, np.ndarray, np.ndarray] | None":
    """Shared phrase-frequency core: (by_term, match_docs, pf) for one
    shard's positional posting rows, or None when nothing matches. slop=0
    is the exact-adjacency start-key intersection; slop>0 the frozen span
    semantics (see the two kernel docstrings). `allow` restricts the
    candidate docs (rescore window / query-string tree evaluation) — the
    frequencies of the surviving docs are unchanged."""
    got = _phrase_candidates(rows, slots, dels, allow)
    if got is None:
        return None
    by_term, cand = got
    if slop == 0:

        def _slot_keys(i: int, alts: list[str]) -> np.ndarray:
            # (doc << 32 | pos - i) keys of slot i's candidate occurrences,
            # sorted ascending (occurrences are doc- then position-ordered
            # and the shift preserves both orders within the kept subset)
            d, p = _slot_occurrences(by_term, cand, alts)
            keep = p >= i  # a phrase starting before the doc head can't exist
            return (d[keep] << 32) | (p[keep] - i)

        inter = _slot_keys(0, slots[0])
        for i, alts in enumerate(slots[1:], start=1):
            if inter.size == 0:
                return None
            inter = np.intersect1d(inter, _slot_keys(i, alts), assume_unique=True)
        if inter.size == 0:
            return None
        # phrase frequency per doc = count of surviving start keys
        match_docs, pf = np.unique(inter >> 32, return_counts=True)
        return by_term, match_docs, pf.astype(np.float64)
    n = len(slots)
    bias = n + slop + 1  # keeps every packed adj key strictly positive
    occs = []
    for i, alts in enumerate(slots):
        d, p = _slot_occurrences(by_term, cand, alts)
        adj = p - i
        occs.append(((d << 32) | (adj + bias), adj, p))
    keys0, adj0, pos0 = occs[0]
    s_doc = keys0 >> 32
    if s_doc.size == 0:
        return None
    s_mn, s_mx = adj0.copy(), adj0.copy()
    s_pos = [pos0]  # absolute positions per processed slot (dup-term guard)
    for i in range(1, n):
        keys, adj, p = occs[i]
        lo = np.searchsorted(keys, (s_doc << 32) | (s_mx - slop + bias), side="left")
        hi = np.searchsorted(keys, (s_doc << 32) | (s_mn + slop + bias), side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return None
        parent = np.repeat(np.arange(s_doc.size), cnt)
        head = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        offs = np.arange(tot) - np.repeat(head, cnt) + np.repeat(lo, cnt)
        a = adj[offs]
        new_pos = p[offs]
        keep = np.ones(tot, dtype=bool)
        same = set(slots[i])
        for j in range(i):
            if same & set(slots[j]):  # shared term alternatives
                keep &= s_pos[j][parent] != new_pos
        if not keep.all():
            parent, a, new_pos = parent[keep], a[keep], new_pos[keep]
            if parent.size == 0:
                return None
        s_mn = np.minimum(s_mn[parent], a)
        s_mx = np.maximum(s_mx[parent], a)
        s_doc = s_doc[parent]
        s_pos = [sp[parent] for sp in s_pos] + [new_pos]
    w = 1.0 / (1.0 + (s_mx - s_mn).astype(np.float64))
    match_docs, inv = np.unique(s_doc, return_inverse=True)
    pf = np.bincount(inv, weights=w)
    return by_term, match_docs, pf


def _phrase_slop_shard_topk(
    rows: list,
    slots: list[list[str]],
    slop: int,
    idf_sum: float,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    dels: "np.ndarray | None",
    allow: "np.ndarray | None" = None,
) -> list[tuple[int, float]]:
    """Per-shard sloppy match_phrase kernel (frozen span semantics).

    Frozen spec (divergence from Lucene's SloppyPhraseScorer, which
    enumerates matches greedily — repeated-token docs can count fewer
    matches there): a match is ONE occurrence choice per slot whose
    ADJUSTED positions (pos - slot index) span at most `slop` — exactly
    ES's metric, where a swapped bigram costs 2 and one intervening token
    costs 1; slots sharing a term must take pairwise-distinct token
    positions; matches are counted combinatorially, each weighted
    1 / (1 + span) (Lucene's sloppyFreq weight), and the phrase tf is the
    weight sum. slop=0 reduces exactly to the adjacency kernel (span 0
    <=> all adjusted positions equal; property-tested). Scoring is the
    same pseudo-term model as _phrase_shard_topk. The combinatorial count
    is order-independent and expressible as a positions self-join, which
    is what makes the DuckDB oracle twin exact.

    Vectorized as an iterative constrained join: states after slot i are
    parallel arrays (doc, adj-min, adj-max, chosen positions); slot i+1's
    occurrences are range-looked-up per state via searchsorted over
    (doc << 32 | adj + bias) keys. The window [adj_max - slop,
    adj_min + slop] preserves the span invariant, so no post-filter is
    needed. Work is O(assignments), bounded per doc by
    tf_slot0 * (2*slop + 1)^(n_slots - 1). The frequency core lives in
    _phrase_freqs (shared with the exact kernel, the rescore window, and
    the query-string tree evaluator)."""
    got = _phrase_freqs(rows, slots, slop, dels, allow)
    if got is None:
        return []
    by_term, match_docs, pf = got
    return _phrase_score_rows(
        by_term, slots, match_docs, pf, idf_sum, k, k1, b, avgdl
    )


def _phrase_slots_topk(
    reader: "IndexReader",
    slots: list[list[str]],
    idf_sum: float,
    k: int,
    slop: int,
    execution: str,
    lookup: str,
    filters=(),
) -> DataFrame:
    """Shared phrase executor: run the exact (slop=0) or sloppy kernel per
    shard over the slots' distinct terms, local pyarrow or ONE Spark
    scatter-gather, finalize via the pruned docmap lookup.

    filters (ES filter context): the phrase match set is conjunctive (a
    doc must contain every slot), so it is small enough to materialize in
    full per shard — the kernel runs unbounded (k = 2^31) and the
    docvalue mask + truncation to k happen on its ordered output. Exact:
    identical to masking before top-k selection."""
    spark = reader.spark
    distinct = list(dict.fromkeys(t for s in slots for t in s))
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl
    tomb = reader.tombstones()
    shard_filter = None
    if filters:
        from engine.docvalues import build_shard_filter

        shard_filter = build_shard_filter(reader, filters)

    def run_kernel(rows: list, dels, shard=None) -> list[tuple[int, float]]:
        kk = k if shard_filter is None else (1 << 31)
        if slop:
            top = _phrase_slop_shard_topk(
                rows, slots, slop, idf_sum, kk, k1, b, avgdl, dels
            )
        else:
            top = _phrase_shard_topk(rows, slots, idf_sum, kk, k1, b, avgdl, dels)
        if shard_filter is None or not top:
            return top
        loc = np.array([t[0] for t in top], dtype=np.int64)
        order = np.argsort(loc, kind="stable")  # gather needs sorted ids
        keep = np.empty(loc.size, dtype=bool)
        keep[order] = shard_filter(shard, loc[order])
        # top is already (score desc, doc asc): masked truncation is exact
        return [t for t, m in zip(top, keep) if m][:k]

    heap_rows: list[tuple[int, int, float]] | None = None
    stats = reader.term_stats(distinct)
    total_postings = sum(stats.get(t, 0) for t in distinct)
    if execution == "local" or (
        execution == "auto" and total_postings <= reader.LOCAL_MAX_POSTINGS
    ):
        by_shard = reader.postings_pos_local(distinct)
        if by_shard is not None:
            heap_rows = [
                (shard, local, score)
                for shard, rows in by_shard.items()
                for local, score in run_kernel(rows, tomb.get(shard), shard)
            ]
    if heap_rows is None:

        def shard_topk(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            top = run_kernel(
                list(pdf.itertuples()), tomb.get(int(pdf_key[0])),
                int(pdf_key[0]),
            )
            return pd.DataFrame(
                {
                    "shard": np.full(len(top), pdf_key[0], dtype=np.int32),
                    "local_id": np.array([t[0] for t in top], dtype=np.int64),
                    "score": np.array([t[1] for t in top], dtype=np.float64),
                }
            )

        per_shard = (
            reader.postings(distinct)
            .groupBy("shard")
            .applyInPandas(shard_topk, "shard int, local_id long, score double")
        )
        heap_rows = [
            (r["shard"], r["local_id"], r["score"]) for r in per_shard.collect()
        ]
    kind, payload = _finalize_topk(reader, heap_rows, k, lookup)
    if kind == "df":
        return payload
    if not payload:
        return _empty_topk(spark)
    return spark.createDataFrame(
        pd.DataFrame(payload, columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def _empty_topk(spark) -> DataFrame:
    return spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )


def _require_positions(reader: "IndexReader", what: str) -> None:
    if reader.index_options != "positions":
        raise ValueError(
            f"{what} needs a positional index; {reader.dir} was built "
            "with index_options="
            f"{reader.index_options!r} (rebuild with index_options='positions')"
        )


def match_phrase_topk(
    reader: "IndexReader",
    phrase: str | list[str],
    k: int = 10,
    slop: int = 0,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES `match_phrase` top-k over a POSITIONAL index: (url, doc_id,
    score), score desc / doc_id asc.

    The phrase analyzer keeps duplicates and order (unlike the bag-of-words
    queries): "the cat the hat" is four slots. A slot term missing from the
    dictionary means zero hits (conjunctive, ES behavior). Scoring is the
    Lucene PhraseQuery model — the phrase is one pseudo-term whose tf is
    the exact phrase frequency and whose idf is the sum of member idfs.

    slop=0 is exact adjacency; slop>0 matches ES's proximity metric —
    adjusted positions (pos - slot) may span up to `slop`, so one
    intervening token costs 1 and a swapped bigram costs 2 — with the
    frozen combinatorial sloppyFreq documented on _phrase_slop_shard_topk.

    Execution mirrors bm25_topk: driver-local pyarrow read + in-process
    kernel when the index is local and the distinct terms' postings fit
    LOCAL_MAX_POSTINGS, else ONE Spark scatter-gather (per-shard kernels
    via applyInPandas, <= k rows back per shard); winner urls via the
    pruned docmap lookup. Requires index_options="positions" (build_index;
    a freqs index raises ValueError — ES parity: a field indexed without
    positions rejects phrase queries)."""
    _require_positions(reader, "match_phrase")
    from engine.textnorm import standard_tokenize_py

    terms = (
        standard_tokenize_py(phrase.lower()) if isinstance(phrase, str)
        else list(phrase)
    )
    if not terms:
        return _empty_topk(reader.spark)
    distinct = list(dict.fromkeys(terms))
    stats = reader.term_stats(distinct)
    if any(t not in stats for t in distinct):
        return _empty_topk(reader.spark)
    idf_sum = float(
        sum(P.bm25_idf(stats[t], reader.n_docs) for t in terms)  # dups counted
    )
    return _phrase_slots_topk(
        reader, [[t] for t in terms], idf_sum, k, slop, execution, lookup,
        filters,
    )


def bm25_multifield_phrase_topk(
    reader: "IndexReader",
    phrase: str | list[str],
    fields: list,
    k: int = 10,
    slop: int = 0,
    tie_breaker: float = 0.0,
    filters=(),
    kind: str = "phrase",
    max_expansions: int = 50,
) -> DataFrame:
    """ES multi_match type=phrase / phrase_prefix / bool_prefix over
    SEVERAL indexed fields: per-field leg scores (each field's own
    postings, df, avgdl) blended dis_max — max + tie_breaker * rest
    (Lucene wraps the per-field queries in a DisjunctionMaxQuery).
    "title^2" boost syntax. kind picks the per-field leg: "phrase" =
    match_phrase, "phrase_prefix" = match_phrase_prefix (last slot
    expands), "bool_prefix" = match_bool_prefix (ranked OR union with the
    last token as prefix).

    Exactness: each field's FULL match set is materialized (phrase legs
    are conjunctive hence small; bool_prefix legs are OR unions — the
    one leg to watch at scale, same footprint as running that match on
    the field alone) and the blend is computed per doc over the union
    BEFORE top-k, so any tie_breaker is exact. Filter clauses ride every
    per-field leg (identical docvalue mask -> identical restriction).
    Shared docmap => per-field doc_ids coincide by construction."""
    fb = parse_field_boosts(fields)
    unknown = [n for n, _ in fb if n not in reader.text_fields]
    if unknown:
        raise ValueError(
            f"multi_match {kind} fields {unknown} are not indexed "
            f"(text_fields={reader.text_fields})"
        )
    frames = []
    for name, boost in fb:
        r = reader if name == reader.field else reader.for_field(name)
        if kind == "phrase":
            leg = match_phrase_topk(r, phrase, k=1 << 31, slop=slop, filters=filters)
        elif kind == "phrase_prefix":
            leg = match_phrase_prefix_topk(
                r, phrase, k=1 << 31, slop=slop,
                max_expansions=max_expansions, filters=filters,
            )
        elif kind == "bool_prefix":
            leg = match_bool_prefix_topk(
                r, phrase, k=1 << 31, max_expansions=max_expansions,
                filters=filters,
            )
        else:
            raise ValueError(f"unknown multi-field phrase kind {kind!r}")
        pdf = leg.toPandas()
        if len(pdf):
            pdf = pdf.copy()
            pdf["score"] = pdf["score"] * boost
            frames.append(pdf[["url", "doc_id", "score"]])
    return blend_dismax_frames(reader.spark, frames, tie_breaker, k)


def blend_dismax_frames(
    spark, frames: list, tie_breaker: float, k: int
) -> DataFrame:
    """Lucene DisjunctionMaxQuery blend over FULL per-leg match sets:
    score = max(leg scores) + tie_breaker * (sum - max) per doc, then
    (score desc, doc_id asc) top-k. Each frame is a pandas DataFrame
    with (url, doc_id, score) holding ONE leg's complete (unbounded-k)
    scored match set — any boost must already be applied by the caller.
    Exact for every tie_breaker because no leg was truncated before the
    blend. Shared by bm25_multifield_phrase_topk and the DSL's general
    dis_max (engine/dsl.py) so the two blends cannot drift."""
    frames = [f for f in frames if len(f)]
    if not frames:
        return _empty_topk(spark)
    allp = pd.concat(frames, ignore_index=True)
    g = allp.groupby(["url", "doc_id"], sort=False)["score"]
    agg = g.agg(["max", "sum"]).reset_index()
    agg["score"] = agg["max"] + tie_breaker * (agg["sum"] - agg["max"])
    agg = agg.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return spark.createDataFrame(
        agg[["url", "doc_id", "score"]],
        "url string, doc_id long, score double",
    )


def phrase_matcher(reader: "IndexReader", phrase: str | list[str], slop: int = 0):
    """(distinct_terms, matcher) for composing a match_phrase query
    context with aggs/count: matcher(rows, dels) -> SORTED local ids of
    the docs whose phrase frequency > 0 in one shard (the exact/sloppy
    kernel run unbounded; scores discarded — idf_sum=1 placeholder).
    Returns None when a slot term is missing from the dictionary
    (conjunctive: the matched set is empty everywhere). The caller feeds
    `distinct_terms` to the positional postings read and `matcher` to
    search_aggs(matcher=..., needs_pos=True) — the matched set is
    computed per shard next to the postings, never collected globally."""
    _require_positions(reader, "match_phrase (agg/count context)")
    from engine.textnorm import standard_tokenize_py

    terms = (
        standard_tokenize_py(phrase.lower()) if isinstance(phrase, str)
        else list(phrase)
    )
    if not terms:
        return None
    distinct = list(dict.fromkeys(terms))
    stats = reader.term_stats(distinct)
    if any(t not in stats for t in distinct):
        return None
    slots = [[t] for t in terms]
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl

    def matcher(rows: list, dels) -> np.ndarray:
        if slop:
            top = _phrase_slop_shard_topk(
                rows, slots, slop, 1.0, 1 << 31, k1, b, avgdl, dels
            )
        else:
            top = _phrase_shard_topk(rows, slots, 1.0, 1 << 31, k1, b, avgdl, dels)
        if not top:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.array([t[0] for t in top], dtype=np.int64))

    return distinct, matcher


def phrase_scored_matcher(reader: "IndexReader", phrase: str | list[str],
                          slop: int = 0):
    """(distinct_terms, scored_matcher) for the sampler aggs under a
    match_phrase query context (round-5 lift): scored_matcher(rows,
    dels) -> the shard's full [(local_id, score)] phrase match list
    with the TRUE phrase BM25 score (idf_sum = slot-counted member
    idfs, identical to match_phrase_topk — unlike phrase_matcher's
    discarded-score placeholder), ordered score desc / doc asc. The
    sampler's top cut is by score, so the placeholder would pick the
    WRONG sample. Returns None when a slot term is missing from the
    dictionary (conjunctive: empty everywhere)."""
    _require_positions(reader, "match_phrase (sampler context)")
    from engine.textnorm import standard_tokenize_py

    terms = (
        standard_tokenize_py(phrase.lower()) if isinstance(phrase, str)
        else list(phrase)
    )
    if not terms:
        return None
    distinct = list(dict.fromkeys(terms))
    stats = reader.term_stats(distinct)
    if any(t not in stats for t in distinct):
        return None
    idf_sum = float(
        sum(P.bm25_idf(stats[t], reader.n_docs) for t in terms)  # dups counted
    )
    slots = [[t] for t in terms]
    k1, b, avgdl = reader.k1, reader.b, reader.avgdl

    def scored(rows: list, dels) -> list:
        if slop:
            return _phrase_slop_shard_topk(
                rows, slots, slop, idf_sum, 1 << 31, k1, b, avgdl, dels
            )
        return _phrase_shard_topk(rows, slots, idf_sum, 1 << 31, k1, b,
                                  avgdl, dels)

    return distinct, scored


def match_phrase_prefix_topk(
    reader: "IndexReader",
    phrase: str | list[str],
    k: int = 10,
    slop: int = 0,
    max_expansions: int = 50,
    execution: str = "auto",
    lookup: str = "auto",
    filters=(),
) -> DataFrame:
    """ES `match_phrase_prefix` top-k: the LAST slot matches every
    dictionary term with that prefix (df-ordered, capped at
    max_expansions — ES default 50), the earlier slots are exact.

    Frozen scoring spec (divergence from Lucene's MultiPhraseQuery, whose
    idf SUMS every expansion's idf so the score inflates with the
    expansion count): the prefix slot is ONE pseudo-term whose df is the
    number of docs containing ANY expansion — computed exactly (shards
    partition docs, so the per-shard union-doc counts sum), deterministic,
    oracle-expressible (`term LIKE 'pre%'` in SQL), and stable as the
    vocabulary grows. tf is the phrase frequency over the expanded last
    slot; everything else is the match_phrase model (slop supported)."""
    _require_positions(reader, "match_phrase_prefix")
    from engine.textnorm import standard_tokenize_py

    terms = (
        standard_tokenize_py(phrase.lower()) if isinstance(phrase, str)
        else list(phrase)
    )
    if not terms:
        return _empty_topk(reader.spark)
    head, pre = terms[:-1], terms[-1]
    expansions = reader.expand_prefix(pre, max_expansions=max_expansions)
    if not expansions:
        return _empty_topk(reader.spark)
    stats = reader.term_stats(list(dict.fromkeys(head)))
    if any(t not in stats for t in head):
        return _empty_topk(reader.spark)
    # exact union df of the prefix slot: shards partition the doc space,
    # so the per-shard distinct-doc counts of the expansions' merged
    # postings sum to the global df. Local indexes read it with the same
    # pruned pyarrow pass the kernel uses; remote dirs decode docs_bin in
    # one tiny distributed pass over just those terms' postings.
    by_shard = reader.postings_pos_local(expansions)
    if by_shard is not None:
        df_union = 0
        for rows in by_shard.values():
            docs = [
                P.decode_term_postings(
                    r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
                )[0]
                for r in rows
            ]
            if docs:
                df_union += int(np.unique(np.concatenate(docs)).size)
    else:

        def _count(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            parts = [
                P.decode_term_postings(
                    r.docs_bin, r.tfs_bin, r.dls_bin, _norm_blocks(r.blocks)
                )[0]
                for r in pdf.itertuples()
            ]
            n = int(np.unique(np.concatenate(parts)).size) if parts else 0
            return pd.DataFrame({"n": [n]})

        rows = (
            reader.postings(expansions)
            .groupBy("shard")
            .applyInPandas(_count, "n long")
            .collect()
        )
        df_union = int(sum(r["n"] for r in rows))
    if df_union == 0:
        return _empty_topk(reader.spark)
    idf_sum = float(
        sum(P.bm25_idf(stats[t], reader.n_docs) for t in head)
        + P.bm25_idf(df_union, reader.n_docs)
    )
    slots = [[t] for t in head] + [list(expansions)]
    return _phrase_slots_topk(
        reader, slots, idf_sum, k, slop, execution, lookup, filters
    )


def rescore_topk(
    reader: "IndexReader",
    query: str | list[str],
    rescore_phrase: str | list[str],
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    slop: int = 0,
    mode: str = "or",
    filters=(),
) -> DataFrame:
    """ES `rescore` (query rescorer, score_mode=total): re-rank the top
    `window_size` hits of the base BM25 query by blending in a
    match_phrase score — (url, doc_id, score), score desc / doc_id asc.

    Reference parity: the ES _search `rescore` block with a `match_phrase`
    rescore query — the classic precision pass over a cheap recall query.
    final = query_weight * base + rescore_weight * phrase for window docs
    the phrase matches; window docs it does not match keep
    query_weight * base. Docs outside the window are never re-ranked (and
    never returned: k <= window_size, ES behavior).

    Frozen determinism spec (divergence from ES, which rescores per-shard
    windows): the window is GLOBAL — the top window_size docs by 6-dp
    ROUNDED base score with doc_id tiebreak (the same float-sum-noise
    guard as the oracle harness; raw parallel-sum near-ties at the window
    boundary would otherwise flip between runs). Phrase scores are exact
    (same kernels as match_phrase_topk, restricted to the window via the
    candidate allowlist — the phrase never ranks docs the base query
    didn't admit, so a head-phrase rescore costs O(window) verification,
    not a corpus-wide phrase search)."""
    _require_positions(reader, "rescore (phrase rescorer)")
    from engine.textnorm import standard_tokenize_py

    if k > window_size:
        raise ValueError(f"k={k} > window_size={window_size}")
    # over-fetch so the rounded window boundary region is fully present.
    # filters (ES post_filter): applied at hit collection, so the window
    # is cut from the FILTERED base ranking — survivor scores unchanged
    # (the filter-context contract), exactly Lucene's filtered collector.
    base = bm25_topk_rows(
        reader, query, k=window_size + 16, mode=mode, filters=filters
    )
    if not base:
        return _empty_topk(reader.spark)
    base.sort(key=lambda r: (-round(r[2], 6), r[1]))
    window = base[:window_size]
    # doc_id -> (shard, local) inverse map. shard_offsets() marks EMPTY
    # shards with a -1 sentinel (tiny corpora routinely leave a shard
    # empty); searchsorted needs a monotone boundary array, so build it
    # from the non-empty shards only (their offsets strictly increase —
    # each holds >= 1 doc) and index back to the real shard numbers.
    offs_raw = reader.shard_offsets()
    live = sorted((off, s) for s, off in enumerate(offs_raw) if off >= 0)
    bounds = np.asarray([off for off, _ in live], dtype=np.int64)
    shard_of = np.asarray([s for _, s in live], dtype=np.int64)
    doc_ids = np.asarray([r[1] for r in window], dtype=np.int64)
    idx = np.searchsorted(bounds, doc_ids, side="right") - 1
    shards = shard_of[idx]
    locals_ = doc_ids - bounds[idx]
    allow_by_shard: dict[int, np.ndarray] = {
        int(s): np.sort(locals_[shards == s]) for s in np.unique(shards)
    }

    terms = (
        standard_tokenize_py(rescore_phrase.lower())
        if isinstance(rescore_phrase, str)
        else list(rescore_phrase)
    )
    phrase_scores: dict[tuple[int, int], float] = {}
    distinct = list(dict.fromkeys(terms))
    stats = reader.term_stats(distinct)
    if terms and all(t in stats for t in distinct):
        idf_sum = float(sum(P.bm25_idf(stats[t], reader.n_docs) for t in terms))
        slots = [[t] for t in terms]
        k1, b, avgdl = reader.k1, reader.b, reader.avgdl
        tomb = reader.tombstones()
        by_shard = reader.postings_pos_local(distinct)
        if by_shard is not None:  # local index dir: in-process verification
            for shard, rows in by_shard.items():
                allow = allow_by_shard.get(int(shard))
                if allow is None:
                    continue
                top = _phrase_slop_shard_topk(
                    rows, slots, slop, idf_sum, allow.size, k1, b, avgdl,
                    tomb.get(shard), allow,
                ) if slop else _phrase_shard_topk(
                    rows, slots, idf_sum, allow.size, k1, b, avgdl,
                    tomb.get(shard), allow,
                )
                for local, sc in top:
                    phrase_scores[(int(shard), int(local))] = sc
        else:  # remote dir: ONE scatter-gather, window allowlist broadcast
            allow_b = {s: a.tolist() for s, a in allow_by_shard.items()}

            def shard_scores(pdf_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                shard = int(pdf_key[0])
                allow = allow_b.get(shard)
                if allow is None:
                    return pd.DataFrame({"shard": [], "local_id": [], "score": []}).astype(
                        {"shard": np.int32, "local_id": np.int64, "score": np.float64}
                    )
                arr = np.asarray(allow, dtype=np.int64)
                rows = list(pdf.itertuples())
                top = _phrase_slop_shard_topk(
                    rows, slots, slop, idf_sum, arr.size, k1, b, avgdl,
                    tomb.get(shard), arr,
                ) if slop else _phrase_shard_topk(
                    rows, slots, idf_sum, arr.size, k1, b, avgdl,
                    tomb.get(shard), arr,
                )
                return pd.DataFrame(
                    {
                        "shard": np.full(len(top), shard, dtype=np.int32),
                        "local_id": np.array([t[0] for t in top], dtype=np.int64),
                        "score": np.array([t[1] for t in top], dtype=np.float64),
                    }
                )

            got = (
                reader.postings(distinct)
                .groupBy("shard")
                .applyInPandas(shard_scores, "shard int, local_id long, score double")
                .collect()
            )
            phrase_scores = {
                (r["shard"], r["local_id"]): r["score"] for r in got
            }

    out = []
    for (url, doc_id, base_sc), shard, local in zip(window, shards, locals_):
        ph = phrase_scores.get((int(shard), int(local)), 0.0)
        out.append((url, int(doc_id), query_weight * base_sc + rescore_weight * ph))
    out.sort(key=lambda r: (-r[2], r[1]))
    return reader.spark.createDataFrame(
        pd.DataFrame(out[:k], columns=["url", "doc_id", "score"]),
        "url string, doc_id long, score double",
    )


def index_stats(reader: "IndexReader") -> dict:
    """ES `_stats` / `_cat/indices` analog: index-level summary assembled
    driver-side from the manifest, parquet metadata, and the delete log —
    no Spark job, no data scan (term count comes from parquet row-group
    metadata, bytes from the directory walk)."""
    import pyarrow.dataset as ds

    from engine.deletes import list_snapshots

    def _dir_bytes(sub: str) -> int:
        p = os.path.join(reader.dir, sub)
        if not os.path.isdir(p):
            return 0
        return sum(
            os.path.getsize(os.path.join(r, fn))
            for r, _d, fns in os.walk(p)
            for fn in fns
        )

    n_terms = ds.dataset(os.path.join(reader.dir, reader._ts_sub)).count_rows()
    tomb = reader.tombstones()
    return {
        "n_docs": int(reader.n_docs),
        "n_live_docs": int(reader.n_docs) - sum(a.size for a in tomb.values()),
        "n_terms": int(n_terms),
        "sum_dl": int(reader.manifest.get("sum_dl", 0)),
        "avgdl": float(reader.avgdl),
        "n_shards": int(reader.manifest["n_shards"]),
        "n_buckets": int(reader.manifest["n_buckets"]),
        "docvalue_cols": list(reader.manifest.get("docvalue_cols") or []),
        "tombstones": int(sum(a.size for a in tomb.values())),
        "snapshots": len(list_snapshots(reader.dir)),
        "postings_bytes": _dir_bytes("postings"),
        "docmap_bytes": _dir_bytes("docmap"),
        "analyzer": reader.manifest.get("analyzer", ""),
        "codec": reader.manifest.get("codec", ""),
    }


def multi_index_topk(
    readers: list,
    query: "str | list[str]",
    k: int = 10,
    mode: str = "or",
    boosts: "list[float] | None" = None,
) -> "DataFrame":
    """Federated BM25 across several indexes with GLOBAL statistics —
    ES's dfs_query_then_fetch over an alias: a stats phase combines the
    per-index dictionaries (df summed per term, n_docs and sum_dl summed,
    one pruned term_stats read per index), then EACH index scores its own
    postings with the corpus-global idf/avgdl (the exact TAAT kernels via
    bm25_topk's stats_override; block-max bounds are local-avgdl-baked so
    pruning stays single-index) and only per-index top-k rows merge.

    Because the indexes partition the corpus, global-stats federation is
    score-identical to querying one index built over the union — the
    segment-merge identity WITHOUT rewriting a byte (tested: federated
    == merged, rank and score). Doc-id (url) uniqueness across member
    indexes is the caller's contract, exactly as with ES aliases.
    k1/b must agree across members (asserted).

    boosts: ES `indices_boost` — a per-member multiplier applied to that
    index's hit scores BEFORE the cross-index merge (ES semantics: a
    plain multiply, which deliberately breaks global comparability in
    favor of the caller's index preference). None/1.0 everywhere is the
    score-identical federation above."""
    from engine.oracle import analyze_query_py as _aq

    assert readers, "multi_index_topk needs at least one reader"
    k1b = {(float(r.k1), float(r.b)) for r in readers}
    assert len(k1b) == 1, f"members disagree on k1/b: {k1b}"
    terms = _aq(query) if isinstance(query, str) else list(dict.fromkeys(query))
    df_g: dict[str, int] = {}
    for r in readers:
        for t, d in r.term_stats(terms).items():
            df_g[t] = df_g.get(t, 0) + int(d)
    live = [t for t in terms if df_g.get(t)]
    spark = readers[0].spark
    empty = spark.range(0).select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
    )
    if not live or (mode == "and" and len(live) < len(terms)):
        return empty
    n_g = sum(int(r.n_docs) for r in readers)
    sum_dl = sum(int(r.manifest["sum_dl"]) for r in readers)
    avgdl_g = sum_dl / n_g
    idfs_g = {t: float(P.bm25_idf(df_g[t], n_g)) for t in live}
    if boosts is not None:
        assert len(boosts) == len(readers), "one boost per member index"
    parts = [
        bm25_topk(
            r, live, k=k, mode=mode, algo="taat",
            stats_override=(idfs_g, avgdl_g),
        )
        for r in readers
    ]
    if boosts is not None:
        parts = [
            p.withColumn("score", F.col("score") * F.lit(float(w)))
            for p, w in zip(parts, boosts)
        ]
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    # cross-index merge: scores are globally comparable by construction;
    # url is the only cross-index total tiebreak (doc_ids are per-index)
    return out.orderBy(F.desc("score"), F.asc("url")).limit(k)
