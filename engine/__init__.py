"""spark-fulltext: a PySpark-native inverted-index build + BM25 query engine.

Brand-new engine with the data-processing and query capabilities of
companieshouse/elasticsearch-data-loader (reference at /root/reference,
read-only): that loader's own dataflow (scan -> validate -> enrich ->
transform -> sink with reject side-channels) plus the full-text semantics its
Elasticsearch index DDL declares (analyzers, BM25, sharding) -- re-expressed
Spark-first, not ported.

Modules
-------
session    SparkSession builder (Arrow on, UTC, tuned shuffle partitions)
synth      deterministic synthetic `pages` corpus + frozen query set
extract    html -> text extractor (byte-identical per url invariant)
textnorm   frozen analyzers L1-L10, alphakey, company-name-ending splitter
transform  Layer-A parity pipeline (validate/enrich/transform/reject-log)
postings   delta + StreamVByte posting codec + block-max metadata (numpy)
index_build  doc-sharded, term-bucketed index build w/ lineage + resume;
           multi-field mappings (per-field postings/stats), stored-source
           columns, optional term-hash shuffle encoding (A/B'd)
query      BM25 top-k: block-max WAND engine (DataFrame, rows-serving, and
           batch APIs) + brute-force DataFrame path; query modes (prefix/
           fuzzy/wildcard/regexp/bool/dis_max/more_like_this), true
           multi-field multi_match (best/most/cross_fields), percolator,
           term vectors, _explain, term suggester, highlighting (index-
           served from stored source), _mget/_source point fetches,
           index stats
oracle     pure-Python brute-force BM25 (the rank-identity judge)
streaming  incremental segment ingest (Structured Streaming) + Lucene-style
           segment merge into the standard index layout
dedup      exact / minhash-LSH / simhash / n-gram-jaccard dedup,
           connected components, benchmark decontamination
simsearch  embedding cosine top-k (brute force + LSH-bucketed + IVF ANN
           + IVF-PQ product-quantized ADC with exact re-rank)
textstats  lang-id, quality scoring, token counting, fingerprinting,
           Gopher repetition stats, PII scrub, stratified sampling,
           token-budget packing
multimodal binary-column (image/audio/video) plumbing: feature extract,
           frame sampling, resize — injectable codecs, stubbed honestly
events     windowed (tumbling/sliding/session) + sessionization operators
           with Structured Streaming twins (watermark, applyInPandasWithState)
deletes    tombstoned doc deletes (Lucene live-docs masking in every query
           kernel) + shuffle-free compaction, tested equal to a fresh
           build; delete_by_query (DSL matched-set -> tombstone snapshot)
aggs       ES aggregations over docvalues: terms(+stats)/range/histogram/
           date_histogram/stats/cardinality/composite/top_hits/percentiles/
           missing/filters/significant_terms, _count, field-sorted
           search_after paging; filter context shared with the query side
docvalues  docvalue gather + ES filter-context clauses (term/range/exists)
"""

__version__ = "0.1.0"
