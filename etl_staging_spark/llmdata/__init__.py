"""LLM-training-data pipeline operators over the documents/embeddings tables.

Four operator families the reference lacks but a 100 TB training-data
pipeline needs (builder brief, BASELINE north star):

- deduplication: exact (sha2 groupBy), n-gram Jaccard (shingle
  inverted index), MinHash+LSH banding (the scale path), SimHash —
  :mod:`.dedup`
- similarity search: brute-force cosine top-k baseline + random-
  hyperplane LSH bucketed variant — :mod:`.simsearch`
- text analysis: quality scoring, language-ID n-gram heuristic,
  tokenizer-ish counting, document fingerprinting — :mod:`.textstats`
- multimodal plumbing: opaque binary payloads + Arrow-batched
  Pandas-UDF decode (decode itself stubbed deterministically; the
  image/audio libs are not in this container) — :mod:`.multimodal`

Everything hot-path is native ``pyspark.sql.functions`` (JVM,
whole-stage codegen); Python appears only in the mapInPandas
multimodal decode, which is Arrow-batched by design.

Cross-engine determinism: hash-derived values use
:func:`etl_staging_spark.llmdata.hashing.portable_hash56` — the low
56 bits of md5, computable identically in Spark (md5+conv), DuckDB
(md5_number_lower % 2^56) and Python (hashlib) — so even the
probabilistic operators (MinHash bands, LSH buckets) are exactly
reproducible by the DuckDB oracle.
"""
