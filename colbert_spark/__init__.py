"""colbert_spark — a PySpark-native full-text retrieval engine.

A brand-new engine (NOT a port) providing the capabilities of the reference
ColBERT-style retrieval system (wuyaoxuehun/colbert) re-expressed as classical
IR on Spark: distributed inverted-index construction (docID-delta + varbyte
compressed posting segments with per-block max-score metadata), exact BM25
top-k retrieval with block-max WAND pruning, manifest-based resumable builds,
and training-data pipeline operators (dedup, similarity search, text analysis).

Layout
------
functions/   deterministic tokenizer + scalar/text/vector functions
sources/     table loaders + deterministic synthetic corpus generation
index/       posting-list codec, distributed index build, segment manifest
query/       BM25 scoring (DataFrame path) and block-max WAND (segment path)
operators/   dedup, similarity search, text analysis, relational ops
streaming/   incremental indexing over Structured Streaming
plans/       plan inspection helpers (explain audits)
oracle.py    pure-Python reference engine for rank-identity testing
"""

__version__ = "0.1.0"
