"""Engine operators.

- ``cdc``: latest-record dedup, Op routing/union, audit columns (the
  reference's signature dataflow, SURVEY §3.2). MERGE itself lives in
  ``formats.parquet_cow`` (the write-path join J1).
- ``dedup``: document near-dup detection (MinHash + banded LSH,
  n-gram Jaccard).
- ``similarity``: cosine similarity / nearest-neighbor search over
  embedding columns.
- ``textstats``: token counting, quality scoring, language ID,
  fingerprinting.
"""
