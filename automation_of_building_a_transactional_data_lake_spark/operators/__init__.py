"""Engine operators.

- ``cdc``: latest-record dedup, Op routing, audit columns (the
  reference's signature dataflow, SURVEY §3.2).
- ``merge``: MERGE INTO semantics (upsert/delete) expressed as Spark
  joins — the write-path join J1.
- ``dedup``: document deduplication (exact, MinHash-LSH, SimHash,
  n-gram Jaccard, embedding near-dup).
- ``similarity``: cosine similarity / nearest-neighbor search.
- ``textstats``: token counting, quality scoring, language ID,
  fingerprinting.
- ``multimodal``: binary-column (image/audio) plumbing with stubbed
  decoders.
"""
