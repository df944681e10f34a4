"""Engine operators.

- ``cdc``: latest-record dedup, Op routing/union, audit columns (the
  reference's signature dataflow, SURVEY §3.2). MERGE itself lives in
  ``formats.parquet_cow`` (the write-path join J1).
- ``dedup``: document near-dup detection (MinHash + banded LSH,
  n-gram Jaccard, SimHash).
- ``similarity``: cosine similarity / nearest-neighbor search over
  embedding columns.
- ``ann_ivf``: IVF approximate-nearest-neighbor index (k-means
  coarse quantizer, probed-list search).
- ``textstats``: token counting, quality scoring, language ID,
  fingerprinting.
- ``temporal``: as-of join and bounded range join (sort-based /
  bucketed — no pair-space blow-up).
- ``sessionize``: inactivity-gap sessionization (lag + running-sum
  windows; streaming twin in ``streaming.windows``).
- ``ivm``: incremental view maintenance for decomposable rollups
  (fold only new files via the processed-file ledger).
- ``skew``: salted join / salted distinct-count for hot keys.
- ``multimodal``: binary media columns — real BMP/WAV header decode,
  deterministic media synthesis, Arrow-batched feature extraction
  (codec tiers stubbed).
- ``ann_pq``: product-quantization ANN (m-byte codes, asymmetric
  distance, exact re-rank).
- ``ann_index``: CDC-maintained ANN index — a managed table refreshed
  incrementally from the change feed under frozen quantizer state.
- ``sampling``: deterministic content-hash sampling / train-test
  splits + per-stratum corpus-mix rebalancing (engine- and
  layout-stable).
- ``masking``: governance masking — salted pseudonyms, digit masking,
  pattern redaction (engine-reproducible).
- ``retrieval``: Okapi BM25 top-k — single-query and per-query-table
  batch (the contamination-check shape).
- ``decontam``: exact n-gram eval-set decontamination (GPT-3/PaLM
  pre-training scrub).
- ``chunking``: fixed-size overlapping character windows per document
  (the intra-document half of training-data prep; RAG indexing).
- ``semdedup``: SemDeDup-style semantic dedup — frozen-centroid
  assignment + cluster-scoped keep-first cosine pruning.
"""
