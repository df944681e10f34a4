"""Benchmark harness: times the headline queries and prints ONE JSON line.

Contract (driver): run at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``, emit
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Timing method: each query is planned fresh and fully executed via a
count-style action that forces every operator (``df.write.format("noop")``
is not in OSS Spark; ``collect`` on small results is the honest cost the
driver also pays). Queries returning large row counts are drained with
``count()`` after a ``cache``-free run — we time end-to-end plan+execute.

Each query is timed ``SPARK_GRAFT_BENCH_RUNS`` times (default 3) and the
MEDIAN is reported: single-shot timings proved untrustworthy for
round-over-round deltas (one round showed ~15 unrelated queries drift
+35-48% in lockstep from environmental noise, indistinguishable from a
real regression at n=1). Every run re-plans from scratch — there is no
cross-run DataFrame caching — so the median measures the engine, not a
warm cache of results.

GATE-SHAPED queries (do not "optimize" these numbers): several entries
deliberately run a DEGENERATE setting whose output is provably exact so
the DuckDB oracle can hash-gate a lossy operator — their bench time is
the price of the exactness proof, not the production path's cost:

- ``emb_pq_knn`` re-ranks the WHOLE corpus exactly (shortlist == corpus)
  so ADC top-k ≡ brute force; production PQ scans m bytes/vector with a
  few-hundred-row re-rank (recall-gated in tests/test_ann_pq.py).
- ``emb_ivf_knn`` probes ALL lists (nprobe == k) so the probe set is
  exhaustive; production probes a handful (recall-gated in pytest).
- ``emb_ivf_batch_knn`` likewise probes exhaustively per query row.
- ``emb_top_pairs`` / ``emb_knn_brute`` are O(n^2)/O(n) exact twins that
  exist as oracles for the LSH/IVF scale paths (demoted from headline).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from automation_of_building_a_transactional_data_lake_spark.session import SessionFactory
from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unrecognized dir naming; timings still valid

    spark = SessionFactory(
        master=f"local[{cpus}]",
        app_name="tdl_bench",
        shuffle_partitions=max(cpus, 8),
    ).create()

    # Warm-up: JIT/codegen/classloading paths (parquet scan + shuffle +
    # agg) so the first timed query measures the engine, not JVM start.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()
    # ... and the Arrow/pandas worker pool, which otherwise bills its
    # one-time startup (~2s) to the first vectorized-UDF query.
    from pyspark.sql import functions as F  # noqa: PLC0415

    def _warm(s: pd.Series) -> pd.Series:
        return s

    warm_udf = F.pandas_udf(_warm, "long")
    spark.range(8).select(warm_udf("id")).collect()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            # Drain the full result: forces every operator including
            # final projections; small results so collect cost is
            # negligible vs execution.
            n = len(df.collect())
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread = f"[{min(runs):.3f}..{max(runs):.3f}]"
        print(
            f"# {name}: median {timings[name]}s of {n_runs} {spread} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    # The driver records only the LAST 2000 chars of stdout and parses
    # the JSON line out of that window — r8's record truncated because
    # the line outgrew it (BENCH_r08.json, "parsed": null). Compact
    # separators + a hard budget keep the artifact whole; growth past
    # the budget must force an explicit headline re-decision (mark a
    # subsumed query headline=False), never a silently clipped record.
    # Explicit raise, not assert: asserts vanish under `python -O`,
    # which would silently re-open the truncation this guards against.
    if len(line) > 1950:
        raise RuntimeError(
            f"bench JSON line is {len(line)} chars; the driver's stdout-tail "
            "capture holds 2000 — demote subsumed queries from headline "
            "(QueryDef headline=False) to shrink it"
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
