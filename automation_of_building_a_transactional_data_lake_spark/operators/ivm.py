"""Incremental view maintenance: keep a rollup table current by
folding in ONLY newly-arrived raw files.

The reference recomputes its downstream views from full table scans
on every run (the Redshift views in
``/root/reference/src/sample_redshift_ml_sql_query.txt:27-49`` have no
incremental path). For an append-only fact stream the rollup is a
decomposable aggregate, so maintenance cost should scale with the
NEW data, not the table: partial-aggregate the new batch, then
combine with the stored state (counts and sums add; mins/maxes fold).

Exactly-once: the processed-file set is NOT a side ledger — it is
committed **atomically with the rollup version** via the table
format's ``snapshot_meta`` (the set rides inside the staged version
directory, so the rename that publishes the data publishes the set).
There is no state window where "table updated, ledger not": a crash
before promote leaves no new version and no new processed set (the
re-run refolds the batch once); a crash after promote left both.
Rolling the table back to an older version automatically rolls the
processed set back with it. (Round-2 advisory: the previous
side-ledger design double-counted after a crash between
``overwrite()`` and ``ledger.commit()``.) Discovery still reuses
``FileLedger.discover`` (recursive raw-zone listing).

Scale: the expensive input scan touches only new files; the combine
re-aggregates |existing rollup| + |new partials| rows — for an
hourly rollup that is thousands of rows, not the 100 TB fact table.
avg is intentionally unsupported: store (sum, count) and derive —
the classic decomposability contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..formats.base import TableFormat
from ..sources.ledger import FileLedger

_PARTIAL_FNS = {"count", "sum", "min", "max", "approx_distinct"}
_COMBINE_FNS = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


@dataclass(frozen=True)
class AggCol:
    """One rollup measure: ``fn`` over ``src`` named ``out``.

    ``approx_distinct`` maintains COUNT(DISTINCT src) incrementally —
    impossible with scalar aggregates (distinct is not decomposable)
    but exact-for-the-sketch with mergeable HLL state: the stored
    column holds the binary sketch (``hll_sketch_agg``), refreshes
    fold new partials in with ``hll_union_agg`` (register-wise max —
    associative, commutative, idempotent, so the incremental sketch
    is IDENTICAL to a full single-pass recompute), and
    ``IncrementalRollup.estimates()`` projects the numeric estimate."""

    out: str
    fn: str  # count | sum | min | max | approx_distinct
    src: str | None = None  # ignored for count

    def __post_init__(self) -> None:
        if self.fn not in _PARTIAL_FNS:
            raise ValueError(
                f"{self.fn!r} is not decomposable here; supported: "
                f"{sorted(_PARTIAL_FNS)} (derive avg from sum/count)"
            )
        if self.fn != "count" and not self.src:
            raise ValueError(f"{self.fn} needs a src column")


class IncrementalRollup:
    """Maintains ``table`` = group-by rollup of every file ever seen
    under ``raw_dir``."""

    def __init__(
        self,
        table: TableFormat,
        raw_dir: str,
        group_cols: list[str],
        aggs: list[AggCol],
        prepare=None,
    ) -> None:
        self.table = table
        self.raw_dir = raw_dir
        self.group_cols = list(group_cols)
        self.aggs = list(aggs)
        self.prepare = prepare  # optional df->df hook (casts, derived keys)

    def processed(self) -> set[str]:
        """The processed-file set of the CURRENT table version — read
        from the snapshot's atomic metadata, never from a side file."""
        if not self.table.exists():
            return set()
        meta = self.table.snapshot_meta()
        return set(meta["processed_files"]) if meta else set()

    def _partial(self, df: DataFrame) -> DataFrame:
        exprs = []
        for a in self.aggs:
            if a.fn == "count":
                exprs.append(F.count("*").alias(a.out))
            elif a.fn == "approx_distinct":
                exprs.append(F.hll_sketch_agg(a.src).alias(a.out))
            else:
                exprs.append(getattr(F, a.fn)(a.src).alias(a.out))
        return df.groupBy(*self.group_cols).agg(*exprs)

    def _combine(self, df: DataFrame) -> DataFrame:
        exprs = [
            F.hll_union_agg(a.out).alias(a.out)
            if a.fn == "approx_distinct"
            else getattr(F, _COMBINE_FNS[a.fn])(a.out).alias(a.out)
            for a in self.aggs
        ]
        return df.groupBy(*self.group_cols).agg(*exprs)

    def estimates(self) -> DataFrame:
        """The rollup with sketch columns projected to their numeric
        estimates (other columns pass through)."""
        df = self.table.read()
        for a in self.aggs:
            if a.fn == "approx_distinct":
                df = df.withColumn(a.out, F.hll_sketch_estimate(F.col(a.out)))
        return df

    def refresh(self, spark: SparkSession) -> dict:
        """Fold new files in; returns {'new_files': n, 'rollup_rows': m}."""
        done = self.processed()
        files = [p for p in FileLedger.discover(self.raw_dir) if p not in done]
        if not files:
            rows = self.table.read().count() if self.table.exists() else 0
            return {"new_files": 0, "rollup_rows": rows}

        batch = spark.read.parquet(*files)
        if self.prepare is not None:
            batch = self.prepare(batch)
        partial = self._partial(batch)

        # The updated processed set commits in the SAME atomic rename
        # that publishes the new rollup version — exactly-once.
        meta = {"processed_files": sorted(done | set(files))}
        if self.table.exists():
            merged = self._combine(self.table.read().unionByName(partial))
            self.table.overwrite(merged, snapshot_meta=meta)
        else:
            # First batch: partials ARE the rollup.
            self.table.create(partial, snapshot_meta=meta)
        return {"new_files": len(files), "rollup_rows": self.table.read().count()}
