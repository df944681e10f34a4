"""CDC batch operators: latest-record dedup, Op routing, audit column.

The reference implements latest-record dedup as an unbounded-range
window max + equality filter
(``src/hudi/hudi-cdc-load.py:79-90``, identically in the iceberg/delta
variants): ``max(timestamp) over (partition by pk)`` then
``filter(timestamp = max_op_date)``. That formulation keeps ALL rows at
the per-key max timestamp, so equal-timestamp duplicates survive and a
downstream MERGE would see multiple source rows per key (it throws).

This engine's formulation (SURVEY §7.4.1, an intentional divergence):
``row_number() over (partition by pk order by ts DESC, op_rank DESC,
<tiebreakers>) == 1`` — exactly one row per key, deterministic, and the
op-rank (I < U < D) makes a simultaneous update+delete resolve to
delete. Physically this is the same single hash shuffle on the key; the
running row_number needs no full-partition frame, so it is strictly
cheaper than the reference's unbounded range max at scale.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..spec import AUDIT_COL, OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE, TS_COL

_ROW_NUM_COL = "__rn"


def op_rank(op_col: str = OP_COL) -> Column:
    """Deterministic ordering of simultaneous ops: I(0) < U(1) < D(2).

    Higher rank wins a timestamp tie — a key that is both updated and
    deleted at the same instant resolves to deleted.
    """
    return (
        F.when(F.col(op_col) == OP_DELETE, F.lit(2))
        .when(F.col(op_col) == "U", F.lit(1))
        .otherwise(F.lit(0))
    )


def dedupe_latest(
    df: DataFrame,
    key: str | list[str],
    ts_col: str = TS_COL,
    op_col: str | None = None,
    tiebreakers: list[Column] | None = None,
) -> DataFrame:
    """Keep exactly one row per key: the one with the greatest
    ``ts_col``, ties broken by op-rank (if ``op_col`` given) then by
    ``tiebreakers`` (callers should supply a unique column for full
    determinism).

    Replaces reference ``src/hudi/hudi-cdc-load.py:79-90`` (window max +
    filter) with single-pass row_number dedup. One shuffle on ``key``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col).desc()]
    if op_col is not None:
        order.append(op_rank(op_col).desc())
    order.extend(tiebreakers or [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_ROW_NUM_COL, F.row_number().over(w))
        .filter(F.col(_ROW_NUM_COL) == 1)
        .drop(_ROW_NUM_COL)
    )


def recombine_ops(df: DataFrame, op_col: str = OP_COL) -> DataFrame:
    """The reference's I-branch vs U/D-branch split and ``unionAll``
    recombination (F2 literal equality, F3 IN-list, U1 union —
    ``src/hudi/hudi-cdc-load.py:88-91``):

        newInsertedDF = filter("Op = 'I'")
        updatedOrDeletedDF = filter("Op IN ('U','D')")
        finalInputDF = newInsertedDF.unionAll(updatedOrDeletedDF)

    Semantically a partition-and-reassemble of the same set (SURVEY
    §3.2); kept as a real operator for parity, and Catalyst collapses
    the union of two filters over one child into a single scan, so it
    costs nothing at any scale.
    """
    new_inserted = df.filter(F.col(op_col) == OP_INSERT)
    updated_or_deleted = df.filter(F.col(op_col).isin(OP_UPDATE, OP_DELETE))
    return new_inserted.unionAll(updated_or_deleted)


def split_ops(df: DataFrame, op_col: str = OP_COL) -> tuple[DataFrame, DataFrame]:
    """Route a deduped CDC batch into (upserts, deletes).

    Mirrors the reference's ``Op != 'D'`` / ``Op = 'D'`` split
    (``src/iceberg/iceberg-cdc-load.py:125,142``). The envelope column
    is retained; writers drop it (reference drops via ``P2``).
    """
    upserts = df.filter(F.col(op_col) != OP_DELETE)
    deletes = df.filter(F.col(op_col) == OP_DELETE)
    return upserts, deletes


def op_telemetry(df: DataFrame, op_col: str = OP_COL) -> dict[str, int]:
    """Single-pass I/U/D counts.

    The reference runs four separate ``count()`` actions per batch
    (``src/hudi/hudi-cdc-load.py:97-100``) — four full jobs. One
    groupBy pass is the 100-TB-scale fix (SURVEY §4 'redundant
    actions').
    """
    rows = df.groupBy(op_col).count().collect()
    counts = {r[op_col]: r["count"] for r in rows}
    counts["total"] = sum(counts.values())
    return counts


def with_audit_column(
    df: DataFrame,
    clock: datetime | None = None,
    col_name: str = AUDIT_COL,
) -> DataFrame:
    """Append the processing-time audit stamp.

    The reference injects ``datetime.now()`` directly
    (``src/hudi/hudi-cdc-load.py:93-95``) — non-deterministic and
    untestable; here the clock is injectable (SURVEY §7.4.2).
    """
    now = clock or datetime.now(timezone.utc)
    stamp = now.strftime("%Y-%m-%d %H:%M:%S")
    return df.withColumn(col_name, F.to_timestamp(F.lit(stamp)))


def cast_envelope_timestamp(df: DataFrame, ts_col: str = TS_COL) -> DataFrame:
    """Ensure the CDC envelope change-time column is a real timestamp
    (reference ``src/hudi/hudi-cdc-load.py:76``). No-op when already
    typed."""
    return df.withColumn(ts_col, F.to_timestamp(F.col(ts_col)))
