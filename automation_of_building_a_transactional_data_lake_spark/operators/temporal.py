"""Temporal join operators: as-of join and bounded range join.

Not in the reference's surface (SURVEY §2.7: "No theta/range/as-of
joins") — first-class additions for event/feature pipelines.

Both are built so the pair space never materializes and the only
shuffle is hash-partitioned on the join key:

- ``asof_join``: union both sides, one ranking window per key ordered
  by time, carry the most recent right row forward onto each left row
  (``last(..., ignorenulls=True)``). This is the sort-based as-of
  algorithm: one shuffle + one sort, no per-row probe, no range
  explosion. The naive alternative — non-equi join then keep the max
  right time per left row — builds an O(|L|·|R|/keys) intermediate.

- ``bounded_range_join``: |l.time - r.time| <= max_gap with equal
  keys. Times are bucketed to ``max_gap`` width; each LEFT row
  explodes to its bucket and the two neighbors (3 rows), the join is
  a plain equi-join on (key, bucket) with the exact predicate as a
  residual. Candidate fan-out is bounded by bucket occupancy, not
  |L|·|R|; at 100 TB this is the difference between a shuffle join
  and an impossible cross product. (Spark's own optimizer cannot do
  this rewrite — it plans non-equi conditions as BNLJ.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import col_is_ntz, epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right_time <= left_time`` and the same ``on`` key (left join —
    unmatched left rows keep nulls).

    Ties on ``right_time`` are broken by the greatest ``tiebreak``
    value (required for a deterministic result if right times can
    collide). Carried right columns are renamed ``<col><suffix>``.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]

    # Tag and align the two sides for a positional-safe unionByName.
    lt = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    order_cols = [F.col("__t"), F.col("__is_left")]
    rt = right.select(
        on,
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    ).withColumn("__is_left", F.lit(0))
    if tiebreak is not None:
        rt = rt.withColumn("__tie", F.col(f"__r_{tiebreak}"))
        lt = lt.withColumn("__tie", F.lit(None).cast(rt.schema["__tie"].dataType))
        order_cols.append(F.col("__tie"))

    u = lt.unionByName(rt, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal time (__is_left asc), so
    # right_time == left_time matches; among equal-time right rows the
    # greatest tiebreak sorts last and wins the carry-forward.
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for c in rcols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__is_left") == 1).drop(
        "__t", "__is_left", "__tie", *[f"__r_{c}" for c in rcols]
    )


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    max_gap_seconds: float,
    direction: str = "both",
) -> DataFrame:
    """Equi-key pairs with ``right_time`` within ``max_gap_seconds`` of
    ``left_time``. ``direction``: 'both' (|dt| <= gap), 'forward'
    (0 < dt <= gap, right strictly after left), or 'backward'
    (-gap <= dt < 0).

    Returns left columns + right columns (caller should pre-select /
    alias to avoid collisions).
    """
    if direction not in ("both", "forward", "backward"):
        raise ValueError(f"direction must be both|forward|backward, got {direction!r}")
    # All arithmetic in microsecond longs: exact boundary semantics
    # (double epoch-seconds carry ~0.1µs rounding error that can flip
    # rows sitting exactly on the gap boundary).
    gap_us = int(round(float(max_gap_seconds) * 1_000_000))
    ntz_l = col_is_ntz(left, left_time)
    ntz_r = col_is_ntz(right, right_time)

    def bucket(ts: Column, ntz: bool) -> Column:
        # floor division on longs (µs since epoch are positive here;
        # pmod keeps the floor semantics for pre-1970 times too).
        us = epoch_micros(ts, ntz)
        return ((us - F.pmod(us, F.lit(gap_us))) / F.lit(gap_us)).cast("long")

    # Only the buckets the direction can reach: 2x fan-out for
    # one-sided windows, 3x for symmetric.
    if direction == "forward":
        neighbors = [F.col("__lb"), F.col("__lb") + 1]
    elif direction == "backward":
        neighbors = [F.col("__lb") - 1, F.col("__lb")]
    else:
        neighbors = [F.col("__lb") - 1, F.col("__lb"), F.col("__lb") + 1]
    lb = left.withColumn("__lb", bucket(F.col(left_time), ntz_l)).withColumn(
        "__b", F.explode(F.array(*neighbors))
    )
    rb = right.withColumn("__b", bucket(F.col(right_time), ntz_r))

    dt = epoch_micros(right_time, ntz_r) - epoch_micros(left_time, ntz_l)
    if direction == "both":
        residual = F.abs(dt) <= gap_us
    elif direction == "forward":
        residual = (dt > 0) & (dt <= gap_us)
    else:
        residual = (dt < 0) & (-dt <= gap_us)

    joined = lb.join(rb, [on, "__b"]).filter(residual)
    return joined.drop("__lb", "__b")
