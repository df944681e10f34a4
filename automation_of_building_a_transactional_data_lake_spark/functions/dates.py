"""Date/time scalar functions (SURVEY §2.9).

The reference's downstream SQL computes ages and account lengths
against ``CURRENT_DATE`` (``src/sample_redshift_ml_sql_query.txt:15``,
SF5/SF7) — non-deterministic by construction. This module surfaces the
same functions with an injectable as-of date so the identical
expression is reproducible in tests and oracle comparisons and live in
production (pass ``None``).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_of_date(as_of: date | str | None = None) -> Column:
    """SF7: ``CURRENT_DATE`` when ``as_of`` is None, else the pinned
    date literal. Pinning makes every downstream feature deterministic
    without changing the expression shape."""
    if as_of is None:
        return F.current_date()
    return F.lit(str(as_of)).cast("date")


def age_years(dob: Column, as_of: date | str | None = None) -> Column:
    """SF5: ``DATEDIFF(YEAR, dob, CURRENT_DATE)``-equivalent age in
    whole years (reference ``src/sample_redshift_ml_sql_query.txt:15``)."""
    return F.floor(F.months_between(as_of_date(as_of), dob) / 12).cast("long")


def epoch_micros(ts: Column | str, ntz: bool = False) -> Column:
    """µs-since-epoch as a long, for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``unix_micros`` only accepts TIMESTAMP (LTZ); testdata vintages that
    write plain TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet load as
    NTZ and would fail analysis. Callers using the result for gap/bucket
    arithmetic need a strictly monotonic µs mapping; which expression
    delivers one depends on the input TYPE, hence the ``ntz`` flag:

    - ``ntz=False`` (TIMESTAMP/string input): ``unix_micros(cast)`` —
      instant-based, monotonic under any session time zone. The cast is
      a no-op on LTZ.
    - ``ntz=True`` (TIMESTAMP_NTZ input): wall-clock-as-UTC micros via
      tz-free FIELD extraction (unix_date + hour/minute/second). Casting
      NTZ through LTZ instead would interpret the wall clock in the
      session time zone — monotonic only when that zone is fixed-offset;
      under a DST zone, fall-back makes distinct wall clocks collide and
      spring-forward shifts nonexistent ones (both verified), producing
      wrong gaps/duplicate buckets with no warning. (``timestampdiff``
      against an NTZ epoch literal has the same DST hole — it converts
      through LTZ internally.)

    Operators that own the DataFrame should derive the flag with
    ``col_is_ntz(df, time_col)`` — expression-only call sites cannot see
    the schema, and no single expression is monotonic for both types.
    """
    c = ts if isinstance(ts, Column) else F.col(ts)
    if not ntz:
        return F.unix_micros(c.cast("timestamp"))
    return (
        F.unix_date(c.cast("date")) * F.lit(86_400_000_000)
        + F.hour(c).cast("long") * F.lit(3_600_000_000)
        + F.minute(c).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000)).cast("long")
    )


def col_is_ntz(df, col_name: str) -> bool:
    """True when ``col_name`` in ``df`` is TIMESTAMP_NTZ — the flag
    ``epoch_micros`` needs to pick a session-tz-independent expression."""
    return dict(df.dtypes).get(col_name) == "timestamp_ntz"


def account_days(first_login: Column, last_login: Column) -> Column:
    """SF5: ``DATEDIFF(DAY, first_login, last_login)`` (reference
    ``src/sample_redshift_ml_sql_query.txt:19``)."""
    return F.datediff(last_login.cast("date"), first_login.cast("date")).cast("long")
