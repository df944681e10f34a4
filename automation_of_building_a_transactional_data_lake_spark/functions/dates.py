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


def epoch_micros(ts: Column | str) -> Column:
    """µs-since-epoch as a long, for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``unix_micros`` only accepts TIMESTAMP (LTZ); testdata vintages that
    write plain TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet load as
    NTZ and would fail analysis. The cast is a no-op on LTZ and
    interprets NTZ wall-clock in the session time zone — the engine pins
    UTC (``session.SessionFactory``), and every caller uses the result
    for gap/bucket arithmetic where any strictly monotonic µs mapping is
    correct.
    """
    c = ts if isinstance(ts, Column) else F.col(ts)
    return F.unix_micros(c.cast("timestamp"))


def account_days(first_login: Column, last_login: Column) -> Column:
    """SF5: ``DATEDIFF(DAY, first_login, last_login)`` (reference
    ``src/sample_redshift_ml_sql_query.txt:19``)."""
    return F.datediff(last_login.cast("date"), first_login.cast("date")).cast("long")
