"""Scalar function surface (SURVEY §2.9).

``dates``: CURRENT_DATE / DATEDIFF equivalents with injectable as-of
date for deterministic pipelines.
"""

from .dates import account_days, age_years, as_of_date

__all__ = ["account_days", "age_years", "as_of_date"]
