"""Iceberg-style partition transforms (hidden partitioning).

The reference's Iceberg tables could declare ``PARTITIONED BY
(days(ts))`` and get pruning from plain ``ts`` predicates without a
user-visible partition column; its Hudi/Delta twins fake it with
materialized derivation columns. This module provides the same
capability natively: a :class:`PartitionTransform` parsed from a spec
string ("days(ts)", "bucket(16, id)", ...) supplies

- ``expr()``     — the Spark Column deriving the partition value at
  WRITE time (the derived column lives only in hive directory names,
  never in data files or query results);
- ``literal(v)`` — the same transform applied driver-side to a Python
  literal, used to turn a predicate on the SOURCE column into a
  partition-range filter at READ time (monotonic transforms only);
- ``monotonic``  — whether source order is preserved (every temporal
  and truncate transform; ``bucket`` is not, it supports equality
  lookups instead).

Scale: this is what makes a 100 TB event table readable — the layout
clusters by ``days(ts)`` while every query keeps filtering on ``ts``;
the engine maps the time range onto partition directories and the scan
opens O(days-in-range) directories instead of O(table). Transform
derivation is one codegen'd expression per written row; read-side
mapping is pure driver arithmetic on the predicate bounds.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_TEMPORAL_KINDS = {
    # kind -> (date_format pattern or None-for-to_date, python formatter)
    "days": (None, lambda d: d.strftime("%Y-%m-%d")),
    "months": ("yyyy-MM", lambda d: d.strftime("%Y-%m")),
    "years": ("yyyy", lambda d: d.strftime("%Y")),
    "hours": ("yyyy-MM-dd-HH", lambda d: d.strftime("%Y-%m-%d-%H")),
}

_SPEC_RE = re.compile(
    r"^\s*(?P<kind>days|months|years|hours|bucket|truncate)\s*\(\s*"
    r"(?:(?P<param>\d+)\s*,\s*)?(?P<col>\w+)\s*\)\s*$"
)


@dataclass(frozen=True)
class PartitionTransform:
    kind: str
    source: str
    param: int | None

    @property
    def name(self) -> str:
        """Derived partition column name (Iceberg convention:
        ``<col>_<transform>``) — only ever visible as a hive directory
        segment."""
        return f"{self.source}_{self.kind}"

    @property
    def monotonic(self) -> bool:
        return self.kind != "bucket"

    def expr(self, source_dtype: str | None = None) -> Column:
        """Write-side derivation of the partition value. ``truncate``
        needs the source column's Spark dtype (string vs integral) to
        pick prefix-vs-floor semantics at PLAN time — a runtime CASE
        would force both branches to a common string type and destroy
        numeric partition ordering."""
        c = F.col(self.source)
        if self.kind == "days":
            return F.to_date(c)
        if self.kind in _TEMPORAL_KINDS:
            return F.date_format(c, _TEMPORAL_KINDS[self.kind][0])
        if self.kind == "bucket":
            return F.pmod(F.xxhash64(c), F.lit(self.param)).cast("int")
        if source_dtype == "string":
            return F.substring(c, 1, self.param)
        if source_dtype in ("tinyint", "smallint", "int", "bigint"):
            return (F.floor(c / F.lit(self.param)) * F.lit(self.param)).cast("long")
        raise TypeError(
            f"truncate({self.param}, {self.source}) requires a string or "
            f"integral source column, got {source_dtype}"
        )

    def literal(self, v, source_dtype: str | None = None):
        """The transform applied to a Python literal — maps a bound on
        the source column onto the partition domain. Only meaningful
        for monotonic transforms (bucket raises)."""
        if self.kind == "bucket":
            raise ValueError("bucket is not monotonic; use an equality lookup")
        if self.kind in _TEMPORAL_KINDS:
            if isinstance(v, str):
                v = _dt.datetime.fromisoformat(v)
            if self.kind == "days":
                return v.date() if isinstance(v, _dt.datetime) else v
            return _TEMPORAL_KINDS[self.kind][1](v)
        if isinstance(v, str):
            return v[: self.param]
        return int(v // self.param) * self.param


def parse_transform(spec_str: str) -> PartitionTransform:
    """Parse ``"days(ts)"`` / ``"bucket(16, id)"`` / ``"truncate(4,
    code)"`` into a :class:`PartitionTransform`. Raises ``ValueError``
    on anything else — a typo'd layout spec must fail table creation,
    not silently fall back to unpartitioned."""
    m = _SPEC_RE.match(spec_str)
    if not m:
        raise ValueError(
            f"unparseable partition transform {spec_str!r}; expected "
            "days|months|years|hours(col), bucket(N, col) or truncate(W, col)"
        )
    kind, param, col = m.group("kind"), m.group("param"), m.group("col")
    if kind in ("bucket", "truncate"):
        if not param or int(param) <= 0:
            raise ValueError(f"{kind} transform requires a positive integer parameter")
        return PartitionTransform(kind, col, int(param))
    if param:
        raise ValueError(f"{kind} transform takes no integer parameter")
    return PartitionTransform(kind, col, None)
