"""Declarative table specifications.

Mirrors the reference's per-table config dicts (``cdk.json:61-86``,
parsed via ``ast.literal_eval`` at ``src/hudi/hudi-initial-load.py:118``):
``{'table_name': ..., 'primary_key': ..., 'partition_key': ...,
'precombine_key': ...}`` where the string ``"None"`` means absent.

Here a first-class dataclass with real Optionals, plus the columns the
CDC envelope contributes (``Op``, ``timestamp`` — observed in the
reference's demo CDC parquet, SURVEY §1.1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

# DMS-style CDC envelope column names (reference demo_data/cdc-load/*).
OP_COL = "Op"
TS_COL = "timestamp"
AUDIT_COL = "last_applied_date"  # reference src/hudi/hudi-cdc-load.py:93-95

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def _none_str(v: Any) -> str | None:
    """The reference encodes 'no key' as the literal string "None"
    (cdk.json:65-66); accept that plus real None."""
    if v is None or v == "None" or v == "":
        return None
    return str(v)


@dataclass(frozen=True)
class TableSpec:
    """Identity + layout metadata for one managed table.

    Attributes
    ----------
    table_name: logical table name within the database.
    primary_key: record-identity column used for upsert/delete matching
        (reference ``src/iceberg/iceberg-cdc-load.py:131``).
    partition_key: optional physical partition column
        (reference ``src/hudi/hudi-initial-load.py:68``).
    version_key: optional column ordering versions of the same key within
        a batch (reference Hudi ``precombine_key``,
        ``src/hudi/hudi-cdc-load.py:123``). For CDC batches this defaults
        to the envelope ``timestamp`` at dedup time.
    database: logical namespace (reference database ``game``).
    """

    table_name: str
    primary_key: str
    partition_key: str | None = None
    version_key: str | None = None
    database: str = "default"
    # Optional multi-column clustering for maintenance: maintain_all
    # compacts CoW tables with a Z-order layout on these columns so
    # footer-stats skipping prunes on each of them (SURVEY X30/X32).
    zorder_by: tuple[str, ...] | None = None
    # Optional CHECK constraints (Delta table-constraint equivalent):
    # SQL boolean expressions every written/merged row must satisfy;
    # a violating batch is rejected BEFORE any data is staged.
    constraints: tuple[str, ...] = ()
    # Optional per-file bloom-filter index columns (Delta/Parquet bloom
    # filter equivalent): high-cardinality columns probed by equality
    # where min/max footer stats can't prune (values spread across
    # every file's range). Each commit stores a compact per-file bitset
    # per listed column; `read_lookup_eq` opens only files whose bloom
    # might contain the probe value. CoW format only.
    bloom_filter_cols: tuple[str, ...] = ()
    # Optional Iceberg-style HIDDEN partitioning: a transform of a data
    # column ("days(ts)", "months(ts)", "years(ts)", "hours(ts)",
    # "bucket(16, id)", "truncate(4, code)") the layout partitions on
    # without the derived column ever appearing in query results.
    # Mutually exclusive with partition_key (which is identity
    # partitioning on a real column). CoW format only.
    partition_transform: str | None = None

    def __post_init__(self) -> None:
        if self.partition_key and self.partition_transform:
            raise ValueError(
                f"{self.table_name}: partition_key and partition_transform "
                "are mutually exclusive (a transform IS the partition spec)"
            )

    @classmethod
    def from_dict(cls, d: dict[str, Any], database: str = "default") -> "TableSpec":
        """Parse a reference-style config dict (cdk.json:61-86 shape)."""
        return cls(
            table_name=d["table_name"],
            primary_key=d["primary_key"],
            partition_key=_none_str(d.get("partition_key")),
            # Normalize each candidate BEFORE the fallback: the literal
            # string "None" (the reference's absent-encoding) is truthy
            # and would otherwise shadow a real version_key.
            version_key=_none_str(d.get("precombine_key")) or _none_str(d.get("version_key")),
            database=database,
            zorder_by=tuple(d["zorder_by"]) if d.get("zorder_by") else None,
            constraints=tuple(d.get("constraints") or ()),
            bloom_filter_cols=tuple(d.get("bloom_filter_cols") or ()),
            partition_transform=_none_str(d.get("partition_transform")),
        )

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.table_name}"

    @property
    def partition_keys(self) -> list[str]:
        return [self.partition_key] if self.partition_key else []


# The reference's demo `game` database (cdk.json:61-86), reproduced as
# engine-native specs; used by fixtures/tests.
GAME_SPECS: list[TableSpec] = [
    TableSpec("user_data", "user_id", None, None, "game"),
    TableSpec("item_data", "item_id", "category", None, "game"),
    TableSpec("play_data", "play_id", None, None, "game"),
    TableSpec("purchase_data", "purchase_id", None, None, "game"),
]

GAME_SPECS_BY_NAME: dict[str, TableSpec] = {s.table_name: s for s in GAME_SPECS}
