"""Table-format writer backends (the reference's pluggable
Hudi/Iceberg/Delta switch, re-derived — see ``base.TableFormat``).

``parquet_cow``: copy-on-write — merges rewrite affected files; plain
scans on read. ``parquet_mor``: merge-on-read — merges append delta
logs; reads reconcile; ``compact()`` repays the debt.
"""

from .base import TableFormat
from .parquet_cow import MergeError, ParquetCowTable, TableVersion, temp_warehouse
from .parquet_mor import ParquetMorTable

__all__ = [
    "MergeError",
    "ParquetCowTable",
    "ParquetMorTable",
    "TableFormat",
    "TableVersion",
    "temp_warehouse",
]
