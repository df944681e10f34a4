"""Table-format writer backends.

``parquet_cow``: versioned copy-on-write parquet tables with atomic
version-pointer commits — the engine's native stand-in for the
reference's Hudi/Iceberg/Delta backends (their jars are unavailable
here; the write protocol is re-derived, see module docstring).
"""

from .parquet_cow import MergeError, ParquetCowTable, TableVersion, temp_warehouse

__all__ = ["MergeError", "ParquetCowTable", "TableVersion", "temp_warehouse"]
