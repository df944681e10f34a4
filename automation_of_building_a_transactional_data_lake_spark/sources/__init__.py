"""Data sources.

``ledger``: processed-file manifest giving only-new-files incremental
scans (the reference's Glue job bookmark, S3 in SURVEY §2.1).
"""

from .ledger import FileLedger

__all__ = ["FileLedger"]
