"""PySpark-native transactional data-lake engine.

A from-scratch re-expression of the capabilities of
``aws-samples/automation-of-building-a-transactional-data-lake``
(see SURVEY.md): initial full load of raw parquet drops into
transactional tables, CDC (insert/update/delete) micro-batch apply with
latest-record dedup, a pluggable table-format writer backend, catalog
helpers, maintenance (compaction/vacuum), and a downstream analytics
surface — plus large-scale training-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns).

Everything is Spark DataFrame/SQL-first: the logical plan is declared
declaratively and Catalyst/Tungsten pick the physical strategy. Python
UDFs appear only where built-in operators cannot express the semantics,
and then always as Arrow-batched Pandas UDFs.
"""

__version__ = "0.1.0"

from .session import SessionFactory, get_session
from .spec import TableSpec

__all__ = ["SessionFactory", "TableSpec", "get_session", "__version__"]
