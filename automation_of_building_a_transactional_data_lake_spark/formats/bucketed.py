"""Bucketed session-catalog tables: shuffle-free co-located joins.

The reference's Hudi backend hash-distributes each table into file
groups by record key (``hoodie.datasource.write.recordkey.field`` —
``/root/reference/src/hudi/hudi-initial-load.py:70-75``) but its
query engines never exploit that layout. Spark's native bucketing
closes the loop: ``bucketBy(n, key)`` at write time records the hash
distribution in the catalog, and every later equi-join or aggregate
on the bucket key reads that distribution instead of shuffling.

At 100 TB this is the single biggest join optimization available:
a fact-fact join on a shared bucket key is a zero-Exchange
sort-merge join — the shuffle that would dominate the job simply
does not exist. Rules for it to kick in (asserted in
tests/test_bucketed.py):

- both sides bucketed on the join key with the SAME bucket count
  (or an integer multiple, Spark 3.1+ bucket coalescing);
- bucket count sized so one bucket of the LARGER table fits an
  executor core's working set (~128-256 MB parquet per bucket);
- ``sortBy`` the same key so the SMJ reads pre-sorted buckets.

Unlike the path-based CoW/MoR formats (same package), bucketed
tables live in the session catalog (``saveAsTable``) because the
bucket metadata IS catalog state — there is nothing to record in a
path-only layout Spark would trust on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BucketedTables:
    """Manager for bucketed tables in one catalog database."""

    def __init__(self, spark: SparkSession, database: str = "bucketed") -> None:
        self.spark = spark
        self.database = database
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

    def _qualified(self, name: str) -> str:
        return f"{self.database}.{name}"

    def create(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str,
        n_buckets: int,
        mode: str = "errorifexists",
    ) -> None:
        """Write ``df`` as a parquet table bucketed+sorted by
        ``bucket_col``. ``sortBy`` the bucket key makes later
        merge-joins read presorted data."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        (
            df.write.format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .mode(mode)
            .saveAsTable(self._qualified(name))
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.table(self._qualified(name))

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._qualified(name))

    def drop(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._qualified(name)}")
