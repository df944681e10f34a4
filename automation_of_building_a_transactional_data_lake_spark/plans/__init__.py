"""Query plans: the engine's declared analytic query surface.

``testdata_queries`` carries the (spark_fn, oracle_sql) pairs the
driver's correctness gate runs; ``analytics`` carries the reference's
downstream churn-feature workload re-expressed in Spark SQL.
"""
