"""Query plans: the engine's declared analytic query surface.

``testdata_queries`` carries the (spark_fn, oracle_sql) pairs the
driver's correctness gate runs — including the reference's downstream
churn-feature workload (``customer_churn_features``) and the
end-to-end CDC pipeline check (``game_user_cdc_e2e``).
``analytics`` extends the surface with outer-join / EXISTS /
scalar-subquery / distinct-aggregate / batch-kNN shapes; its entries
merge into the same ``QUERIES`` registry.
"""
