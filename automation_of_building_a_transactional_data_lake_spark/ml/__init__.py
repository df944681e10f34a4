"""Optional ML surface (SURVEY §2.11).

The reference's only UDF-shaped capability is the Redshift-ML churn
model: ``CREATE MODEL ... TARGET churn`` then the generated scalar
inference function ``ml_fn_player_churn_auto7``
(/root/reference/src/sample_redshift_ml_sql_query.txt:79-133). The
``churn`` module re-expresses both halves Spark-first: training via
``pyspark.ml`` (JVM-side), batch inference either via
``model.transform`` or an Arrow-vectorized pandas UDF over the
exported coefficients — the scalar-function call shape of the
reference, without shipping JVM model state to Python per row.
"""
