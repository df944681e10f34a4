"""Churn model training + batch inference (SURVEY §2.11).

Reference parity: ``CREATE MODEL player_churn_auto_model ... TARGET
churn`` and the generated inference function
(/root/reference/src/sample_redshift_ml_sql_query.txt:79-133).

Spark-first design:
- training: ``pyspark.ml`` Pipeline (VectorAssembler +
  LogisticRegression) — distributed LBFGS, no Python in the loop;
- inference path A: ``model.transform`` — JVM-side, the fast path;
- inference path B: ``score_with_coefficients`` — a pure-column
  sigmoid expression over the exported coefficients. Usable on a
  session with no model object (the reference's "scalar function"
  call shape) and it stays inside whole-stage codegen;
- inference path C: ``score_with_pandas_udf`` — the same sigmoid as
  an Arrow-vectorized pandas UDF, the template for models whose
  scoring genuinely needs Python (sklearn/xgboost et al.). Batched,
  never row-at-a-time.

At 100 TB: training runs on an aggregated feature table (rows =
|customers|, not |facts|); inference is embarrassingly parallel and
shuffle-free in all three paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = ["n_orders", "total_spent", "account_days"]
LABEL_COL = "churned"


def train_churn_model(
    features: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = LABEL_COL,
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    """Fit assembler+LR; returns a PipelineModel.

    LogisticRegression standardizes internally but reports
    coefficients in the original feature space, so the exported
    (coefficients, intercept) reproduce ``transform`` exactly.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = feature_cols or FEATURE_COLS
    assembler = VectorAssembler(inputCols=cols, outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[assembler, lr]).fit(features)


def export_coefficients(model) -> tuple[list[float], float]:
    """(coefficients, intercept) of the fitted LR stage — the portable
    form of the model (reference: the generated scalar fn)."""
    lr = model.stages[-1]
    return list(lr.coefficients.toArray()), float(lr.intercept)


def score(model, df: DataFrame, prob_col: str = "churn_prob", pred_col: str = "churn_pred") -> DataFrame:
    """Path A: JVM ``model.transform``; keeps only scalar outputs."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        prob_col, vector_to_array(F.col("probability")).getItem(1)
    ).withColumn(pred_col, F.col("prediction").cast("int")).drop(
        "features", "rawPrediction", "probability", "prediction"
    )


def _logit(coefficients: list[float], intercept: float, feature_cols: list[str]) -> Column:
    if len(coefficients) != len(feature_cols):
        raise ValueError(
            f"{len(coefficients)} coefficients for {len(feature_cols)} "
            f"feature columns {feature_cols} — zip would silently truncate"
        )
    z = F.lit(intercept)
    for c, name in zip(coefficients, feature_cols):
        z = z + F.lit(c) * F.col(name).cast("double")
    return z


def score_with_coefficients(
    df: DataFrame,
    coefficients: list[float],
    intercept: float,
    feature_cols: list[str] | None = None,
    prob_col: str = "churn_prob",
    pred_col: str = "churn_pred",
) -> DataFrame:
    """Path B: sigmoid as a built-in column expression — codegen'd,
    zero Python at runtime."""
    cols = feature_cols or FEATURE_COLS
    z = _logit(coefficients, intercept, cols)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(prob_col, prob).withColumn(
        pred_col, (F.col(prob_col) > 0.5).cast("int")
    )


def score_with_pandas_udf(
    df: DataFrame,
    coefficients: list[float],
    intercept: float,
    feature_cols: list[str] | None = None,
    prob_col: str = "churn_prob",
    pred_col: str = "churn_pred",
) -> DataFrame:
    """Path C: Arrow-batched pandas UDF — the pattern for Python-only
    models. Each batch arrives as pandas Series; the arithmetic is
    numpy-vectorized (never per-row)."""
    import pandas as pd  # noqa: F401 — signature typing
    from pyspark.sql.functions import pandas_udf

    cols = feature_cols or FEATURE_COLS
    coefs = list(coefficients)
    if len(coefs) != len(cols):
        raise ValueError(
            f"{len(coefs)} coefficients for {len(cols)} feature columns {cols}"
        )
    b = float(intercept)

    @pandas_udf("double")
    def _sigmoid(*series):
        import numpy as np

        z = b
        for c, s in zip(coefs, series):
            z = z + c * s.astype("float64")
        return 1.0 / (1.0 + np.exp(-z))

    out = df.withColumn(prob_col, _sigmoid(*[F.col(c) for c in cols]))
    return out.withColumn(pred_col, (F.col(prob_col) > 0.5).cast("int"))
