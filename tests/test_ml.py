"""ML surface (SURVEY §2.11): churn training + the three inference
paths must agree; the end-to-end query returns one row per customer
with orders."""

import pytest

from automation_of_building_a_transactional_data_lake_spark.ml.churn import (
    FEATURE_COLS,
    export_coefficients,
    score,
    score_with_coefficients,
    score_with_pandas_udf,
    train_churn_model,
)
from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import (
    QUERIES,
    customer_churn_features,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def churn_fixture(spark):
    features = customer_churn_features(spark, SF_SMOKE).cache()
    model = train_churn_model(features)
    yield features, model
    features.unpersist()


def test_model_learns_signal(churn_fixture):
    features, model = churn_fixture
    scored = score(model, features)
    rows = scored.select("churned", "churn_pred").collect()
    acc = sum(r.churned == r.churn_pred for r in rows) / len(rows)
    assert acc > 0.6  # better than chance on its own training set
    probs = [r.churn_prob for r in score(model, features).collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_three_inference_paths_agree(churn_fixture):
    features, model = churn_fixture
    coefs, intercept = export_coefficients(model)

    jvm = {r.c_custkey: r.churn_prob for r in score(model, features).collect()}
    expr = {
        r.c_custkey: r.churn_prob
        for r in score_with_coefficients(features, coefs, intercept, FEATURE_COLS).collect()
    }
    arrow = {
        r.c_custkey: r.churn_prob
        for r in score_with_pandas_udf(features, coefs, intercept, FEATURE_COLS).collect()
    }
    assert jvm.keys() == expr.keys() == arrow.keys()
    for k in jvm:
        assert jvm[k] == pytest.approx(expr[k], abs=1e-9)
        assert jvm[k] == pytest.approx(arrow[k], abs=1e-9)


def test_churn_predict_query_shape(spark):
    df = QUERIES["customer_churn_predict"].spark(spark, SF_SMOKE)
    n_features = customer_churn_features(spark, SF_SMOKE).count()
    assert df.count() == n_features
    assert set(df.columns) == {"c_custkey", "churned", "churn_pred", "churn_prob"}
