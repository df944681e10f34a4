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


def test_create_model_sql_text_surface(spark, tmp_path):
    """The reference's Redshift-ML statements as literal text
    (src/sample_redshift_ml_sql_query.txt:80-133): CREATE MODEL ...
    TARGET ... FUNCTION ... (IAM_ROLE/SETTINGS accepted and ignored),
    SHOW MODEL, and prediction as a registered SQL function — the
    function's output must agree with the codegen coefficient path on
    every row, and a FRESH LakeSQL instance predicts after one SHOW
    MODEL (warehouse-persisted registry)."""
    from automation_of_building_a_transactional_data_lake_spark.catalog import (
        Catalog,
    )
    from automation_of_building_a_transactional_data_lake_spark.sql import LakeSQL

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    lake = LakeSQL(cat)
    feats = customer_churn_features(spark, SF_SMOKE)
    from automation_of_building_a_transactional_data_lake_spark.spec import (
        TableSpec,
    )

    spec = TableSpec("churn_features", "c_custkey", None, None, "ml")
    cat.table(spec).create(feats)

    out = lake.sql(
        "CREATE MODEL churn_auto FROM ("
        "  SELECT n_orders, total_spent, account_days, churned"
        "  FROM lake.ml.churn_features"
        ") TARGET churned FUNCTION ml_fn_churn "
        "IAM_ROLE default SETTINGS (S3_BUCKET 'ignored-bucket')"
    )
    assert out["action"] == "create_model"
    assert out["features"] == ["n_orders", "total_spent", "account_days"]

    pred = lake.sql(
        "SELECT c_custkey, ml_fn_churn(n_orders, total_spent, account_days)"
        " AS p FROM lake.ml.churn_features"
    )
    rows = {r.c_custkey: r.p for r in pred.collect()}
    assert rows and all(0.0 <= p <= 1.0 for p in rows.values())

    # SHOW MODEL exposes the coefficients; the codegen path (B) over
    # them must reproduce the SQL function's output exactly-ish.
    import json as _json

    meta = {r.key: r.value for r in lake.sql("SHOW MODEL churn_auto").collect()}
    coefs = _json.loads(meta["coefficients"])
    intercept = float(_json.loads(meta["intercept"]))
    pb = score_with_coefficients(feats, coefs, intercept)
    want = {r.c_custkey: r.churn_prob for r in pb.collect()}
    assert all(abs(rows[k] - want[k]) < 1e-9 for k in want)

    # Fresh instance: SHOW MODEL re-registers the prediction function.
    lake2 = LakeSQL(Catalog(spark, wh))
    lake2.sql("SHOW MODEL churn_auto")
    again = lake2.sql(
        "SELECT ml_fn_churn(n_orders, total_spent, account_days) AS p "
        "FROM lake.ml.churn_features"
    )
    assert again.count() == len(want)

    with pytest.raises(KeyError, match="no model"):
        lake2.sql("SHOW MODEL nonexistent")
