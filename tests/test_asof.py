"""As-of join semantics: hand-checked example + conventions (backward,
>=, per-key isolation, null when no earlier right row)."""

from __future__ import annotations

from ocr_engine_spark.functions.asof import as_of_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d"), (3, 9, "e")],
        "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 8, 300.0)],
        "k long, rt long, price double")
    out = {r.name: r.price for r in as_of_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        value_cols=["price"]).collect()}
    assert out == {
        "a": 100.0,   # equal ts matches (>= convention)
        "b": 100.0,   # 15 > 10 -> still the ts=5 quote
        "c": 200.0,   # latest quote <= 20
        "d": None,    # right exists but only later (8 > 7)
        "e": None,    # no right rows for key 3
    }


def test_asof_plan_is_one_shuffle(spark):
    left = spark.range(100).selectExpr("id as k", "id as t")
    right = spark.range(50).selectExpr("id as k", "id as rt",
                                       "id * 1.0 as price")
    df = as_of_join(left, right, on="k", left_ts="t", right_ts="rt",
                    value_cols=["price"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1   # one shuffle on the key
    assert "CartesianProduct" not in plan
