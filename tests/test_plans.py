"""Physical-plan regression guards: the plan SHAPES documented in
PLANS.md are asserted here so operator changes can't silently lose
pushdown, broadcast, or shuffle-reuse properties."""

import pytest


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def catalog():
    from dask_ml_spark.plans.queries import build_catalog

    qs, _ = build_catalog()
    return qs


SF = "/root/testdata/sf0.001"


def test_pricing_summary_pushdown(spark, catalog):
    plan = _plan(catalog["pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column-pruned scan: the unused key columns never reach the scan
    assert "l_partkey" not in plan and "l_suppkey" not in plan


def test_top_revenue_nations_broadcasts(spark, catalog):
    plan = _plan(catalog["top_revenue_nations"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # dims broadcast, never SMJ
    assert "SortMergeJoin" not in plan


def test_scaler_transform_is_pure_projection(spark, catalog):
    plan = _plan(catalog["standard_scaler_transform"](spark, SF))
    # fitted state folds into literals: no exchange, no python, no join
    assert "Exchange" not in plan
    assert "Python" not in plan and "Join" not in plan


def test_sessionization_shares_one_shuffle(spark, catalog):
    plan = _plan(catalog["event_sessionization"](spark, SF))
    # both windows and the final agg reuse one hash partitioning
    # (formatted output lists each node twice: tree + details)
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Window") == 2


def test_rbf_kernel_small_y_stays_jvm(spark, catalog):
    plan = _plan(catalog["rbf_kernel_to_centers"](spark, SF))
    assert "Python" not in plan and "Arrow" not in plan
