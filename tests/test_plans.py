"""Physical-plan regression guards: the plan SHAPES documented in
PLANS.md are asserted here so operator changes can't silently lose
pushdown, broadcast, or shuffle-reuse properties."""

import pytest


def _plan(df) -> str:
    # cold-scan plan: clear fixture caches so the scans under test stay
    # parquet scans (a materialized cache of the same read would resolve
    # to InMemoryTableScan and hide PushedFilters)
    df.sparkSession.catalog.clearCache()
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


def test_revenue_forecast_pushdown(spark, catalog):
    plan = _plan(catalog["revenue_forecast"](spark, SF))
    # every predicate is sargable and reaches the scan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.03)" in plan
    # pruned scan: 4 of 11 lineitem columns
    assert "l_partkey" not in plan and "l_returnflag" not in plan


def test_order_priority_returns_semi_join(spark, catalog):
    plan = _plan(catalog["order_priority_returns"](spark, SF))
    assert "LeftSemi" in plan  # EXISTS stays a semi-join, no row blowup


def test_spectral_embedding_stays_jvm(spark):
    """The Nyström embedding compiles to column expressions (no Arrow
    serde of passthrough columns) when l·d fits the term budget."""
    import numpy as np

    from dask_ml_spark.operators.cluster import SpectralClustering

    df = spark.range(100).selectExpr("cast(id as double) x0",
                                     "cast(id % 7 as double) x1")
    sc = SpectralClustering(n_clusters=2, n_components=20, gamma=0.5,
                            random_state=0)
    sample = np.random.RandomState(0).rand(20, 2)
    proj = np.random.RandomState(1).rand(20, 2)
    emb = sc._embed(df, ["x0", "x1"], sample, proj)
    plan = _plan(emb)
    assert "Python" not in plan and "Arrow" not in plan and "Exchange" not in plan


def test_local_supplier_volume_dims_broadcast(spark, catalog):
    plan = _plan(catalog["local_supplier_volume"](spark, SF))
    # supplier/nation/region arrive via broadcast; the equi-nation
    # predicate rides the supplier join, adding no extra exchange
    assert plan.count("BroadcastHashJoin") >= 3
    assert "c_nationkey = s_nationkey" in plan.replace("#", " #").lower() or "s_nationkey" in plan


def test_large_orders_preaggregates_before_join(spark, catalog):
    import re

    plan = _plan(catalog["large_orders"](spark, SF))
    # the quantity rollup + HAVING must run before any join so only
    # qualifying orderkeys reach the probe side: in the formatted plan's
    # node numbering the aggregate must appear before every join node
    nodes = re.findall(
        r"\(\d+\) (HashAggregate|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)",
        plan)
    assert "HashAggregate" in nodes
    joins = [i for i, n in enumerate(nodes) if n != "HashAggregate"]
    assert joins and nodes.index("HashAggregate") < min(joins)


def test_promo_revenue_single_scan(spark, catalog):
    import re

    plan = _plan(catalog["promo_revenue"](spark, SF))
    # numerator and denominator fold into ONE scan of lineitem
    # (numbered tree nodes only — the detail section repeats names)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2  # lineitem + part
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1


def test_stratified_sample_no_shuffle_filter(spark, catalog):
    from dask_ml_spark.datapipe.sampling import stratified_sample
    from dask_ml_spark.sources.io import load_table

    docs = load_table(spark, SF, "documents")
    kept = stratified_sample(docs, "lang", {"en": 0.5}, key_cols="doc_id")
    plan = _plan(kept)
    # pure filter: no Exchange anywhere in the sample itself
    assert "Exchange" not in plan


def test_event_funnel_single_shuffle(spark, catalog):
    plan = _plan(catalog["event_funnel"](spark, SF))
    # conditional-min funnel: one exchange for the per-user aggregate,
    # one single-partition exchange for the final 1-row rollup — and
    # crucially NO joins (the naive funnel is a 3-way self-join)
    assert "Join" not in plan
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_sales_cube_expands_once(spark, catalog):
    import re
    plan = _plan(catalog["sales_cube"](spark, SF))
    # all four grouping levels from ONE scan via Expand, not a union
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan and "Union" not in plan
