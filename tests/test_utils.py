"""Public utility surface (reference dask_ml/utils.py exports)."""

import numpy as np
import pytest

from dask_ml_spark.utils import (
    assert_estimator_equal,
    check_random_state,
    ensure_min_partitions,
    handle_zeros_in_scale,
)


def test_handle_zeros_in_scale():
    assert handle_zeros_in_scale(0.0) == 1.0
    assert handle_zeros_in_scale(2.5) == 2.5
    out = handle_zeros_in_scale(np.array([0.0, 3.0]))
    np.testing.assert_array_equal(out, [1.0, 3.0])


def test_check_random_state():
    assert check_random_state(7).randint(100) == np.random.RandomState(7).randint(100)
    rs = np.random.RandomState(1)
    assert check_random_state(rs) is rs
    assert isinstance(check_random_state(None), np.random.RandomState)
    with pytest.raises(TypeError):
        check_random_state("nope")


def test_assert_estimator_equal():
    class E:
        pass

    a, b = E(), E()
    a.mean_ = np.array([1.0, 2.0])
    b.mean_ = np.array([1.0, 2.0 + 1e-10])
    a.classes_ = np.array(["x", "y"])
    b.classes_ = np.array(["x", "y"])
    assert_estimator_equal(a, b, atol=1e-8)
    b.mean_ = np.array([1.0, 3.0])
    with pytest.raises(AssertionError):
        assert_estimator_equal(a, b)


def test_ensure_min_partitions_noop_when_enough(spark):
    df = spark.range(1000).repartition(64)
    assert ensure_min_partitions(df).rdd.getNumPartitions() == 64
    small = spark.range(10).coalesce(1)
    assert ensure_min_partitions(small).rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join without a shuffle."""
    from pyspark.sql import functions as F

    from dask_ml_spark.sources.io import write_bucketed

    a = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn("x", F.rand(1))
    b = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn("y", F.rand(2))
    write_bucketed(a, "bk_a", 8, "k", sort_cols="k", path=str(tmp_path / "a"))
    write_bucketed(b, "bk_b", 8, "k", sort_cols="k", path=str(tmp_path / "b"))
    joined = (
        spark.table("bk_a").hint("merge").join(spark.table("bk_b"), "k")
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan
    assert joined.count() == 10000
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from dask_ml_spark.utils import salted_join

    # skewed left: 90% of rows share key 7
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    want = left.join(right, "k").groupBy("k").count().toPandas()
    want = want.sort_values("k").reset_index(drop=True)
    # every hot_keys mode must match the plain join byte-for-byte:
    # auto-detection (fair-share threshold finds key 7), an explicit
    # hot list, the no-hot-keys degenerate, and the replicate-all
    # demonstration form
    for mode in ({"hot_keys": "auto"}, {"hot_keys": [7]},
                 {"hot_keys": []}, {"hot_keys": "all"},
                 {"hot_keys": "auto", "hot_threshold": 100}):
        got = (salted_join(left, right, "k", n_salt=8, **mode)
               .groupBy("k").count().toPandas()
               .sort_values("k").reset_index(drop=True))
        assert got.equals(want), mode


def test_salted_join_hot_key_replication(spark):
    """Hot-key-only salting must NOT replicate cold right rows: the
    salted branch carries only the hot key's right rows, the cold
    branch joins unsalted (the r8-verdict fix — the naive form
    multiplied right shuffle volume n_salt x for every key)."""
    import pytest
    from pyspark.sql import functions as F

    from dask_ml_spark.utils import salted_join

    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"))
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    out = salted_join(left, right, "k", n_salt=8, hot_keys=[7])
    # answer identity incl. row multiplicity
    assert out.count() == left.join(right, "k").count()
    # the plan's salted branch explodes ONE right row (k=7), not 50:
    # total right-side rows entering joins = 49 cold + 8 replicas
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Union" in plan  # hot + cold branches really both exist
    # left join keeps null-key left rows exactly once (cold branch)
    left_n = left.withColumn(
        "k", F.when(F.col("v") == 0, None).otherwise(F.col("k")))
    lj = salted_join(left_n, right, "k", n_salt=8, hot_keys=[7], how="left")
    assert lj.count() == 2000
    assert lj.where(F.col("k").isNull()).count() == 1
    # the driver-collected hot list is bounded
    with pytest.raises(ValueError, match="max_hot_keys"):
        salted_join(left, right, "k", hot_keys="auto", hot_threshold=0,
                    max_hot_keys=5)


def test_check_array_validates_schema(spark):
    import pytest

    from dask_ml_spark.utils import check_array

    df = spark.range(10).selectExpr("cast(id as double) x", "cast(id as string) s")
    assert check_array(df, ["x"]) is df
    assert check_array(df) is df  # auto-resolves numeric columns
    with pytest.raises(ValueError, match="Non-numeric|numeric"):
        check_array(df, ["s"])
    with pytest.raises(TypeError):
        check_array([[1, 2]], None)


def test_check_array_finite_scan(spark):
    import pytest

    from dask_ml_spark.utils import check_array

    df = spark.sql("SELECT * FROM VALUES (1.0), (double('nan')) t(x)")
    with pytest.raises(ValueError, match="NaN"):
        check_array(df, ["x"], ensure_all_finite=True)
    ok = spark.sql("SELECT * FROM VALUES (1.0), (2.0) t(x)")
    check_array(ok, ["x"], ensure_all_finite=True)


def test_check_X_y(spark):
    import pytest

    from dask_ml_spark.utils import check_X_y

    df = spark.range(10).selectExpr("cast(id as double) x", "cast(id % 2 as double) label")
    assert check_X_y(df, "label", ["x"]) is df
    with pytest.raises(ValueError, match="Label column"):
        check_X_y(df, "nope", ["x"])


def test_check_chunks():
    import pytest

    from dask_ml_spark.utils import check_chunks

    assert check_chunks(1000, 5, chunks=4) == (250, 5)
    assert check_chunks(100, 5, chunks=50) == (100, 5)  # 100-row floor
    assert check_chunks(0, 3, chunks=(10, 3)) == (10, 3)
    with pytest.raises(AssertionError):
        check_chunks(10, 2, chunks=(1, 2, 3))


def test_copy_learned_attributes():
    from dask_ml_spark.utils import copy_learned_attributes

    class A:
        pass

    src, dst = A(), A()
    src.mean_ = [1.0]
    src.n_features_in_ = 3
    src.param = "not copied"
    src._private_ = "not copied"
    copy_learned_attributes(src, dst)
    assert dst.mean_ == [1.0] and dst.n_features_in_ == 3
    assert not hasattr(dst, "param") and not hasattr(dst, "_private_")


def test_random_date():
    from datetime import datetime

    import numpy as np

    from dask_ml_spark.datasets import random_date

    np.random.seed(0)
    start, end = datetime(2020, 1, 1), datetime(2021, 1, 1)
    for _ in range(5):
        d = random_date(start, end)
        assert start <= d < end


def test_salted_join_rejects_right_outer(spark):
    """right/full outer would replicate unmatched right rows once per
    salt — the join must refuse rather than silently duplicate."""
    import pytest

    from dask_ml_spark.utils import salted_join

    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", n_salt=4, how=how)
    # left join still supported: unmatched left rows survive exactly once
    out = salted_join(left, right, "k", n_salt=4, how="left")
    assert out.count() == 10


def test_prefix_sum_does_not_mutate_input_schema(spark):
    from dask_ml_spark.datapipe.packing import prefix_sum

    df = spark.range(100).selectExpr("id AS k", "cast(1 as double) AS v")
    before = [f.name for f in df.schema.fields]
    out = prefix_sum(df, "k", "v", out_col="run")
    after = [f.name for f in df.schema.fields]
    assert before == after == ["k", "v"]  # input schema untouched
    pdf = out.orderBy("k").toPandas()
    assert pdf["run"].tolist() == [float(i) for i in range(100)]  # exclusive cumsum


def test_hash_bucket_engine_portability(spark):
    """The Knuth bucket expression must equal its plain-Python
    rendering on arbitrary int64 keys — this arithmetic is the contract
    every deterministic-sampling oracle (hash_split, stratified/mixture
    sampling) relies on, so it must never silently overflow or wrap
    differently in the JVM."""
    from dask_ml_spark.plans.model_selection import _hash_bucket_expr

    M, P, NB, SALT = 2654435761, 1 << 31, 10_000, 7
    keys = [0, 1, -1, 2**31 - 1, -2**31, 2**62, -2**62, 123456789012345]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["k"]: r["b"] for r in df.select(
        "k", _hash_bucket_expr("k", NB, SALT, df=df).alias("b")).collect()}
    for k in keys:
        expect = (((SALT % P + k) % P) * M % P) % NB
        assert got[k] == expect, (k, got[k], expect)


def test_estimator_save_load_roundtrip(spark, lineitem, tmp_path):
    """save/load preserves fitted state across estimator families and
    the transform output is identical; subclass load type-checks."""
    import numpy as np
    import pytest

    from dask_ml_spark.base import BaseEstimator
    from dask_ml_spark.operators.cluster import KMeans
    from dask_ml_spark.operators.preprocessing import StandardScaler

    cols = ["l_quantity", "l_extendedprice"]
    sc = StandardScaler().fit(lineitem, cols)
    p = sc.save(str(tmp_path / "scaler.pkl"))
    sc2 = StandardScaler.load(p)
    a = sc.transform(lineitem.select(*cols)).toPandas()
    b = sc2.transform(lineitem.select(*cols)).toPandas()
    np.testing.assert_allclose(a.to_numpy(), b.to_numpy())
    # generic load works, wrong-subclass load raises
    assert isinstance(BaseEstimator.load(p), StandardScaler)
    with pytest.raises(TypeError):
        KMeans.load(p)


def test_assert_scalable_flags_and_waives(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dask_ml_spark.utils import ScalabilityError, assert_scalable

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")

    # clean equi-join passes and chains
    ok = a.join(b, a.id == b.id2)
    assert assert_scalable(ok) is ok

    # a broadcastable Cross BNLJ is the bounded scalar-stats pattern
    # and passes; a genuine big-big cartesian (broadcast disabled)
    # plans CartesianProduct and is flagged
    assert_scalable(a.crossJoin(b.agg(F.count("*").alias("n"))))
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cross = a.crossJoin(b)
        with _pytest.raises(ScalabilityError, match="CartesianProduct"):
            assert_scalable(cross)
        assert_scalable(cross, allow_cartesian=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # row-at-a-time Python UDF flagged; Arrow pandas UDF is fine
    slow = F.udf(lambda x: x + 1, "long")
    with _pytest.raises(ScalabilityError, match="BatchEvalPython"):
        assert_scalable(a.select(slow("id")))

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fast(s):
        return s + 1

    _fast.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fast = pandas_udf(_fast, "long")
    assert_scalable(a.select(fast("id")))

    # non-equi join flagged
    noneq = a.join(b, a.id < b.id2)
    with _pytest.raises(ScalabilityError, match="BroadcastNestedLoopJoin"):
        assert_scalable(noneq)


def test_assert_scalable_accepts_library_pipelines(spark):
    # the lint must not flag the library's own scalar-broadcast
    # patterns — pagerank crossJoins a 1-row dangling-mass aggregate
    from dask_ml_spark.datapipe.graph import pagerank
    from dask_ml_spark.utils import assert_scalable

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    assert_scalable(pagerank(edges, iters=2))

    # smooth_scores: equi joins + degree-bounded aggregates only
    from dask_ml_spark.datapipe.graph import smooth_scores
    scores = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], ["doc_id", "score"])
    assert_scalable(smooth_scores(edges, scores, iters=2))
