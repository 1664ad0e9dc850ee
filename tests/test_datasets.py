

def test_make_blobs_deterministic_is_partition_invariant(spark):
    """Content-deterministic blobs: identical values regardless of
    partitioning, correct cluster geometry, no Python workers."""
    import numpy as np

    from dask_ml_spark.datasets import make_blobs_deterministic

    centers = [[-5.0, 0.0], [0.0, 5.0], [5.0, -5.0]]
    a = make_blobs_deterministic(5000, centers, cluster_std=1.0,
                                 spark=spark).toPandas().sort_values("id")
    b = (make_blobs_deterministic(5000, centers, cluster_std=1.0, spark=spark)
         .repartition(17).toPandas().sort_values("id"))
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())
    for c in range(3):
        g = a[a.cluster == c]
        assert abs(g.x0.mean() - centers[c][0]) < 0.1
        assert abs(g.x1.mean() - centers[c][1]) < 0.1
        assert abs(g.x0.std() - 1.0) < 0.1
    # normality sanity: Box-Muller should be symmetric, not uniform
    z = (a[a.cluster == 0].x0 - centers[0][0])
    assert abs(float((z**3).mean())) < 0.3  # near-zero skew
    plan = make_blobs_deterministic(100, centers, spark=spark)._jdf \
        .queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert "Python" not in plan
