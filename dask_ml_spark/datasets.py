"""Synthetic data generators — the reference's only "sources"
(dask_ml/datasets.py: make_counts 26-75, make_blobs 78-206,
make_regression 208-341, make_classification 343-382,
make_classification_df 391-462).

Spark design: spark.range(n) drives the row production (distributed,
no driver materialization); randomness is generated per-partition
inside mapInPandas with seeds derived from (root seed, partition id)
— the reference's per-chunk-seed scheme (datasets.py:170-180) mapped
onto partitions. Deterministic for a fixed seed AND partition count.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _feature_schema(n_features: int, extra: list) -> T.StructType:
    fields = [T.StructField(f"f{j}", T.DoubleType()) for j in range(n_features)]
    return T.StructType(fields + extra)


def _partitioned_generator(spark, n_samples, n_partitions, seed, make_block, schema):
    base = spark.range(0, n_samples, numPartitions=n_partitions).select(
        F.spark_partition_id().alias("__pid"), F.col("id")
    )

    def _gen(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            rng = np.random.RandomState((seed * 100003 + pid) % (2**31))
            yield make_block(len(pdf), rng)

    return base.mapInPandas(_gen, schema=schema)


def make_classification(n_samples: int = 100, n_features: int = 20, n_informative: int = 2,
                        scale: float = 1.0, random_state: int = 0,
                        n_partitions: int = 8, spark: SparkSession | None = None) -> DataFrame:
    """Binary classification: informative features shift by class."""
    spark = spark or SparkSession.getActiveSession()
    beta = np.random.RandomState(random_state).uniform(-1, 1, n_informative)

    def block(n, rng):
        import pandas as pd

        X = rng.normal(0, 1, (n, n_features)) * scale
        logits = X[:, :n_informative] @ beta
        p = 1.0 / (1.0 + np.exp(-logits))
        y = (rng.uniform(size=n) < p).astype("int64")
        out = pd.DataFrame(X, columns=[f"f{j}" for j in range(n_features)])
        out["label"] = y
        return out

    schema = _feature_schema(n_features, [T.StructField("label", T.LongType())])
    return _partitioned_generator(spark, n_samples, n_partitions, random_state, block, schema)


def make_regression(n_samples: int = 100, n_features: int = 20, n_informative: int = 10,
                    noise: float = 0.1, random_state: int = 0,
                    n_partitions: int = 8, spark: SparkSession | None = None) -> DataFrame:
    spark = spark or SparkSession.getActiveSession()
    coef = np.zeros(n_features)
    coef[:n_informative] = np.random.RandomState(random_state).uniform(1, 100, n_informative)

    def block(n, rng):
        import pandas as pd

        X = rng.normal(0, 1, (n, n_features))
        y = X @ coef + rng.normal(0, noise, n)
        out = pd.DataFrame(X, columns=[f"f{j}" for j in range(n_features)])
        out["label"] = y
        return out

    schema = _feature_schema(n_features, [T.StructField("label", T.DoubleType())])
    return _partitioned_generator(spark, n_samples, n_partitions, random_state, block, schema)


def make_counts(n_samples: int = 100, n_features: int = 5, n_informative: int = 2,
                scale: float = 1.0, random_state: int = 0,
                n_partitions: int = 8, spark: SparkSession | None = None) -> DataFrame:
    """Poisson-target data (reference datasets.py:26-75)."""
    spark = spark or SparkSession.getActiveSession()
    beta = np.random.RandomState(random_state).normal(0, 0.5, n_informative)

    def block(n, rng):
        import pandas as pd

        X = rng.normal(0, 1, (n, n_features)) * scale
        rate = np.exp(np.clip(X[:, :n_informative] @ beta, -10, 10))
        y = rng.poisson(rate)
        out = pd.DataFrame(X, columns=[f"f{j}" for j in range(n_features)])
        out["label"] = y.astype("int64")
        return out

    schema = _feature_schema(n_features, [T.StructField("label", T.LongType())])
    return _partitioned_generator(spark, n_samples, n_partitions, random_state, block, schema)


def make_blobs(n_samples: int = 100, n_features: int = 2, centers: int | np.ndarray = 3,
               cluster_std: float = 1.0, random_state: int = 0,
               n_partitions: int = 8, spark: SparkSession | None = None) -> DataFrame:
    """Gaussian blobs (reference datasets.py:78-206 — prototype centers
    fixed driver-side, per-partition sampling)."""
    spark = spark or SparkSession.getActiveSession()
    rng0 = np.random.RandomState(random_state)
    if isinstance(centers, int):
        centers_arr = rng0.uniform(-10, 10, size=(centers, n_features))
    else:
        centers_arr = np.asarray(centers, dtype="float64")
    k = len(centers_arr)

    def block(n, rng):
        import pandas as pd

        which = rng.randint(0, k, size=n)
        X = centers_arr[which] + rng.normal(0, cluster_std, (n, n_features))
        out = pd.DataFrame(X, columns=[f"x{j}" for j in range(n_features)])
        out["cluster"] = which.astype("int32")
        return out

    schema = T.StructType(
        [T.StructField(f"x{j}", T.DoubleType()) for j in range(n_features)]
        + [T.StructField("cluster", T.IntegerType())]
    )
    return _partitioned_generator(spark, n_samples, n_partitions, random_state, block, schema)


def make_blobs_deterministic(n_samples: int, centers: np.ndarray,
                             cluster_std: float = 1.0, salt: int = 0,
                             spark: SparkSession | None = None) -> DataFrame:
    """Content-deterministic Gaussian blobs — the 100 TB variant of
    make_blobs: every row is a PURE FUNCTION of its index (Knuth
    multiplicative hash → two uniforms → Box–Muller normal), so the
    generated data is identical across partitionings, retries, and
    engines. numpy-RNG generation (make_blobs above, reference
    datasets.py:78-206) is partition-order-reproducible only; this
    variant is row-addressable, which is what lets a SQL oracle verify
    the distributed generation path value-by-value and what makes a
    regenerated shard byte-stable after executor loss.

    Entirely JVM expressions over spark.range — no Python workers,
    scales to any n_samples. Uniforms come from a 14-hex-digit md5
    prefix of "{id}_{tag}" (the same engine-portable fold
    _hash_bucket_expr uses for string keys): a multiplicative
    congruential hash would NOT do here — compositions of multiply-mod
    maps stay affine mod P, so cluster membership and the uniforms
    share linear structure and the per-cluster means bias by ~10σ
    (measured); md5 breaks the linearity. Cluster of row i = md5
    bucket % k.
    """
    from pyspark.sql import functions as F

    spark = spark or SparkSession.getActiveSession()
    centers = np.asarray(centers, dtype="float64")
    k, n_features = centers.shape
    W = float(1 << 56)

    def h(tag):
        return F.conv(F.substring(F.md5(F.concat(
            F.col("id").cast("string"), F.lit(f"_{salt}_{tag}"))), 1, 14),
            16, 10).cast("long")

    df = spark.range(n_samples)
    cluster = F.pmod(h("c"), F.lit(k)).cast("int")
    cols = {"cluster": cluster}
    two_pi = 2.0 * np.pi
    for j in range(n_features):
        # two independent uniforms per (row, feature); +0.5 keeps u1
        # strictly inside (0, 1) so ln() is finite
        u1 = (h(f"a{j}") + F.lit(0.5)) / F.lit(W)
        u2 = (h(f"b{j}") + F.lit(0.5)) / F.lit(W)
        z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(two_pi) * u2)
        center_j = F.element_at(
            F.array(*[F.lit(float(c[j])) for c in centers]), cluster + 1)
        cols[f"x{j}"] = center_j + F.lit(float(cluster_std)) * z
    return df.select(
        F.col("id"), *[cols[f"x{j}"].alias(f"x{j}") for j in range(n_features)],
        cols["cluster"].alias("cluster"))


def random_date(start, end):
    """Uniform random datetime in [start, end) (reference
    datasets.py:384-389 — same numpy-randint-seconds semantics, driver
    side; the distributed date column in make_classification_df is
    generated per-partition)."""
    from datetime import timedelta

    delta = end - start
    int_delta = (delta.days * 24 * 60 * 60) + delta.seconds
    return start + timedelta(seconds=int(np.random.randint(int_delta)))


def make_classification_df(n_samples: int = 100, n_features: int = 20,
                           random_state: int = 0, n_partitions: int = 8,
                           dates=("2000-01-01", "2000-07-01"),
                           spark: SparkSession | None = None) -> DataFrame:
    """Classification frame + uniform random timestamp column
    (reference datasets.py:391-462, random_date 384-389)."""
    df = make_classification(n_samples, n_features, random_state=random_state,
                             n_partitions=n_partitions, spark=spark)
    lo, hi = [F.lit(d).cast("timestamp") for d in dates]
    span = hi.cast("double") - lo.cast("double")
    return df.withColumn(
        "date", (lo.cast("double") + F.rand(random_state) * span).cast("timestamp")
    )
