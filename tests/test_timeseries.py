"""time_fill (operators/timeseries.py): hand-computed grids,
interpolation arithmetic, guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.timeseries import time_fill


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v")


def test_time_fill_linear_hand_computed(spark):
    # key a: observed at buckets 0, 30, 40 (step=10) -> gaps at
    # 10, 20 interpolate 1/3 and 2/3 of the way; key b: single bucket
    rows = [("a", "1970-01-01 00:00:01", 3.0),
            ("a", "1970-01-01 00:00:05", 9.0),   # bucket 0 avg = 6.0
            ("a", "1970-01-01 00:00:35", 12.0),  # bucket 30
            ("a", "1970-01-01 00:00:42", 20.0),  # bucket 40
            ("b", "1970-01-01 00:01:00", 5.0)]
    out = time_fill(_mk(spark, rows), "ts", "v", key_cols=["k"], step=10)
    got = {(r["k"], r["epoch_s"]): (r["value"], r["observed"])
           for r in out.collect()}
    want = {("a", 0): (6.0, True),
            ("a", 10): (6.0 + (12.0 - 6.0) * 10 / 30, False),
            ("a", 20): (6.0 + (12.0 - 6.0) * 20 / 30, False),
            ("a", 30): (12.0, True),
            ("a", 40): (20.0, True),
            ("b", 60): (5.0, True)}
    assert set(got) == set(want)
    for key, (v, obs) in want.items():
        assert got[key][1] == obs
        assert abs(got[key][0] - v) < 1e-12
    # bucket_ts reconstructs the epoch
    ts = {r["epoch_s"]: r["bucket_ts"].timestamp()
          for r in out.collect()}
    assert all(abs(ts[e] - e) < 1e-9 for e in ts)


def test_time_fill_ffill_zero_and_determinism(spark):
    rows = [("a", "1970-01-01 00:00:00", 2.0),
            ("a", "1970-01-01 00:00:30", 8.0)]
    df = _mk(spark, rows)
    ff = {r["epoch_s"]: r["value"] for r in
          time_fill(df, "ts", "v", ["k"], step=10, method="ffill").collect()}
    assert ff == {0: 2.0, 10: 2.0, 20: 2.0, 30: 8.0}
    zz = {r["epoch_s"]: r["value"] for r in
          time_fill(df, "ts", "v", ["k"], step=10, method="zero").collect()}
    assert zz == {0: 2.0, 10: 0.0, 20: 0.0, 30: 8.0}
    # keyless global series
    g = {r["epoch_s"]: r["value"] for r in
         time_fill(df, "ts", "v", None, step=15).collect()}
    assert set(g) == {0, 15, 30}
    assert abs(g[15] - (2.0 + (8.0 - 2.0) * 15 / 30)) < 1e-12
    # content-deterministic under repartitioning
    a = sorted((r["k"], r["epoch_s"], r["value"]) for r in
               time_fill(df, "ts", "v", ["k"], step=10).collect())
    b = sorted((r["k"], r["epoch_s"], r["value"]) for r in
               time_fill(df.repartition(13), "ts", "v", ["k"],
                         step=10).collect())
    assert a == b


def test_time_fill_guards(spark):
    rows = [("a", "1970-01-01 00:00:00", 1.0),
            ("a", "1970-01-02 00:00:00", 2.0)]
    df = _mk(spark, rows)
    with pytest.raises(ValueError, match="method"):
        time_fill(df, "ts", "v", ["k"], method="spline")
    with pytest.raises(ValueError, match="step"):
        time_fill(df, "ts", "v", ["k"], step=0)
    # a key spanning more than max_buckets grid points fails fast
    with pytest.raises(Exception, match="max_buckets"):
        time_fill(df, "ts", "v", ["k"], step=1,
                  max_buckets=1000).collect()
    # boundary: the guard counts grid ROWS (span/step + 1), so a key
    # producing exactly max_buckets+1 rows must also fail fast...
    rows2 = [("b", "1970-01-01 00:00:00", 1.0),
             ("b", "1970-01-01 00:00:10", 2.0)]
    df2 = _mk(spark, rows2)
    with pytest.raises(Exception, match="max_buckets"):
        time_fill(df2, "ts", "v", ["k"], step=1,
                  max_buckets=10).collect()
    # ...while exactly max_buckets rows passes
    assert time_fill(df2, "ts", "v", ["k"], step=1,
                     max_buckets=11).count() == 11
