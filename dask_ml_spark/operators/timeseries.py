"""Regular-grid time-series repair: downsample to fixed buckets, fill
the missing buckets, interpolate.

Beyond the reference (dask.dataframe covers resample through pandas
semantics; this is the distributed equivalent for the common
"sensor/event stream -> regular training grid" preparation step).

Spark-first shape: bucketing + per-bucket aggregation is one uniform
shuffle; the per-key grid is generated with sequence()/explode from
each key's own [min, max] span (rows created = missing buckets only —
no calendar cross-join against the key universe); the fill is two
frame-bounded window passes per key. The window serializes per key,
so series length (span / step) is the hot-key hazard — max_buckets
fails fast (raise_error, the fuzzy_join precedent) rather than
letting one decade-span key at 1-second step create a 3·10^8-row
window task. Keyless (global) series use ONE window partition by
construction; that is the inherent sequential shape of
interpolation, not a planning accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_fill(df: DataFrame, ts_col: str, value_col: str,
              key_cols=None, step: int = 3600,
              method: str = "linear",
              max_buckets: int = 1_000_000) -> DataFrame:
    """Regularize an event stream onto a fixed step-second grid.

    Observed buckets carry avg(value_col); missing interior buckets
    are filled by `method`:
      linear — prev + (next − prev) · (t − t_prev) / (t_next − t_prev)
      ffill  — the previous observed value
      zero   — 0.0
    The grid spans each key's own [min, max] observed bucket, so every
    filled bucket has observed neighbors on both sides.

    Output: key_cols + (bucket_ts timestamp, epoch_s long,
    value double, observed boolean).
    """
    if method not in ("linear", "ffill", "zero"):
        raise ValueError(f"unknown method {method!r}")
    if step < 1:
        raise ValueError("step must be >= 1 second")
    keys = list(key_cols) if key_cols else []
    # TIMESTAMP_NTZ inputs need an explicit cast before unix_timestamp
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(epoch / step) * step).cast("long")
    observed = (df
                .select(*keys, bucket.alias("epoch_s"),
                        F.col(value_col).cast("double").alias("__v"))
                .groupBy(*keys, "epoch_s")
                .agg(F.avg("__v").alias("__v")))
    if keys:
        # ONE explicit AQE-exempt keyed layout that everything below
        # reuses: the span aggregate, the grid-vs-observed join (key
        # prefix satisfies its clustered distribution), and the fill
        # windows. Without it the byte-small downsampled frame gets
        # AQE-coalesced into a task or two and every later sort runs
        # serially (measured 15s -> ~3s at sf1). Keyless series are ONE
        # window partition by nature — nothing to pin.
        n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
        observed = observed.repartition(n_parts, *keys)
    span = observed.groupBy(*keys).agg(
        F.min("epoch_s").alias("__mn"), F.max("epoch_s").alias("__mx"))
    # +1: the generated grid has (mx-mn)/step + 1 ROWS (sequence is
    # inclusive), so the guard counts rows, not intervals
    n_buckets = (F.col("__mx") - F.col("__mn")) / step + 1
    guarded = F.when(
        n_buckets > max_buckets,
        F.raise_error(F.concat(
            F.lit(f"key span exceeds max_buckets={max_buckets} grid "
                  "buckets (the fill window serializes per key): "),
            *([F.col(k).cast("string") for k in keys] or [F.lit("<global>")])))
    ).otherwise(F.sequence(
        F.col("__mn"), F.col("__mx"), F.lit(int(step)).cast("long")))
    grid = span.select(*keys, F.explode(guarded).alias("epoch_s"))
    full = grid.join(observed, [*keys, "epoch_s"], "left")

    w_prev = (Window.partitionBy(*[F.col(k) for k in keys] or [F.lit(1)])
              .orderBy("epoch_s")
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(*[F.col(k) for k in keys] or [F.lit(1)])
              .orderBy("epoch_s")
              .rowsBetween(0, Window.unboundedFollowing))
    obs_b = F.when(F.col("__v").isNotNull(), F.col("epoch_s"))
    pv = F.last("__v", ignorenulls=True).over(w_prev)
    pb = F.last(obs_b, ignorenulls=True).over(w_prev)
    nv = F.first("__v", ignorenulls=True).over(w_next)
    nb = F.first(obs_b, ignorenulls=True).over(w_next)
    if method == "linear":
        interp = pv + (nv - pv) * (F.col("epoch_s") - pb) / (nb - pb)
        fill = F.coalesce(interp, pv, nv)
    elif method == "ffill":
        fill = pv
    else:
        fill = F.lit(0.0)
    return (full
            .withColumn("value", F.coalesce(F.col("__v"), fill))
            .select(*keys,
                    F.timestamp_seconds("epoch_s").alias("bucket_ts"),
                    "epoch_s", "value",
                    F.col("__v").isNotNull().alias("observed")))
