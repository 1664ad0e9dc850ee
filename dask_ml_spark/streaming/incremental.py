"""Streaming incremental learning (beyond-reference).

The reference has NO event-time streaming surface (SURVEY §1.2); its
closest concept is batch-sequential `partial_fit` (Incremental,
wrappers.py:419-603). This module extends that idea to Structured
Streaming: a foreachBatch sink trains each micro-batch through the
executor-chained Incremental wrapper (the model travels between
executors; partition data is never collected) — plus windowed feature
aggregation with watermarks for the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingIncremental:
    """Train a partial_fit estimator from a streaming DataFrame.

    Each micro-batch trains through the same executor-chained
    per-partition jobs as the batch `Incremental` wrapper (the model
    travels between executors; partition data is never collected to the
    driver) — this is literally Incremental over the stream of
    micro-batches.
    """

    def __init__(self, estimator, feature_columns, label_col: str = "label",
                 max_batch_rows: int = 1_000_000):
        self.estimator = estimator
        self.feature_columns = list(feature_columns)
        self.label_col = label_col
        self.max_batch_rows = max_batch_rows
        self.n_batches_ = 0
        self.n_capped_batches_ = 0

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from dask_ml_spark.operators.wrappers import Incremental

        sel = batch_df.select(*self.feature_columns, self.label_col)
        # training is executor-side, but an unbounded trigger
        # (availableNow over a huge backlog) still makes one micro-batch
        # an arbitrarily long sequential chain — cap and warn, mirroring
        # ParallelPostFit's ResourceWarning threshold (wrappers.py)
        if self.max_batch_rows is not None:
            n = sel.count()
            if n > self.max_batch_rows:
                import warnings

                warnings.warn(
                    f"StreamingIncremental micro-batch {batch_id} has {n:,} rows "
                    f"(> {self.max_batch_rows:,}); training on a random "
                    f"{self.max_batch_rows:,}-row subsample — use a smaller "
                    f"trigger (maxFilesPerTrigger / processingTime) to see "
                    f"every row", ResourceWarning, stacklevel=2)
                sel = sel.orderBy(F.rand(seed=batch_id)).limit(self.max_batch_rows)
                self.n_capped_batches_ += 1
        if sel.isEmpty():
            return
        inc = Incremental(self.estimator, shuffle_blocks=False)
        inc.fit(sel, self.feature_columns, label_col=self.label_col)
        self.estimator = inc.estimator  # trained copy (pickle round-trip)
        self.n_batches_ += 1

    def fit_stream(self, stream_df: DataFrame, trigger_once: bool = True, **trigger_kwargs):
        writer = stream_df.writeStream.foreachBatch(self._process_batch).outputMode("append")
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        elif trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        query = writer.start()
        if trigger_once:
            query.awaitTermination()
        return query


def windowed_event_features(events: DataFrame, window: str = "1 hour",
                            watermark: str = "2 hours",
                            ts_col: str = "ts", user_col: str = "user_id",
                            value_col: str = "value") -> DataFrame:
    """Watermarked sliding-window per-user aggregates — the standard
    feature-extraction shape over an event stream; works identically
    on a static events DataFrame (batch window agg) and a readStream.
    """
    from dask_ml_spark.utils import ensure_event_time

    df = ensure_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            user_col, "n_events", "sum_value", "avg_value", "max_value",
        )
    )
