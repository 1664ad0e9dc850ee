"""Watermarked stream-stream joins — the attribution primitive
(click -> impression, purchase -> ad, span -> span) rendered on
Structured Streaming.

Spark-first: the engine's stream-stream inner join with an event-time
range condition keeps per-key state BOUNDED — each side buffers only
rows newer than its watermark minus the join horizon, so state size is
(arrival rate x (watermark + horizon)) regardless of total stream
length. That is the 100 TB shape: no replay, no unbounded buffer.

The same function renders on batch DataFrames (watermarks skipped), so
the batch rendering is SQL-oracle-able and stream-vs-batch parity is
testable — the repo-wide pattern for every streaming operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key_col: str = "user_id",
                         left_ts_col: str = "ts",
                         right_ts_col: str = "ts",
                         horizon: str = "30 minutes",
                         watermark: str = "1 hour",
                         prefixes=("l_", "r_")) -> DataFrame:
    """Join each right-side event to the left-side events of the same
    key that happened within ``horizon`` BEFORE it:

        l.key = r.key AND l.ts <= r.ts AND r.ts <= l.ts + horizon

    Streaming inputs get ``withWatermark(ts, watermark)``; the time
    bound on BOTH sides lets Spark expire join state (late rows beyond
    watermark + horizon are dropped, on-time state is evicted as the
    watermark advances). Batch inputs skip the watermark and produce
    the identical join — one equi hash join on the key with the range
    as a post-condition.

    All columns are prefixed (``prefixes``) to keep the two sides
    unambiguous; the output adds ``gap_seconds`` (right ts - left ts).
    """
    lp, rp = prefixes
    lren = left.select([F.col(c).alias(lp + c) for c in left.columns])
    rren = right.select([F.col(c).alias(rp + c) for c in right.columns])
    if lren.isStreaming:
        lren = lren.withWatermark(lp + left_ts_col, watermark)
    if rren.isStreaming:
        rren = rren.withWatermark(rp + right_ts_col, watermark)
    lts, rts = F.col(lp + left_ts_col), F.col(rp + right_ts_col)
    cond = ((F.col(lp + key_col) == F.col(rp + key_col))
            & (lts <= rts)
            & (rts <= lts + F.expr(f"INTERVAL {horizon}")))
    joined = lren.join(rren, cond, "inner")
    gap = rts.cast("timestamp").cast("double") - lts.cast("timestamp").cast("double")
    return joined.withColumn("gap_seconds", gap)
