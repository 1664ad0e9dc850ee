"""Custom stateful streaming operators (beyond-reference).

The reference has no streaming surface (SURVEY §1.2); these are the
Structured-Streaming-native operators a 100 TB event pipeline needs.
The pattern is ``applyInPandasWithState``: per-key state lives in the
state store (RocksDB-backed on a real cluster), each micro-batch
delivers the key's new rows as Arrow batches, and the operator decides
what to emit and what to keep.  Nothing is ever collected to the
driver; keys are hash-partitioned, so 1000 executors hold 1/1000 of
the session state each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

# state = one open session per key
_SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      ts_col: str = "ts", key_col: str = "user_id",
                      value_col: str = "value",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization with explicit per-key state.

    A session closes when a >gap silence is observed for the key; the
    closed session is emitted downstream and the state rolls over to
    the new session.  The final open session per key stays in the
    state store until more data (or a state timeout) arrives — the
    standard streaming contract.  The batch rendering of this operator
    is the lag-window sessionization in plans/queries.py
    (q_event_sessionization); tests assert the two agree on closed
    sessions.

    `gap` accepts "N minutes"/"N seconds"/"N hours" strings.
    """
    import pandas as pd

    gap_seconds = _parse_gap_seconds(gap)
    gap_us = int(gap_seconds * 1_000_000)

    def _track(key, pdf_iter, state):
        (uid,) = key
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(ts_col)
        ts_us = rows[ts_col].astype("int64")  # pandas datetime64[us/ns] → int
        unit_div = 1000 if rows[ts_col].dtype.str.endswith("[ns]") else 1
        vals = rows[value_col].astype("float64")

        if state.exists:
            start_us, last_us, n_ev, sv = state.get
        else:
            start_us = last_us = None
            n_ev, sv = 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t) // unit_div
            if last_us is not None and t - last_us > gap_us:
                closed.append((uid, start_us, last_us, n_ev, sv))
                start_us, n_ev, sv = t, 0, 0.0
            if start_us is None:
                start_us = t
            last_us = t
            n_ev += 1
            sv += float(v)
        state.update((start_us, last_us, n_ev, sv))
        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "start_us", "end_us", "n_events", "sum_value"])
            yield pd.DataFrame({
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"],
                "sum_value": out["sum_value"],
            })

    from pyspark.sql.streaming.state import GroupStateTimeout

    from dask_ml_spark.utils import ensure_event_time

    events = ensure_event_time(events, ts_col)
    stream = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _track,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return float(qty) * mult


def streaming_quality_filter(docs: DataFrame, min_chars: int = 100,
                             max_chars: int = 1_000_000,
                             text_col: str = "text") -> DataFrame:
    """Stateless streaming document filter — demonstrates that the
    batch datapipe quality operators run unchanged on a readStream
    (same Catalyst expressions, incremental execution)."""
    from dask_ml_spark.datapipe.text_stats import quality_scores

    scored = quality_scores(docs, text_col=text_col)
    return scored.where(
        (F.length(F.col(text_col)) >= min_chars)
        & (F.length(F.col(text_col)) <= max_chars)
    )


QUOTA_OUTPUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("source", StringType()),
    StructField("n_tokens", LongType()),
    StructField("tokens_before", LongType()),
])

_QUOTA_STATE_SCHEMA = StructType([StructField("used", LongType())])


def token_quota_stream(docs: DataFrame, quota: int,
                       source_col: str = "source", id_col: str = "doc_id",
                       tokens_col: str = "n_tokens") -> DataFrame:
    """Streaming per-source token budget: documents stream through
    until their source's cumulative token count would exceed `quota`;
    later arrivals for that source are dropped. State per key is ONE
    long (tokens used) — bounded regardless of stream length. Within a
    micro-batch, rows are consumed in id order so replays are
    deterministic; the batch rendering (same id order) is
    `dask_ml_spark.datapipe.sampling.token_quota`, and tests assert
    the two agree.

    Expects `tokens_col` precomputed (token_count(text) — keep the
    heavy tokenization in JVM expressions before the stateful hop).
    """
    import pandas as pd

    def _enforce(key, pdf_iter, state):
        (src,) = key
        used = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(id_col)
        kept = []
        for did, nt in zip(rows[id_col], rows[tokens_col]):
            nt = int(nt)
            # prefix rule, NOT greedy: the cumulative count advances on
            # every doc, so the first overflow closes the source for
            # good — exactly the batch rendering's `cum <= quota` window
            # filter (sampling.py::token_quota). A greedy skip would let
            # later smaller docs sneak in and the two renderings would
            # disagree.
            used += nt
            if used <= quota:
                kept.append((int(did), src, nt, used - nt))
        state.update((used,))
        if kept:
            yield pd.DataFrame(
                kept, columns=["doc_id", "source", "n_tokens", "tokens_before"])

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (docs.groupBy(source_col)
            .applyInPandasWithState(
                _enforce,
                outputStructType=QUOTA_OUTPUT_SCHEMA,
                stateStructType=_QUOTA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
