"""applyInPandasWithState sessionization: streaming vs batch parity.

The streaming operator emits a session when a >gap silence closes it;
the final open session per key stays in state. So the parity check is:
streamed closed sessions == pandas-computed sessions minus each user's
last one.
"""

import pandas as pd
import pytest


def _expected_sessions(pdf: pd.DataFrame, gap_seconds: float) -> pd.DataFrame:
    """All sessions (including each user's final open one)."""
    out = []
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        start = last = None
        n, sv = 0, 0.0
        for t, v in zip(g["ts"], g["value"]):
            if last is not None and (t - last).total_seconds() > gap_seconds:
                out.append((uid, start, last, n, sv))
                start, n, sv = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            sv += float(v)
        out.append((uid, start, last, n, sv))
    return pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"])


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    from dask_ml_spark.sources.io import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    d = str(tmp_path_factory.mktemp("events_stream"))
    src.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_sessionize_stream_matches_batch(spark, events_stream_dir):
    from dask_ml_spark.streaming.stateful import sessionize_stream

    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    sessions = sessionize_stream(stream, gap="30 minutes")
    q = (sessions.writeStream.format("memory").queryName("sessions_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sessions_out").toPandas()

    pdf = spark.read.parquet(events_stream_dir).toPandas()
    exp = _expected_sessions(pdf, 1800.0)
    # drop each user's final (still-open) session: not emitted by the stream
    exp_closed = exp[exp.groupby("user_id").cumcount(ascending=False) > 0]

    key = ["user_id", "session_start", "n_events"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp_closed.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(
        got_s[["user_id", "n_events"]], exp_s[["user_id", "n_events"]])
    assert (got_s["session_start"].values == exp_s["session_start"].values).all()
    assert (got_s["session_end"].values == exp_s["session_end"].values).all()
    assert abs(got_s["sum_value"] - exp_s["sum_value"]).max() < 1e-9


def test_streaming_quality_filter_runs_on_stream(spark, tmp_path):
    from dask_ml_spark.streaming.stateful import streaming_quality_filter

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs")
    src.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    filtered = streaming_quality_filter(stream, min_chars=50)
    q = (filtered.writeStream.format("memory").queryName("docs_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT count(*) n FROM docs_out").collect()[0]["n"]
    want = streaming_quality_filter(src, min_chars=50).count()
    assert got == want and got > 0


def test_token_quota_stream_matches_batch(spark, tmp_path):
    """Streaming per-source token quota agrees with the batch window
    rendering on the same data, and state caps every source."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_ml_spark.datapipe.sampling import token_quota
    from dask_ml_spark.streaming.stateful import token_quota_stream

    rng = np.random.RandomState(3)
    docs = pd.DataFrame({
        "doc_id": range(60),
        "source": [["web", "books", "code"][i % 3] for i in range(60)],
        "text": [" ".join(f"tok{j}" for j in range(rng.randint(5, 40)))
                 for _ in range(60)],
    })
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(src)
    QUOTA = 300

    batch = token_quota(spark.read.parquet(src), QUOTA).toPandas()
    stream_in = (spark.readStream.schema("doc_id long, source string, text string")
                 .parquet(src)
                 .withColumn("n_tokens", F.size(F.regexp_extract_all(
                     F.lower("text"), F.lit("[a-z0-9_]{2,}"), 0)).cast("long")))
    out = token_quota_stream(stream_in, QUOTA)
    q = (out.writeStream.format("memory").queryName("quota_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select * from quota_out").toPandas()
    assert set(got.doc_id) == set(batch.doc_id)
    per_src = got.groupby("source")["n_tokens"].sum()
    assert (per_src <= QUOTA).all()
    merged = got.set_index("doc_id")["tokens_before"]
    expect = batch.set_index("doc_id")["tokens_before"]
    assert merged.sort_index().equals(expect.sort_index())


def test_token_quota_stream_prefix_rule_not_greedy(spark, tmp_path):
    """ADVICE r4 adversarial case: quota=10, tokens [6,7,3] in id
    order. The batch rule (cum <= quota) keeps doc0 ONLY — doc1
    overflows and closes the source, so doc2 must NOT sneak in even
    though 6+3 <= 10. The stream must replay that prefix rule."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_ml_spark.datapipe.sampling import token_quota
    from dask_ml_spark.streaming.stateful import token_quota_stream

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["web"] * 3,
        "text": ["a1 b2 c3 d4 e5 f6",                  # 6 tokens
                 "a1 b2 c3 d4 e5 f6 g7",               # 7 tokens
                 "a1 b2 c3"],                          # 3 tokens
    })
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(src)
    QUOTA = 10

    batch = token_quota(spark.read.parquet(src), QUOTA).toPandas()
    assert sorted(batch.doc_id) == [0]

    stream_in = (spark.readStream.schema("doc_id long, source string, text string")
                 .parquet(src)
                 .withColumn("n_tokens", F.size(F.regexp_extract_all(
                     F.lower("text"), F.lit("[a-z0-9_]{2,}"), 0)).cast("long")))
    out = token_quota_stream(stream_in, QUOTA)
    q = (out.writeStream.format("memory").queryName("quota_prefix_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select * from quota_prefix_out").toPandas()
    assert sorted(got.doc_id) == sorted(batch.doc_id) == [0]


def test_windowed_features_watermark_drops_late_data(spark, tmp_path):
    """The watermark contract, end to end across micro-batches: batch
    1 advances the watermark; a batch-2 event older than it must be
    DROPPED from the append-mode window aggregate — while the batch
    rendering of the same function counts it. A checkpointed
    stop/restart forces the two files into separate micro-batches
    (and exercises watermark recovery on the way)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_ml_spark.streaming.incremental import windowed_event_features

    d = tmp_path / "ev"
    cp = str(tmp_path / "cp")
    d.mkdir()
    f1 = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 01:00:00", "2024-01-01 12:00:00"]),
        "user_id": [1, 1],
        "value": [10.0, 1.0],
    })
    f2 = pd.DataFrame({
        # 01:30 is far below the post-batch-1 watermark (12:00 - 2h)
        "ts": pd.to_datetime(["2024-01-01 01:30:00", "2024-01-01 13:00:00"]),
        "user_id": [1, 1],
        "value": [100.0, 2.0],
    })

    outdir = str(tmp_path / "out")

    def run_once():
        stream = (spark.readStream
                  .schema("ts timestamp, user_id long, value double")
                  .parquet(str(d)))
        out = windowed_event_features(stream, window="1 hour",
                                      watermark="2 hours")
        # parquet sink (the memory sink cannot recover from a
        # checkpoint, and checkpoint recovery is the point here)
        q = (out.writeStream.format("parquet")
             .option("path", outdir)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    # micro-batch 1: on-time data only; the checkpoint persists the
    # advanced watermark across the restart — the canonical recovery
    # path a real pipeline takes
    spark.createDataFrame(f1).coalesce(1).write.mode("append").parquet(str(d))
    run_once()
    # micro-batch 2: a too-late event plus fresh data
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(str(d))
    run_once()
    got = spark.read.parquet(outdir).toPandas()
    w1 = got[got.window_start == pd.Timestamp("2024-01-01 01:00:00")]
    assert len(w1) == 1
    # the late 100.0 event was dropped: only the on-time 10.0 counted
    assert w1.iloc[0].n_events == 1 and w1.iloc[0].sum_value == 10.0

    # batch rendering of the SAME function sees both
    batch = windowed_event_features(
        spark.read.parquet(str(d / "*")), window="1 hour").toPandas()
    b1 = batch[batch.window_start == pd.Timestamp("2024-01-01 01:00:00")]
    assert b1.iloc[0].n_events == 2 and b1.iloc[0].sum_value == 110.0
