"""Streaming dedup: stream-vs-batch parity and watermark-bounded state."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    from dask_ml_spark.sources.io import load_table

    # duplicate a slice of documents so there is something to drop,
    # and attach an event-time column for the watermark path
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    dupes = docs.limit(40)
    both = docs.unionAll(dupes).withColumn(
        "arrival_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 3600))
    d = str(tmp_path_factory.mktemp("docs_stream"))
    both.coalesce(3).write.mode("overwrite").parquet(d)
    return d


def test_stream_dedup_matches_batch(spark, docs_dir):
    from dask_ml_spark.streaming.dedup import dedup_stream

    batch = spark.read.parquet(docs_dir)
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)

    out = dedup_stream(stream, ts_col="arrival_ts", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    streamed = spark.sql("select * from dedup_out").toPandas()
    expected = dedup_stream(batch).toPandas()
    # same surviving content set (first-arrival winner is order-dependent,
    # the contract is one row per distinct content hash)
    assert set(streamed["__content_hash"]) == set(expected["__content_hash"])
    assert len(streamed) == len(expected)
    # and duplicates really were dropped
    assert len(streamed) < batch.count()


def test_dedup_stats_counts_copies(spark, docs_dir):
    from dask_ml_spark.streaming.dedup import dedup_stats_stream

    batch = spark.read.parquet(docs_dir)
    stats = dedup_stats_stream(batch).toPandas()
    assert (stats["n_copies"] >= 1).all()
    assert (stats["n_copies"] == 2).sum() == 40  # the duplicated slice


def test_stream_fingerprints_match_batch(spark, docs_dir):
    """image_hashes / audio_fingerprints are narrow maps, so they run
    unchanged on a stream; fingerprinting a stream against a static
    index is the production shape for incremental multimodal dedup."""
    from dask_ml_spark.datapipe.audio_dedup import audio_fingerprints
    from dask_ml_spark.datapipe.image_dedup import image_hashes
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text

    batch = attach_binary_from_text(spark.read.parquet(docs_dir))
    schema = spark.read.parquet(docs_dir).schema
    stream = attach_binary_from_text(
        spark.readStream.schema(schema).parquet(docs_dir))

    for name, op in [("img_fp_out", image_hashes),
                     ("aud_fp_out", audio_fingerprints)]:
        q = (op(stream).writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        streamed = {tuple(r) for r in
                    spark.sql(f"select * from {name}").collect()}
        expected = {tuple(r) for r in op(batch).collect()}
        assert streamed == expected and len(streamed) > 0


def test_stream_curation_ops_match_batch(spark, docs_dir):
    """gopher_quality / script_profile / canonicalize_urls are
    stateless narrow maps, so the SAME operator runs unchanged on a
    stream — the incremental-ingest curation shape: score and route
    documents as they arrive, no state store needed."""
    from dask_ml_spark.datapipe.text_stats import (gopher_quality,
                                                   script_profile)

    batch = spark.read.parquet(docs_dir)
    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)

    out = gopher_quality(stream, min_words=5)
    q = (out.writeStream.format("memory").queryName("gq_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.sql("select * from gq_out").toPandas()
    expected = gopher_quality(batch, min_words=5).toPandas()
    cols = sorted(expected.columns)
    a = streamed[cols].sort_values(cols).reset_index(drop=True)
    b = expected[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    out2 = script_profile(stream)
    q2 = (out2.writeStream.format("memory").queryName("sp_out")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    s2 = spark.sql("select dominant_script, count(*) n from sp_out group by 1").toPandas()
    e2 = (script_profile(batch).groupBy("dominant_script").count().toPandas())
    assert dict(zip(s2["dominant_script"], s2["n"])) == \
        dict(zip(e2["dominant_script"], e2["count"]))
