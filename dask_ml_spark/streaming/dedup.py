"""Streaming deduplication (beyond-reference).

Continuous-ingest curation needs dedup *as data arrives*, not as a
nightly batch: the operator keeps one fingerprint per content hash in
the state store and drops re-arrivals. With an event-time watermark the
state is bounded — ``dropDuplicatesWithinWatermark`` evicts fingerprints
older than the watermark, which is the only way streaming dedup survives
unbounded input (an unwatermarked dropDuplicates grows state forever —
allowed here only for finite backfills).

Scale shape: state is hash-partitioned by content hash across
executors (RocksDB-backed store on a real cluster); each micro-batch
shuffles only its own rows by hash. No driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(text_col="text") -> "F.Column":
    return F.sha2(F.col(text_col).cast("string"), 256)


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 ts_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Drop rows whose content hash was already seen.

    Streaming input: first arrival per hash survives; with ``ts_col``
    the fingerprint state is watermark-bounded. Batch input: the same
    operator renders as dropDuplicates on the hash (Catalyst turns it
    into a hash aggregate) — one code path, both execution modes.
    """
    tagged = docs.withColumn("__content_hash", content_hash(text_col))
    if docs.isStreaming and ts_col is not None:
        from dask_ml_spark.utils import ensure_event_time

        return (ensure_event_time(tagged, ts_col)
                .withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["__content_hash"]))
    return tagged.dropDuplicates(["__content_hash"])


def dedup_stats_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Running duplicate statistics per content hash (complete-mode
    aggregate): how much of the incoming corpus is redundant. Batch
    rendering = plain groupBy, which is what the oracle checks."""
    return (docs.withColumn("__content_hash", content_hash(text_col))
            .groupBy("__content_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.min(F.length(F.col(text_col))).alias("n_chars")))


def dedup_stream_against(stream_docs: DataFrame, corpus: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Continuous cross-corpus dedup: drop arriving documents whose
    content hash exists in a STATIC reference corpus — a stream-static
    LEFT ANTI join, the streaming rendering of
    `datapipe.dedup.dedup_against(method="exact")`.

    The static side is planned once per micro-batch (broadcast when
    small; persist the hash table — it is hash-distinct, duplicate-
    free, and far smaller than the corpus text). State-free: unlike
    `dedup_stream`, nothing accumulates in the state store, so no
    watermark is needed. Compose both for "new vs corpus AND new vs
    itself" curation.
    """
    hashes = corpus.select(content_hash(text_col).alias("__h")).distinct()
    return (stream_docs.withColumn("__h", content_hash(text_col))
            .join(hashes, "__h", "left_anti")
            .drop("__h"))
