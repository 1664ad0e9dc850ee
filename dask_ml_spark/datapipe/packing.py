"""Shard packing and PII redaction for training-data export
(beyond-reference).

``pack_token_shards`` assigns documents to fixed-token-budget training
shards by their starting offset in the corpus-wide token stream — the
step right before writing tokenizer-ready data, where downstream jobs
want ~equal-token files. The global running sum is computed as a
DISTRIBUTED prefix sum (range-partition by the order key, one local
cumsum per partition, only #partitions subtotal longs through the
driver) — never a single-partition global window, which is the classic
100 TB trap for ``ORDER BY`` windows with no PARTITION BY.

``redact_pii`` is regex scrubbing (emails / phone-ish runs / IPv4) as
pure JVM expressions; the patterns avoid lookarounds so the identical
regex runs on Spark (Java) and DuckDB (RE2) for the oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Replace PII-shaped spans with [TYPE] tokens; per-type match
    counts ride along for audit. Order matters: emails first (an email
    contains dots that the ipv4 pattern would otherwise nibble)."""
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.size(F.regexp_extract_all(redacted, F.lit(pat), 0))
                      .alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, f"[{name.upper()}]")
    return df.select(F.col(id_col), *counts, redacted.alias("redacted_text"))


def prefix_sum(df: DataFrame, order_col: str, value_col: str,
               out_col: str = "running_total") -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in global ``order_col``
    order, fully distributed: range-partition + sort by the key, local
    cumsum per partition, partition subtotals (one long each) to the
    driver, broadcast offsets back. Same two-phase scheme as
    utils.zip_with_index."""
    from pyspark import TaskContext

    from dask_ml_spark.utils import ensure_min_partitions

    parts = ensure_min_partitions(df).rdd.getNumPartitions()
    arranged = (df.repartitionByRange(parts, F.col(order_col))
                .sortWithinPartitions(order_col).persist())
    subtotal_schema = "pid long, subtotal double"

    def subtotals(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        tot = 0.0
        for pdf in it:
            tot += float(pdf[value_col].sum())
        yield pd.DataFrame({"pid": [pid], "subtotal": [tot]})

    rows = arranged.mapInPandas(subtotals, subtotal_schema).collect()
    offsets = {}
    acc = 0.0
    for r in sorted(rows, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["subtotal"]

    # build a fresh StructType: StructType.add mutates in place, and
    # df.schema is cached on the DataFrame — add() would corrupt the
    # caller's view of the input schema
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())])

    def local_cumsum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        run = offsets.get(pid, 0.0)
        for pdf in it:
            c = pdf[value_col].astype("float64").cumsum() + run - pdf[value_col]
            run += float(pdf[value_col].sum())
            yield pdf.assign(**{out_col: c})

    return arranged.mapInPandas(local_cumsum, out_schema)


def pack_token_shards(df: DataFrame, budget: int, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Assign each document a shard id so every shard holds ~``budget``
    tokens: shard = floor(start_offset / budget) in deterministic
    ``id_col`` order (a document may straddle a boundary by less than
    one document — the standard allowance). Returns (id, n_tokens,
    shard)."""
    from dask_ml_spark.datapipe.dedup import tokens_expr

    counted = df.select(F.col(id_col),
                        F.size(tokens_expr(F.col(text_col))).alias("n_tokens"))
    with_offset = prefix_sum(counted, id_col, "n_tokens", "start_offset")
    return with_offset.select(
        id_col, "n_tokens",
        F.floor(F.col("start_offset") / budget).cast("long").alias("shard"))
