"""Meta-estimators: ParallelPostFit / Incremental / BlockTransformer.

Reference: dask_ml/wrappers.py (ParallelPostFit 23-417, Incremental
419-603), dask_ml/_block_transformer.py:13-108, dask_ml/_partial.py.

These carry the sklearn-protocol interop surface: any driver-side
Python estimator with fit/partial_fit/predict/transform works. The
model ships to executors once (closure/broadcast); data streams
through Arrow batches. Output schemas are declared via meta-inference
— run the model on a zero-row/1-row numpy dummy driver-side
(reference wrappers.py:642-695) — so the UDF return type is known
without touching data.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_ml_spark.base import BaseEstimator
from dask_ml_spark.utils import numpy_dtype_to_spark


def _infer_type(model, method: str, n_features: int) -> T.DataType:
    dummy = np.zeros((1, n_features), dtype="float64")
    out = np.asarray(getattr(model, method)(dummy))
    base = numpy_dtype_to_spark(out.dtype)
    if out.ndim > 1 and out.shape[1] > 1:
        return T.ArrayType(base)
    return base


class ParallelPostFit(BaseEstimator):
    """Fit on a (small) driver-side dataset / already-fitted model;
    predict/transform/score in parallel over a Spark DataFrame."""

    def __init__(self, estimator=None, scoring=None):
        self.estimator = estimator
        self.scoring = scoring

    # fitting happens driver-side on collected data — the reference's
    # semantics exactly (wrappers.py:193-213: "fit is not parallel")
    def fit(self, df_or_pdf, columns=None, label_col: str = "label", sample_rows: int | None = None,
            collect_warn_rows: int = 10_000_000):
        if isinstance(df_or_pdf, DataFrame):
            cols = self._validate_data(df_or_pdf, columns)
            sel = df_or_pdf.select(*cols, label_col)
            if sample_rows:
                sel = sel.limit(sample_rows)
            else:
                # fit is driver-side by contract (reference wrappers.py:
                # 193-213, "fit is not parallel") — but an unbounded
                # toPandas on a 100 TB table is a driver OOM, not a fit.
                # Count first (cheap: count-star over parquet) and warn
                # loudly; sample_rows= is the explicit cap.
                n = sel.count()
                if n > collect_warn_rows:
                    import warnings

                    warnings.warn(
                        f"ParallelPostFit.fit is collecting {n:,} rows to the "
                        f"driver (> {collect_warn_rows:,}); pass sample_rows= "
                        "to cap the driver-side training set, or use "
                        "Incremental for out-of-core sequential fitting",
                        ResourceWarning, stacklevel=2)
            pdf = sel.toPandas()
            X = pdf[cols].to_numpy(dtype="float64")
            y = pdf[label_col].to_numpy()
            self.estimator.fit(X, y)
            self.feature_columns_ = cols
        else:
            self.estimator.fit(*df_or_pdf)
        return self

    def _apply(self, df: DataFrame, method: str, output_col: str, columns=None) -> DataFrame:
        cols = columns or getattr(self, "feature_columns_", None) or self._validate_data(df, columns)
        self.feature_columns_ = cols
        rtype = _infer_type(self.estimator, method, len(cols))
        # explicit broadcast, not closure capture: the fitted model then
        # deserializes ONCE per executor process (Broadcast.value caches)
        # instead of once per task — the difference between shipping a
        # 100 MB forest 1x vs 10000x on a large scan
        bc = df.sparkSession.sparkContext.broadcast(self.estimator)

        @F.pandas_udf(rtype)
        def _call(*series: pd.Series) -> pd.Series:
            X = np.column_stack([s.to_numpy(dtype="float64") for s in series])
            out = np.asarray(getattr(bc.value, method)(X))
            if out.ndim > 1 and out.shape[1] > 1:
                return pd.Series(list(out))
            return pd.Series(out.ravel())

        return df.withColumn(output_col, _call(*[F.col(c).cast("double") for c in cols]))

    def predict(self, df: DataFrame, output_col: str = "prediction", columns=None) -> DataFrame:
        return self._apply(df, "predict", output_col, columns)

    def predict_proba(self, df: DataFrame, output_col: str = "probability", columns=None) -> DataFrame:
        return self._apply(df, "predict_proba", output_col, columns)

    def predict_log_proba(self, df: DataFrame, output_col: str = "log_probability", columns=None) -> DataFrame:
        out = self.predict_proba(df, output_col, columns)
        return out.withColumn(output_col, F.transform(F.col(output_col), lambda v: F.log(v)))

    def transform(self, df: DataFrame, output_col: str = "transformed", columns=None) -> DataFrame:
        return self._apply(df, "transform", output_col, columns)

    def decision_function(self, df: DataFrame, output_col: str = "decision", columns=None) -> DataFrame:
        return self._apply(df, "decision_function", output_col, columns)

    def score(self, df: DataFrame, label_col: str = "label", columns=None):
        from dask_ml_spark.functions.metrics import check_scoring, score_estimator

        scorer = check_scoring(self.estimator, self.scoring)
        if columns is not None:
            self.feature_columns_ = self._validate_data(df, columns)
        return score_estimator(scorer, self, df, label_col)


class Incremental(ParallelPostFit):
    """Sequential partial_fit across partitions (reference
    wrappers.py:419-603, _partial.py:24-157).

    The reference's `_partial_fit` chain runs each block's partial_fit
    as a worker task, handing the model future from block to block —
    the MODEL travels, the data stays put. Same topology here: one
    Spark job per block — fold-filter + coalesce(1) + Arrow
    mapInPandas — each task unpickling the current model, training on
    its block's rows executor-side, and returning only the pickled
    model (one tiny row). The driver holds nothing but the model blob
    between jobs; block data is never collected. Blocks follow the
    input partitioning (shuffle_blocks=False: fold =
    spark_partition_id) or a seeded random re-keying per epoch like
    the reference (random_state shuffles blocks, _partial.py:100-103);
    one up-front repartition("__fold") lays the persisted cache out by
    fold so each block job prunes non-matching cached batches via
    per-batch min/max stats. (The previous seeded path ran
    `sc.runJob(rdd, fn, partitions=[pid])` over a Python RDD — every
    row pickled through Python twice; the Arrow block shape measured
    2.3x faster at 600k rows.)

    deterministic_by=[key cols] replaces the seeded partition shuffle
    with CONTENT-deterministic blocks: block id = the engine-portable
    Knuth hash of the row's key mod n_blocks (the hash_split chain),
    processed in block order 0..n_blocks-1 — so block MULTISETS and
    their order are pure functions of the data, stable across
    partitionings/retries, and a SQL oracle can replay the sequential
    partial_fit chain as n_blocks chained batch-aggregate updates.
    (Row order WITHIN a block follows scan/coalesce order, which can
    differ across layouts; the partial_fit contract this enables is
    batch-aggregate math like SGDClassifier's mean-gradient step,
    which is order-free up to float association.)
    shuffle_blocks/random_state are ignored in this mode. Same
    executor topology: the model travels, block rows never reach the
    driver (each block job is one Arrow mapInPandas task returning
    only the pickled model).
    """

    def __init__(self, estimator=None, scoring=None, shuffle_blocks: bool = True,
                 random_state: int | None = None, deterministic_by=None,
                 n_blocks: int = 8):
        super().__init__(estimator, scoring)
        self.shuffle_blocks = shuffle_blocks
        self.random_state = random_state
        self.deterministic_by = (
            [deterministic_by] if isinstance(deterministic_by, str)
            else list(deterministic_by) if deterministic_by else None)
        self.n_blocks = n_blocks

    def _chain_blocks(self, sel2, n_blocks, blob, cols, label_col,
                      fit_kwargs):
        """Run the sequential block chain over a fold-keyed persisted
        frame: one Arrow job per fold, only the model blob returns."""
        for pid in range(n_blocks):
            fn = _block_partial_fit(blob, list(cols), label_col,
                                    fit_kwargs)
            out = (sel2.where(F.col("__fold") == pid)
                   .drop("__fold").coalesce(1)
                   .mapInPandas(fn, "model binary, n long")
                   .collect())
            if out and out[0]["n"] > 0:
                blob = out[0]["model"]
                self.executor_partition_fits_ += 1
        return blob

    def fit(self, df: DataFrame, columns=None, label_col: str = "label", classes=None, epochs: int = 1):
        import pickle

        cols = self._validate_data(df, columns)
        self.feature_columns_ = cols
        rng = np.random.RandomState(self.random_state)
        fit_kwargs = {}
        if classes is not None:
            fit_kwargs["classes"] = np.asarray(classes)
        blob = pickle.dumps(self.estimator)
        self.executor_partition_fits_ = 0
        if self.deterministic_by:
            # per-block job = fold-filter + coalesce(1) + Arrow
            # mapInPandas: the block's rows stream into ONE executor
            # task as Arrow batches and only the pickled model returns.
            # (The identity-partitionBy RDD alternative — one shuffle,
            # reused map side — moves every row through Python pickle
            # twice and measured 2.3x slower at 600k rows: 5.7s vs
            # 2.5s. Arrow transfer of the filtered block beats pickle
            # of everything.) The projected input is persisted once so
            # the n_blocks sequential jobs rescan the cache, not the
            # source.
            from dask_ml_spark.plans.model_selection import _hash_bucket_expr

            fold = _hash_bucket_expr(self.deterministic_by, self.n_blocks,
                                     0, df=df)
            # ONE up-front shuffle lays the cache out by fold, so each
            # block job's coalesce(1) scan prunes non-matching cached
            # batches via InMemoryTableScan's per-batch min/max stats
            # instead of re-reading everything (coalesce on an
            # unpartitioned cache was 8 serial FULL scans — 4x at sf1;
            # a repartition(1) per fold paid 8 shuffles). Measured:
            # 13.6s -> 7.4s at sf1, 2.3x for 10x rows.
            sel2 = (df.select(fold.cast("int").alias("__fold"),
                              *cols, label_col)
                    .repartition(self.n_blocks, "__fold").persist())
            try:
                # a NULL key hashes to a NULL fold, which matches NO
                # block filter — those rows would silently vanish from
                # training (review-caught); fail loudly instead
                n_null = sel2.where(F.col("__fold").isNull()).count()
                if n_null:
                    raise ValueError(
                        f"deterministic_by={self.deterministic_by} has "
                        f"NULL keys in {n_null} rows — they would be "
                        "silently excluded from every block; drop or "
                        "fill them first")
                for _ in range(epochs):
                    blob = self._chain_blocks(sel2, self.n_blocks, blob,
                                              cols, label_col, fit_kwargs)
            finally:
                sel2.unpersist()
            self.estimator = pickle.loads(blob)
            return self
        # seeded default: blocks follow the input partition count; the
        # per-epoch fold column (seeded random re-key, or the scan's
        # partition id when shuffle_blocks=False) feeds the SAME Arrow
        # block machinery as the deterministic path. Note: the fold
        # repartition means WITHIN-block row order follows shuffle
        # fetch order — partial_fit sees each block's rows in an
        # unspecified order, which matches the reference's contract
        # (blocks, not rows, are the training unit).
        sel = df.select(*cols, label_col)
        n_parts = max(1, sel.rdd.getNumPartitions())
        for _ in range(epochs):
            if self.shuffle_blocks:
                fold = F.floor(F.rand(int(rng.randint(2 ** 31)))
                               * n_parts)
            else:
                # pmod clamp: if the execution-time scan yields MORE
                # partitions than the planning-time snapshot, a raw
                # partition id >= n_parts would fall outside the block
                # loop's range and those rows would silently never
                # train (review-caught)
                fold = F.pmod(F.spark_partition_id(), F.lit(n_parts))
            sel2 = (sel.withColumn("__fold", fold.cast("int"))
                    .repartition(n_parts, "__fold").persist())
            try:
                blob = self._chain_blocks(sel2, n_parts, blob, cols,
                                          label_col, fit_kwargs)
            finally:
                sel2.unpersist()
        self.estimator = pickle.loads(blob)
        return self

    partial_fit = fit


def _block_partial_fit(blob, cols, label_col, fit_kwargs):
    """Executor-side Arrow task for one deterministic Incremental
    block: concatenate the block's Arrow batches, train the pickled
    model, return (pickled model, row count) — one tiny row."""

    def fn(it):
        import pickle as _pk

        pdfs = [p for p in it]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            if len(pdf):
                model = _pk.loads(blob)
                model.partial_fit(pdf[list(cols)].to_numpy(dtype="float64"),
                                  pdf[label_col].to_numpy(), **fit_kwargs)
                yield pd.DataFrame({"model": [_pk.dumps(model)],
                                    "n": [len(pdf)]})
                return
        yield pd.DataFrame({"model": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype="int64")})

    return fn


class BlockTransformer(BaseEstimator):
    """Apply an arbitrary stateless function per partition (reference
    _block_transformer.py:13-108). func: pandas.DataFrame →
    pandas.DataFrame with the same schema (or declare one)."""

    def __init__(self, func: Callable[[pd.DataFrame], pd.DataFrame], schema=None, **kwargs):
        self.func = func
        self.schema = schema
        self.kwargs = kwargs

    def required_input_columns(self, columns):
        # the arbitrary per-partition func sees the WHOLE frame —
        # planners must not prune around it
        return None

    def fit(self, df: DataFrame, columns=None) -> "BlockTransformer":
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        func, kwargs = self.func, self.kwargs
        schema = self.schema or df.schema

        def _block(it):
            for pdf in it:
                yield func(pdf, **kwargs)

        return df.mapInPandas(_block, schema=schema)

    fit_transform = transform
