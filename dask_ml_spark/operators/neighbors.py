"""k-nearest-neighbor prediction (classifier + regressor).

Beyond-reference (dask-ml has no neighbors module; sklearn's
KNeighborsClassifier is the local workhorse this mirrors): predict a
test row's label from its k nearest TRAIN rows — majority vote
(classifier, ties to the smallest label) or mean (regressor).

Spark-first shape:
- the TRAIN side is the corpus (100 TB); the TEST side is a bounded
  evaluation batch (the ANN-search query contract). `kneighbors`
  broadcasts the test rows and scores them against the train scan in
  ONE narrow pass — a broadcast nested-loop by construction, which is
  the brute-force contract (exact, linear in |train|·|test|) — then
  prunes with the two-stage skew-safe top-k so no per-query window
  partition ever holds the corpus.
- at real scale, pass ``index=`` (a fitted CosineLSHIndex / IVFIndex /
  PQIndex from datapipe.similarity): neighbors then come from the ANN
  index's pruned search instead of the brute-force scan, and the vote/
  mean runs over its candidates — the classifier is a thin aggregation
  over whichever neighbor generator fits the scale.
- features: either a numeric column list (assembled into an array
  projection — the tabular estimators' convention) or an existing
  array column via ``vec_col`` (the embedding-pipeline convention).
- everything downstream of the scoring is exact integer/window logic,
  so a SQL oracle replays the whole prediction (see the
  `knn_classifier_eval` catalog query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_ml_spark.base import BaseEstimator, ClassifierMixin, RegressorMixin


def _vec(df: DataFrame, columns, vec_col):
    if vec_col is not None:
        return F.col(vec_col)
    return F.array(*[F.col(c).cast("double") for c in columns])


def _sqdist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-30))


class _KNeighborsBase(BaseEstimator):
    def __init__(self, n_neighbors: int = 5, metric: str = "euclidean",
                 vec_col: str | None = None, index=None):
        self.n_neighbors = n_neighbors
        self.metric = metric
        self.vec_col = vec_col
        self.index = index

    def fit(self, df: DataFrame, columns=None, label_col: str = "label",
            id_col: str = "doc_id"):
        if self.vec_col is None and not columns:
            raise ValueError("pass feature columns or vec_col")
        self.columns_ = list(columns) if columns else None
        self.label_col_ = label_col
        self.id_col_ = id_col
        self.train_ = df.select(
            F.col(id_col).alias("__tid"),
            _vec(df, self.columns_, self.vec_col).alias("__tvec"),
            F.col(label_col).alias("__tlabel"))
        return self

    def kneighbors(self, df: DataFrame, query_id_col: str) -> DataFrame:
        """(query_id, __tid, dist|score, rank <= n_neighbors, __tlabel).

        Brute-force: broadcast the bounded test batch against the
        train scan; index-backed: the ANN index's pruned candidates,
        labels joined back on the train id.

        Index-path id contract: the ANN indexes drop candidate pairs
        whose query id EQUALS the corpus id (their self-join
        convention), so test ids must be DISJOINT from train ids when
        ``index=`` is set — a test row sharing a train row's id would
        silently lose that train row as a neighbor. The brute-force
        path has no such constraint (ids never meet in a predicate)."""
        from dask_ml_spark.datapipe.similarity import _skew_safe_topk

        k = self.n_neighbors
        if self.index is not None:
            import inspect

            params = inspect.signature(self.index.search).parameters
            kw = {("k" if "k" in params else "topk"): k,
                  "query_id_col": query_id_col}
            neigh = self.index.search(
                self.train_.select(F.col("__tid").alias(self.index.id_col),
                                   F.col("__tvec").alias(self.index.vec_col)),
                df.select(F.col(query_id_col),
                          _vec(df, self.columns_, self.vec_col)
                          .alias(self.index.vec_col)),
                **kw)
            neigh = neigh.select(query_id_col,
                                 F.col(self.index.id_col).alias("__tid"),
                                 "score", "rank")
            return neigh.join(
                self.train_.select("__tid", "__tlabel"), "__tid")
        q = df.select(F.col(query_id_col),
                      _vec(df, self.columns_, self.vec_col).alias("__qvec"))
        # spread the train side before the |train|x|test| distance scan:
        # a small parquet input scans as 1 partition, serializing the
        # whole brute-force compute onto one core (no-op at corpus
        # scale). Bit-safe: scores are row-local JVM folds and
        # _skew_safe_topk tie-breaks on (score, id).
        from dask_ml_spark.utils import ensure_min_partitions

        joined = ensure_min_partitions(self.train_).crossJoin(F.broadcast(q))
        if self.metric == "cosine":
            scored = joined.select(
                query_id_col, "__tid", "__tlabel",
                _cosine(F.col("__tvec"), F.col("__qvec")).alias("score"))
            return _skew_safe_topk(scored, query_id_col, "__tid", k,
                                   ascending=False)
        scored = joined.select(
            query_id_col, "__tid", "__tlabel",
            _sqdist(F.col("__tvec"), F.col("__qvec")).alias("score"))
        return _skew_safe_topk(scored, query_id_col, "__tid", k,
                               ascending=True)


class KNeighborsClassifier(_KNeighborsBase, ClassifierMixin):
    """Majority vote over the k nearest train labels; vote ties break
    to the SMALLEST label (deterministic, engine-portable)."""

    def predict(self, df: DataFrame, query_id_col: str = "doc_id",
                output_col: str = "prediction",
                neighbors: DataFrame | None = None) -> DataFrame:
        """``neighbors``: a precomputed ``kneighbors`` frame (same
        query batch / k / metric) — lets a classifier and regressor
        over the same geometry share ONE neighbor search instead of
        recomputing the scan-and-rank per head."""
        from pyspark.sql import Window

        neigh = (self.kneighbors(df, query_id_col)
                 if neighbors is None else neighbors)
        votes = (neigh.groupBy(query_id_col, "__tlabel")
                 .agg(F.count(F.lit(1)).alias("__votes")))
        # per-query partitions hold <= n_distinct_labels rows, so the
        # window is hot-group-safe; ties rank the smallest label first
        # (works for numeric AND string labels)
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("__votes"), F.asc("__tlabel"))
        return (votes.withColumn("__r", F.row_number().over(w))
                .where(F.col("__r") == 1)
                .select(query_id_col, F.col("__tlabel").alias(output_col)))


class KNeighborsRegressor(_KNeighborsBase, RegressorMixin):
    """Mean of the k nearest train labels."""

    def predict(self, df: DataFrame, query_id_col: str = "doc_id",
                output_col: str = "prediction",
                neighbors: DataFrame | None = None) -> DataFrame:
        """``neighbors`` as in KNeighborsClassifier.predict."""
        neigh = (self.kneighbors(df, query_id_col)
                 if neighbors is None else neighbors)
        return (neigh.groupBy(query_id_col)
                .agg(F.avg(F.col("__tlabel").cast("double"))
                     .alias(output_col)))
