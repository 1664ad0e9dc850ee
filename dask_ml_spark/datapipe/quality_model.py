"""Weak-supervision quality classifier — the corpus-curation loop that
turns cheap heuristic labels into a model-based quality score (the
fasttext-classifier pattern of CCNet/GPT-3-style pipelines, rendered
with this repo's own distributed operators).

Flow, all Spark-first and fully value-verifiable in SQL:
  1. quality feature columns (pure JVM expressions — text_stats),
  2. a deterministic heuristic labeling rule (the weak supervision),
  3. a distributed GaussianNB fit — one groupBy(label) moments pass
     (operators/naive_bayes.py, oracle-proven),
  4. corpus-wide scoring with the fitted moments folded into the plan
     as literals: a narrow projection, no UDF, no shuffle.

At 100 TB: the fit is one aggregate over the labeled slice; scoring is
scan-speed. The model is ~#features×#classes doubles of driver state —
the same contract as k-means centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.datapipe.text_stats import quality_scores
from dask_ml_spark.operators.naive_bayes import GaussianNB

DEFAULT_FEATURES = ("distinct_ratio", "stopword_ratio", "digit_ratio")


def train_quality_classifier(docs: DataFrame, feature_cols=DEFAULT_FEATURES,
                             label_rule=None, text_col: str = "text",
                             id_col: str = "doc_id",
                             var_smoothing: float = 1e-9) -> GaussianNB:
    """Fit GaussianNB on heuristic labels. ``label_rule`` is a boolean
    Column over the quality_scores feature frame; the default marks
    longer documents (n_tokens >= 40) as positives — a length prior the
    classifier then generalizes into the ratio features."""
    feats = quality_scores(docs, text_col=text_col, id_col=id_col)
    rule = label_rule if label_rule is not None else (F.col("n_tokens") >= 40)
    # a NULL rule result (e.g. null text) must not become a third
    # label class — it would corrupt the per-class moments
    labeled = (feats.withColumn("label", rule.cast("int"))
               .where(F.col("label").isNotNull()))
    return GaussianNB(var_smoothing=var_smoothing).fit(
        labeled, columns=list(feature_cols), label_col="label")


def score_quality(docs: DataFrame, model: GaussianNB,
                  text_col: str = "text", id_col: str = "doc_id",
                  output_col: str = "quality_logit") -> DataFrame:
    """Corpus-wide quality log-odds: joint-log-likelihood(good) minus
    joint-log-likelihood(bad), as one literal-folded column expression
    (same-package use of the fitted model's JLL expressions)."""
    feats = quality_scores(docs, text_col=text_col, id_col=id_col)
    jll = model._jll_exprs()
    if len(jll) != 2:
        raise ValueError("score_quality expects a binary quality model")
    return feats.withColumn(output_col, jll[1] - jll[0])
