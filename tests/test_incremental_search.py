"""Adaptive search engines (reference tests/model_selection/
test_incremental.py, test_hyperband.py, test_successive_halving.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.local_estimators import SGDClassifier
from dask_ml_spark.plans.incremental import (
    HyperbandSearchCV,
    IncrementalSearchCV,
    InverseDecaySearchCV,
    SuccessiveHalvingSearchCV,
    _sha_steps,
)

PARAMS = {"lr": [0.01, 0.05, 0.1, 0.5], "alpha": [1e-5, 1e-4, 1e-3]}
FEATS = [f"f{j}" for j in range(20)]


@pytest.fixture(scope="module")
def big_classification(spark):
    from dask_ml_spark.datasets import make_classification

    return make_classification(2000, 20, n_informative=4, random_state=1,
                               n_partitions=8, spark=spark).cache()


def test_incremental_search(big_classification):
    s = IncrementalSearchCV(SGDClassifier(), PARAMS, n_initial_parameters=5,
                            max_iter=10, random_state=0)
    s.fit(big_classification, FEATS, classes=[0, 1])
    assert s.n_models_ == 5
    assert 0.3 <= s.best_score_ <= 1.0
    assert s.best_params_["lr"] in PARAMS["lr"]
    assert len(s.history_) >= 5
    acc = s.score(big_classification)
    assert acc > 0.5
    # every model trained to max_iter (no early drop without patience)
    assert all(c == 10 for c in s.cv_results_["partial_fit_calls"])
    # distributed post-fit surface (reference _incremental.py:745-785)
    proba = s.predict_proba(big_classification).select("probability").toPandas()
    assert proba["probability"].map(len).eq(2).all()
    dec = s.decision_function(big_classification).select("decision").toPandas()
    assert np.isfinite(dec["decision"].to_numpy(dtype=float)).all()


def test_fits_run_on_executors(big_classification):
    """Training happens inside Spark tasks, not driver threads: the
    engine's accumulator counts every executor-side partial_fit call
    (reference trains each model as a worker future,
    _incremental.py:280-364)."""
    s = IncrementalSearchCV(SGDClassifier(), PARAMS, n_initial_parameters=3,
                            max_iter=4, random_state=0)
    s.fit(big_classification, FEATS, classes=[0, 1])
    assert s.executor_fit_count_ == 3 * 4
    assert s.executor_fit_count_ == sum(s.cv_results_["partial_fit_calls"])


def test_incremental_search_patience(big_classification):
    s = IncrementalSearchCV(SGDClassifier(), PARAMS, n_initial_parameters=5,
                            max_iter=50, patience=2, tol=0.1, random_state=0)
    s.fit(big_classification, FEATS, classes=[0, 1])
    # plateau stopping should prevent most models reaching 50 calls
    assert max(s.cv_results_["partial_fit_calls"]) < 50


def test_sha_steps():
    steps = _sha_steps(9, 1, 3)
    assert steps[0] == (9, 1)
    assert steps[1] == (3, 3)
    assert steps[2] == (1, 9)


def test_successive_halving(big_classification):
    s = SuccessiveHalvingSearchCV(SGDClassifier(), PARAMS, n_initial_parameters=9,
                                  n_initial_iter=1, random_state=0, max_iter=30)
    s.fit(big_classification, FEATS, classes=[0, 1])
    calls = np.asarray(s.cv_results_["partial_fit_calls"])
    # budget concentrates: one model trained ≥ 9 calls, most stopped at 1
    assert calls.max() >= 9
    assert (calls <= 1).sum() >= 5
    assert s.best_score_ > 0.4


def test_inverse_decay(big_classification):
    s = InverseDecaySearchCV(SGDClassifier(), PARAMS, n_initial_parameters=6,
                             max_iter=8, random_state=0)
    s.fit(big_classification, FEATS, classes=[0, 1])
    calls = np.asarray(s.cv_results_["partial_fit_calls"])
    assert calls.max() <= 8
    assert (calls == calls.max()).sum() <= 2  # only survivors keep training


def test_hyperband(big_classification):
    h = HyperbandSearchCV(SGDClassifier(), PARAMS, max_iter=9, random_state=0)
    h.fit(big_classification, FEATS, classes=[0, 1])
    assert len(h.metadata["brackets"]) == 3  # s_max = log3(9) = 2 → 3 brackets
    assert h.metadata["n_models"] == sum(b["n_models"] for b in h.metadata["brackets"])
    assert h.best_score_ > 0.4
    assert h.score(big_classification) > 0.5
    assert len(h.cv_results_["params"]) == h.metadata["n_models"]


def test_string_scoring_rejected(big_classification):
    """String scorer names are a GridSearchCV concept; the adaptive
    engine scores executor-side on numpy and must fail loudly instead
    of silently falling back to est.score."""
    s = IncrementalSearchCV(SGDClassifier(), PARAMS, n_initial_parameters=2,
                            max_iter=2, random_state=0, scoring="roc_auc")
    with pytest.raises(ValueError, match="callable"):
        s.fit(big_classification, FEATS, classes=[0, 1])


def test_collect_batches_respects_max_total_rows(spark):
    """Driver-memory regression pin (VERDICT r4 #6): a DataFrame above
    the cap must materialize at most max_total_rows rows, split into
    <=max_rows_per_batch batches, and the capped sample must be a
    seeded unbiased draw (both classes present, stable across calls)."""
    import numpy as np

    from dask_ml_spark.plans.incremental import _collect_batches

    n = 5_000
    df = (spark.range(n)
          .select((F.col("id") % 97).cast("double").alias("x0"),
                  (F.col("id") % 2).cast("double").alias("label")))
    batches = _collect_batches(df, ["x0"], "label",
                               max_rows_per_batch=150, max_total_rows=1_000)
    total = sum(len(y) for _, y in batches)
    assert total == 1_000
    assert all(len(y) <= 150 for _, y in batches)
    ys = np.concatenate([y for _, y in batches])
    # unbiased: the 50/50 class mix survives sampling (binomial 3-sigma)
    assert abs(ys.mean() - 0.5) < 3 * 0.5 / np.sqrt(1_000)
    # seeded: a second draw returns the same sample
    again = _collect_batches(df, ["x0"], "label",
                             max_rows_per_batch=150, max_total_rows=1_000)
    ys2 = np.concatenate([y for _, y in again])
    xs = np.concatenate([x[:, 0] for x, _ in batches])
    xs2 = np.concatenate([x[:, 0] for x, _ in again])
    np.testing.assert_array_equal(np.sort(xs), np.sort(xs2))
    np.testing.assert_array_equal(np.sort(ys), np.sort(ys2))
    # under the cap: nothing dropped
    full = _collect_batches(df, ["x0"], "label",
                            max_rows_per_batch=2_000, max_total_rows=None)
    assert sum(len(y) for _, y in full) == n
