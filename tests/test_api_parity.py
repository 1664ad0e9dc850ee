"""Public-API parity: every name the reference documents
(docs/source/modules/api.rst) resolves at the same import path here.
``dask_ml.xgboost.train/predict`` are exempt — that namespace is gated
on the external xgboost package in BOTH libraries."""

import importlib

import pytest

API = [
    "cluster.KMeans", "cluster.SpectralClustering",
    "compose.ColumnTransformer", "compose.make_column_transformer",
    "decomposition.IncrementalPCA", "decomposition.PCA", "decomposition.TruncatedSVD",
    "ensemble.BlockwiseVotingClassifier", "ensemble.BlockwiseVotingRegressor",
    "feature_extraction.text.CountVectorizer", "feature_extraction.text.FeatureHasher",
    "feature_extraction.text.HashingVectorizer",
    "impute.SimpleImputer",
    "linear_model.LinearRegression", "linear_model.LogisticRegression",
    "linear_model.PoissonRegression",
    "datasets.make_blobs", "datasets.make_classification",
    "datasets.make_classification_df", "datasets.make_counts", "datasets.make_regression",
    "metrics.accuracy_score", "metrics.log_loss", "metrics.mean_absolute_error",
    "metrics.mean_absolute_percentage_error", "metrics.mean_squared_error",
    "metrics.mean_squared_log_error", "metrics.r2_score",
    "metrics.get_scorer", "metrics.check_scoring",
    "model_selection.GridSearchCV", "model_selection.RandomizedSearchCV",
    "model_selection.HyperbandSearchCV", "model_selection.IncrementalSearchCV",
    "model_selection.InverseDecaySearchCV", "model_selection.SuccessiveHalvingSearchCV",
    "model_selection.KFold", "model_selection.ShuffleSplit",
    "model_selection.train_test_split", "model_selection.check_cv",
    "model_selection.compute_n_splits",
    "naive_bayes.GaussianNB",
    "preprocessing.BlockTransformer", "preprocessing.Categorizer",
    "preprocessing.DummyEncoder", "preprocessing.LabelEncoder",
    "preprocessing.MinMaxScaler", "preprocessing.OneHotEncoder",
    "preprocessing.OrdinalEncoder", "preprocessing.PolynomialFeatures",
    "preprocessing.QuantileTransformer", "preprocessing.RobustScaler",
    "preprocessing.StandardScaler",
    "wrappers.Incremental", "wrappers.ParallelPostFit",
]


@pytest.mark.parametrize("name", API)
def test_api_name_resolves(name):
    mod, _, attr = name.rpartition(".")
    m = importlib.import_module(f"dask_ml_spark.{mod}")
    assert getattr(m, attr) is not None


def test_glm_solver_names_accepted():
    """Reference glm.py:61-64: all five solver names construct."""
    from dask_ml_spark.linear_model import LogisticRegression

    for s in ("admm", "gradient_descent", "newton", "lbfgs", "proximal_grad"):
        LogisticRegression(solver=s)
