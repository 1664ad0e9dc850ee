"""dask_ml.model_selection-compatible namespace."""

from dask_ml_spark.plans.incremental import (  # noqa: F401
    HyperbandSearchCV,
    IncrementalSearchCV,
    InverseDecaySearchCV,
    SuccessiveHalvingSearchCV,
)
from dask_ml_spark.plans.model_selection import (  # noqa: F401
    GridSearchCV,
    GroupKFold,
    HashKFold,
    KFold,
    ParameterGrid,
    ParameterSampler,
    RandomizedSearchCV,
    ShuffleSplit,
    TimeSeriesSplit,
    check_cv,
    compute_n_splits,
    group_shuffle_split,
    train_test_split,
)
