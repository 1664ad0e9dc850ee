"""dask_ml.metrics-compatible namespace."""

from dask_ml_spark.functions.metrics import (  # noqa: F401
    SCORERS,
    accuracy_score,
    check_scoring,
    get_scorer,
    log_loss,
    mean_absolute_error,
    mean_absolute_percentage_error,
    mean_squared_error,
    mean_squared_log_error,
    r2_score,
    roc_auc_score,
    confusion_matrix,
    calibration_curve,
    precision_recall_f1,
    precision_score,
    recall_score,
    f1_score,
)
from dask_ml_spark.operators.pairwise import (  # noqa: F401
    euclidean_distances,
    linear_kernel,
    pairwise_distances,
    pairwise_distances_argmin_min,
    pairwise_kernels,
    polynomial_kernel,
    rbf_kernel,
    sigmoid_kernel,
)
