"""dask_ml.preprocessing-compatible namespace
(reference dask_ml/preprocessing/__init__.py)."""

from dask_ml_spark.operators.encoders import (  # noqa: F401
    Categorizer,
    TargetEncoder,
    DummyEncoder,
    LabelEncoder,
    OneHotEncoder,
    OrdinalEncoder,
)
from dask_ml_spark.operators.preprocessing import (  # noqa: F401
    MaxAbsScaler,
    MinMaxScaler,
    Normalizer,
    PolynomialFeatures,
    KBinsDiscretizer,
    QuantileTransformer,
    RobustScaler,
    SimpleImputer,
    Winsorizer,
    StandardScaler,
)
from dask_ml_spark.operators.wrappers import BlockTransformer  # noqa: F401
