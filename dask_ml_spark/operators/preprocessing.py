"""Column scalers and imputation.

Reference: dask_ml/preprocessing/data.py (StandardScaler 51-117,
MinMaxScaler 120-198, RobustScaler 201-300, QuantileTransformer
303-418) and dask_ml/impute.py:11-90.

Design: fit = ONE Spark hash-aggregate computing all per-column
statistics in a single pass (map-side partial aggregation, JVM
codegen); the fitted state is a small numpy vector on the driver;
transform = pure column arithmetic (no UDF, no shuffle — a narrow
projection Catalyst can fuse with downstream operators and push scans
through). This holds at 100 TB: the only data movement is the one
aggregation pass.

NaN/null semantics: Spark's avg/var_pop/min/max skip nulls natively,
matching the reference's use of nanmean/nanvar (data.py:74-81). The
driver parquet has no NaNs; fit() additionally treats NaN as null via
nanvl guards.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, TransformerMixin
from dask_ml_spark.utils import lit_array


def _nn(c: str):
    """NaN→null so aggregates skip NaNs like the reference's nan* ops."""
    col = F.col(c).cast("double")
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


class StandardScaler(BaseEstimator, TransformerMixin):
    """(x - mean) / std with std = population stddev (ddof=0), matching
    the reference's da.nanvar default (preprocessing/data.py:74-81)."""

    def __init__(self, with_mean: bool = True, with_std: bool = True):
        self.with_mean = with_mean
        self.with_std = with_std

    def fit(self, df: DataFrame, columns=None) -> "StandardScaler":
        cols = self._validate_data(df, columns)
        aggs = []
        for c in cols:
            aggs += [F.avg(_nn(c)).alias(f"mean_{c}"), F.var_pop(_nn(c)).alias(f"var_{c}")]
        row = df.agg(*aggs).collect()[0]
        self.mean_ = np.array([row[f"mean_{c}"] for c in cols], dtype="float64")
        self.var_ = np.array([row[f"var_{c}"] for c in cols], dtype="float64")
        scale = np.sqrt(self.var_)
        scale[scale == 0.0] = 1.0  # constant columns pass through
        self.scale_ = scale
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for i, c in enumerate(self.columns_):
            e = F.col(c).cast("double")
            if self.with_mean:
                e = e - F.lit(float(self.mean_[i]))
            if self.with_std:
                e = e / F.lit(float(self.scale_[i]))
            exprs[c] = e
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for i, c in enumerate(self.columns_):
            e = F.col(c).cast("double")
            if self.with_std:
                e = e * F.lit(float(self.scale_[i]))
            if self.with_mean:
                e = e + F.lit(float(self.mean_[i]))
            exprs[c] = e
        return df.withColumns(exprs)


class MinMaxScaler(BaseEstimator, TransformerMixin):
    """Affine map to feature_range (reference data.py:120-198)."""

    def __init__(self, feature_range: tuple = (0.0, 1.0)):
        self.feature_range = feature_range

    def fit(self, df: DataFrame, columns=None) -> "MinMaxScaler":
        cols = self._validate_data(df, columns)
        aggs = []
        for c in cols:
            aggs += [F.min(_nn(c)).alias(f"min_{c}"), F.max(_nn(c)).alias(f"max_{c}")]
        row = df.agg(*aggs).collect()[0]
        self.data_min_ = np.array([row[f"min_{c}"] for c in cols], dtype="float64")
        self.data_max_ = np.array([row[f"max_{c}"] for c in cols], dtype="float64")
        self.data_range_ = self.data_max_ - self.data_min_
        rng = self.data_range_.copy()
        rng[rng == 0.0] = 1.0
        lo, hi = self.feature_range
        self.scale_ = (hi - lo) / rng
        self.min_ = lo - self.data_min_ * self.scale_
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {
            c: F.col(c).cast("double") * F.lit(float(self.scale_[i]))
            + F.lit(float(self.min_[i]))
            for i, c in enumerate(self.columns_)
        }
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {
            c: (F.col(c).cast("double") - F.lit(float(self.min_[i])))
            / F.lit(float(self.scale_[i]))
            for i, c in enumerate(self.columns_)
        }
        return df.withColumns(exprs)


class RobustScaler(BaseEstimator, TransformerMixin):
    """(x - median) / IQR.

    The reference computes approximate dask percentiles
    (data.py:233-246); we use exact `percentile` here (single-pass
    sort-based agg). At extreme scale swap `percentile` for
    `percentile_approx` — same API, Greenwald-Khanna sketch — which is
    what the reference's approximation semantics allow.
    """

    def __init__(self, with_centering: bool = True, with_scaling: bool = True,
                 quantile_range: tuple = (25.0, 75.0), approximate: bool = False):
        self.with_centering = with_centering
        self.with_scaling = with_scaling
        self.quantile_range = quantile_range
        self.approximate = approximate

    def fit(self, df: DataFrame, columns=None) -> "RobustScaler":
        cols = self._validate_data(df, columns)
        q_lo, q_hi = self.quantile_range
        pct = F.percentile_approx if self.approximate else F.percentile
        probs = F.array(F.lit(q_lo / 100.0), F.lit(0.5), F.lit(q_hi / 100.0))
        aggs = [pct(_nn(c), probs).alias(f"q_{c}") for c in cols]
        row = df.agg(*aggs).collect()[0]
        center, scale = [], []
        for c in cols:
            lo, med, hi = row[f"q_{c}"]
            center.append(med)
            iqr = hi - lo
            scale.append(iqr if iqr != 0.0 else 1.0)
        self.center_ = np.array(center, dtype="float64")
        self.scale_ = np.array(scale, dtype="float64")
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for i, c in enumerate(self.columns_):
            e = F.col(c).cast("double")
            if self.with_centering:
                e = e - F.lit(float(self.center_[i]))
            if self.with_scaling:
                e = e / F.lit(float(self.scale_[i]))
            exprs[c] = e
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for i, c in enumerate(self.columns_):
            e = F.col(c).cast("double")
            if self.with_scaling:
                e = e * F.lit(float(self.scale_[i]))
            if self.with_centering:
                e = e + F.lit(float(self.center_[i]))
            exprs[c] = e
        return df.withColumns(exprs)


def _ndtri(p: np.ndarray) -> np.ndarray:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9) — scipy-free driver/executor helper."""
    p = np.asarray(p, dtype="float64")
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    out = np.empty_like(p)
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
                  ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
                   ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
                   (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
    return out


class QuantileTransformer(BaseEstimator, TransformerMixin):
    """Map each column through its empirical CDF to uniform or normal.

    Fit: per-column quantiles at an `n_quantiles` grid — the reference is
    explicitly approximate for dask inputs (data.py:303-312), so
    percentile_approx is semantics-preserving; we default to exact.
    Transform: np.interp against the broadcast quantile grid inside an
    Arrow-batched pandas UDF (no MLlib equivalent for full CDF mapping).
    """

    def __init__(self, n_quantiles: int = 1000, output_distribution: str = "uniform",
                 approximate: bool = True, accuracy: int = 10000):
        self.n_quantiles = n_quantiles
        self.output_distribution = output_distribution
        self.approximate = approximate
        # GK sketch accuracy; > n/2 makes the approx path exact (the
        # *_approx oracle's lever — same note as KBinsDiscretizer)
        self.accuracy = accuracy

    def fit(self, df: DataFrame, columns=None) -> "QuantileTransformer":
        cols = self._validate_data(df, columns)
        n = min(self.n_quantiles, df.count())
        self.references_ = np.linspace(0, 1, n, endpoint=True)
        if self.approximate:
            def pct(c, probs):
                return F.percentile_approx(c, probs, F.lit(self.accuracy))
        else:
            pct = F.percentile
        # ONE parsed literal array — per-element F.lit paid a py4j
        # round trip per grid point (n_quantiles=1000 by default)
        probs = lit_array(float(x) for x in self.references_)
        row = df.agg(*[pct(_nn(c), probs).alias(f"q_{c}") for c in cols]).collect()[0]
        self.quantiles_ = np.column_stack([np.asarray(row[f"q_{c}"], dtype="float64") for c in cols])
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        refs = self.references_
        out_dist = self.output_distribution
        eps = 1e-7
        for i, c in enumerate(self.columns_):
            quants = self.quantiles_[:, i]

            @pandas_udf("double")
            def _qt(s, quants=quants):
                import pandas as pd

                x = np.interp(s.to_numpy(dtype="float64"), quants, refs)
                if out_dist == "normal":
                    x = _ndtri(np.clip(x, eps, 1 - eps))
                return pd.Series(x)

            df = df.withColumn(c, _qt(F.col(c).cast("double")))
        return df

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        """Map transformed values back through the inverse empirical CDF
        (reference data.py:750-763 → sklearn _transform_col inverse):
        normal output first goes z → Φ(z), then the interp axes swap."""
        from pyspark.sql.functions import pandas_udf

        refs = self.references_
        out_dist = self.output_distribution
        for i, c in enumerate(self.columns_):
            quants = self.quantiles_[:, i]

            @pandas_udf("double")
            def _iqt(s, quants=quants):
                import pandas as pd

                x = s.to_numpy(dtype="float64")
                if out_dist == "normal":
                    x = _ndtr(x)
                return pd.Series(np.interp(x, refs, quants))

            df = df.withColumn(c, _iqt(F.col(c).cast("double")))
        return df


def _ndtr(z: np.ndarray) -> np.ndarray:
    """Standard-normal CDF Φ(z), scipy-free: Abramowitz-Stegun 7.1.26
    erf approximation (|abs err| < 1.5e-7), vectorized."""
    z = np.asarray(z, dtype="float64")
    x = np.abs(z) / np.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    erf = 1.0 - poly * np.exp(-x * x)
    return 0.5 * (1.0 + np.sign(z) * erf)


class PolynomialFeatures(BaseEstimator, TransformerMixin):
    """Degree-d polynomial feature expansion (reference
    data.py:1048-1158). Pure column products — a wide projection fused
    by codegen; no UDF, no shuffle. Column naming follows sklearn:
    'a', 'a b', 'a^2', …"""

    def __init__(self, degree: int = 2, interaction_only: bool = False,
                 include_bias: bool = True):
        self.degree = degree
        self.interaction_only = interaction_only
        self.include_bias = include_bias

    def _combos(self, cols):
        import itertools

        out = []
        if self.include_bias:
            out.append(())
        for d in range(1, self.degree + 1):
            comb = (itertools.combinations if self.interaction_only
                    else itertools.combinations_with_replacement)
            out.extend(comb(cols, d))
        return out

    @staticmethod
    def _name(combo) -> str:
        if not combo:
            return "1"
        parts = []
        for c in dict.fromkeys(combo):
            k = combo.count(c)
            parts.append(c if k == 1 else f"{c}^{k}")
        return " ".join(parts)

    def fit(self, df: DataFrame, columns=None) -> "PolynomialFeatures":
        cols = self._validate_data(df, columns)
        self.combos_ = self._combos(cols)
        self.feature_names_out_ = [self._name(c) for c in self.combos_]
        self.n_output_features_ = len(self.combos_)
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        new_cols = {}
        for combo, name in zip(self.combos_, self.feature_names_out_):
            if not combo:
                new_cols[name] = F.lit(1.0)
                continue
            e = F.col(combo[0]).cast("double")
            for c in combo[1:]:
                e = e * F.col(c).cast("double")
            if name not in self.columns_:
                new_cols[name] = e
        return df.withColumns(new_cols)


class SimpleImputer(BaseEstimator, TransformerMixin):
    """Fill nulls/NaNs with mean / median / most_frequent / constant
    (reference dask_ml/impute.py:11-90). Fit is one aggregate pass;
    transform is coalesce()/fillna — pure column expressions.

    The median defaults to `percentile_approx` — the reference's own
    median is dask's approximate quantile (impute.py:11-90, SURVEY
    §2.3), and the exact `F.percentile` is a single global aggregate
    that buffers every value per column, a memory hazard at 100 TB.
    Pass `exact=True` to opt into the exact median at small scale.
    """

    def __init__(self, strategy: str = "mean", fill_value=None, exact: bool = False,
                 accuracy: int = 10_000):
        if strategy not in ("mean", "median", "most_frequent", "constant"):
            raise ValueError(f"Unknown strategy {strategy!r}")
        self.strategy = strategy
        self.fill_value = fill_value
        self.exact = exact
        self.accuracy = accuracy

    def fit(self, df: DataFrame, columns=None) -> "SimpleImputer":
        if self.strategy == "constant":
            cols = resolve = self._validate_data(df, columns) if columns is not None else list(df.columns)
            self.columns_ = cols
            self.statistics_ = {c: self.fill_value for c in cols}
            return self
        cols = self._validate_data(df, columns)
        if self.strategy == "mean":
            row = df.agg(*[F.avg(_nn(c)).alias(c) for c in cols]).collect()[0]
        elif self.strategy == "median":
            if self.exact:
                row = df.agg(*[F.percentile(_nn(c), F.lit(0.5)).alias(c) for c in cols]).collect()[0]
            else:
                row = df.agg(*[
                    F.percentile_approx(_nn(c), F.lit(0.5), F.lit(self.accuracy)).alias(c)
                    for c in cols
                ]).collect()[0]
        else:  # most_frequent — deterministic mode (ties resolve by value)
            row = df.agg(*[F.mode(F.col(c), True).alias(c) for c in cols]).collect()[0]
        self.columns_ = cols
        self.statistics_ = {c: row[c] for c in cols}
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c in self.columns_:
            v = self.statistics_[c]
            col = F.col(c)
            filled = F.when(col.isNull() | F.isnan(col.cast("double")), F.lit(v)).otherwise(col)
            exprs[c] = filled.cast("double") if isinstance(v, float) else filled
        return df.withColumns(exprs)


class KBinsDiscretizer(BaseEstimator, TransformerMixin):
    """Bin continuous features into ordinal integer bins (sklearn
    KBinsDiscretizer semantics, ordinal encode) — beyond-reference
    preprocessing the scaler family composes with.

    strategy="quantile": edges are the n_bins+1 percentiles (exact
    `percentile` by default, `approximate=True` → percentile_approx —
    the 100 TB setting, same Greenwald-Khanna trade the reference's
    own quantiles make). strategy="uniform": equal-width edges from
    one min/max aggregate. Either way fit is ONE aggregate pass.

    Transform is a pure column expression: bin = number of INTERIOR
    edges <= x (left-closed bins, outside values clipped into the
    first/last bin — sklearn's convention), computed by counting a
    literal edge array. No UDF, no shuffle.
    """

    def __init__(self, n_bins: int = 5, strategy: str = "quantile",
                 approximate: bool = False, accuracy: int = 10000):
        self.n_bins = n_bins
        self.strategy = strategy
        self.approximate = approximate
        # GK sketch accuracy (rank error <= n/(2*accuracy)); raising it
        # past n/2 makes percentile_approx EXACT — how the *_approx
        # oracle pins this path against DuckDB's quantile_disc
        self.accuracy = accuracy

    def fit(self, df: DataFrame, columns=None) -> "KBinsDiscretizer":
        cols = self._validate_data(df, columns)
        k = self.n_bins
        if self.strategy == "quantile":
            if self.approximate:
                def pct(c, probs):
                    return F.percentile_approx(c, probs, F.lit(self.accuracy))
            else:
                pct = F.percentile
            probs = F.array(*[F.lit(i / k) for i in range(k + 1)])
            row = df.agg(*[pct(_nn(c), probs).alias(c) for c in cols]).collect()[0]
            edges = {c: [float(v) for v in row[c]] for c in cols}
        elif self.strategy == "uniform":
            aggs = []
            for c in cols:
                aggs += [F.min(_nn(c)).alias(f"lo_{c}"), F.max(_nn(c)).alias(f"hi_{c}")]
            row = df.agg(*aggs).collect()[0]
            edges = {
                c: [row[f"lo_{c}"] + (row[f"hi_{c}"] - row[f"lo_{c}"]) * i / k
                    for i in range(k + 1)]
                for c in cols
            }
        else:
            raise ValueError(f"unknown strategy {self.strategy!r}")
        self.bin_edges_ = edges
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c in self.columns_:
            interior = self.bin_edges_[c][1:-1]
            x = F.col(c).cast("double")
            bin_ = sum(
                ((x >= F.lit(float(e))).cast("int") for e in interior),
                F.lit(0),
            )
            exprs[c] = bin_.cast("int")
        return df.withColumns(exprs)


class Normalizer(BaseEstimator, TransformerMixin):
    """Row-wise norm scaling (sklearn Normalizer; beyond-reference):
    each row's feature vector is divided by its L1/L2/max norm — a
    stateless narrow projection (fit is a no-op), pure column
    arithmetic."""

    def __init__(self, norm: str = "l2"):
        self.norm = norm

    def fit(self, df: DataFrame, columns=None) -> "Normalizer":
        self.columns_ = self._validate_data(df, columns)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        xs = [F.col(c).cast("double") for c in self.columns_]
        if self.norm == "l2":
            n = F.sqrt(sum((x * x for x in xs), F.lit(0.0)))
        elif self.norm == "l1":
            n = sum((F.abs(x) for x in xs), F.lit(0.0))
        elif self.norm == "max":
            n = F.greatest(*[F.abs(x) for x in xs]) if len(xs) > 1 else F.abs(xs[0])
        else:
            raise ValueError(f"unknown norm {self.norm!r}")
        safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
        return df.withColumns({c: x / safe for c, x in zip(self.columns_, xs)})


class MaxAbsScaler(BaseEstimator, TransformerMixin):
    """Scale each column by its maximum absolute value (sklearn
    MaxAbsScaler; beyond-reference) — keeps zeros at zero, so it is
    the scaler of choice for sparse-ish features. One max(abs(x))
    aggregate pass; transform is a literal-folded narrow projection."""

    def fit(self, df: DataFrame, columns=None) -> "MaxAbsScaler":
        cols = self._validate_data(df, columns)
        row = df.agg(*[F.max(F.abs(_nn(c))).alias(c) for c in cols]).collect()[0]
        # sklearn keeps max_abs_=0 for an all-zero column and only
        # patches scale_ — truthiness here would misreport 0.0 as 1.0
        self.max_abs_ = [float(row[c]) if row[c] is not None else 0.0
                         for c in cols]
        self.scale_ = [m if m != 0.0 else 1.0 for m in self.max_abs_]
        self.columns_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {
            c: F.col(c).cast("double") / F.lit(s)
            for c, s in zip(self.columns_, self.scale_)
        }
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {
            c: F.col(c).cast("double") * F.lit(s)
            for c, s in zip(self.columns_, self.scale_)
        }
        return df.withColumns(exprs)


class Winsorizer(BaseEstimator, TransformerMixin):
    """Clip each column to its [lower, upper] quantiles — the standard
    outlier guard before scaling/regression (beyond-reference;
    complements RobustScaler, which rescales by quantiles but leaves
    the tails in the data). One quantile-aggregate row of driver state;
    transform is a literal-folded least/greatest projection (narrow,
    codegen, no UDF). ``approximate=True`` (default) uses the
    percentile_approx sketch — the 100 TB path; exact ``F.percentile``
    is what a SQL oracle can replay (quantile_cont)."""

    def __init__(self, lower: float = 0.05, upper: float = 0.95,
                 approximate: bool = True):
        if not 0.0 <= lower < upper <= 1.0:
            raise ValueError(f"need 0 <= lower < upper <= 1, got "
                             f"({lower}, {upper})")
        self.lower = lower
        self.upper = upper
        self.approximate = approximate

    def fit(self, df: DataFrame, columns=None) -> "Winsorizer":
        from dask_ml_spark.utils import ensure_min_partitions

        cols = self._validate_data(df, columns)
        pct = F.percentile_approx if self.approximate else F.percentile
        # BOTH quantiles of a column from ONE percentile buffer (the
        # RobustScaler array form): separate lo/hi aggregates each
        # built their own full value-counts map per column — twice the
        # per-row update work and twice the merge/sort (measured ~2x
        # on the exact path at sf0.1)
        probs = F.array(F.lit(self.lower), F.lit(self.upper))
        # spread the NARROW column projection before the buffer build:
        # a small parquet input scans as 1 partition, so the exact
        # path's value-count maps — the fit's whole compute — would
        # build in ONE task (no-op at scale, the library convention).
        # Exact percentile is partitioning-independent (sorted
        # value-count merge); the approx GK sketch is NOT, so the
        # approximate path keeps the input layout untouched.
        src = df.select(*cols)
        if not self.approximate:
            src = ensure_min_partitions(src)
        row = src.agg(*[pct(_nn(c), probs).alias(f"__q_{c}")
                        for c in cols]).collect()[0]
        self.columns_ = cols
        # an all-NULL/all-NaN column has no quantiles: record (None,
        # None) and leave it untouched at transform (MaxAbsScaler's
        # missing-aggregate convention)
        self.bounds_ = {
            c: ((float(row[f"__q_{c}"][0]), float(row[f"__q_{c}"][1]))
                if row[f"__q_{c}"] is not None else (None, None))
            for c in cols}
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c, (lo, hi) in self.bounds_.items():
            if lo is None:
                continue
            x = F.col(c).cast("double")
            # NULL/NaN must propagate, not impute: Spark's greatest
            # skips NULLs (NULL -> lo) and least treats NaN as largest
            # (NaN -> hi) — guard both like every transformer here
            exprs[c] = F.when(x.isNull() | F.isnan(x), x).otherwise(
                F.least(F.greatest(x, F.lit(lo)), F.lit(hi)))
        return df.withColumns(exprs)
