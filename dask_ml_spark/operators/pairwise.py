"""Pairwise distances and kernels against a small in-memory Y.

Reference: dask_ml/metrics/pairwise.py — Y is REQUIRED to be a small
numpy matrix (pairwise.py:57-58); each partition computes its block
against broadcast Y. Same here: Y rides inside an Arrow-batched
pandas UDF closure (Spark broadcasts the serialized function), X
streams through in Arrow batches — a narrow map, no shuffle.

numpy-only kernel math (no scipy/sklearn in the image).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- driver-side kernel math (numpy) ------------------------------------

def euclidean_distances_matrix(X: np.ndarray, Y: np.ndarray, squared: bool = False) -> np.ndarray:
    """-2 X·Yᵀ + ‖X‖² + ‖Y‖² expansion (reference pairwise.py:70-105)."""
    XX = (X * X).sum(axis=1)[:, None]
    YY = (Y * Y).sum(axis=1)[None, :]
    D = XX + YY - 2.0 * (X @ Y.T)
    np.maximum(D, 0.0, out=D)
    return D if squared else np.sqrt(D)


def linear_kernel_matrix(X, Y):
    return X @ Y.T


def polynomial_kernel_matrix(X, Y, degree=3, gamma=None, coef0=1.0):
    gamma = gamma if gamma is not None else 1.0 / X.shape[1]
    return (gamma * (X @ Y.T) + coef0) ** degree


def sigmoid_kernel_matrix(X, Y, gamma=None, coef0=1.0):
    gamma = gamma if gamma is not None else 1.0 / X.shape[1]
    return np.tanh(gamma * (X @ Y.T) + coef0)


def rbf_kernel_matrix(X, Y, gamma=None):
    gamma = gamma if gamma is not None else 1.0 / X.shape[1]
    return np.exp(-gamma * euclidean_distances_matrix(X, Y, squared=True))


KERNELS = {
    "linear": linear_kernel_matrix,
    "polynomial": polynomial_kernel_matrix,
    "poly": polynomial_kernel_matrix,
    "sigmoid": sigmoid_kernel_matrix,
    "rbf": rbf_kernel_matrix,
}


# --- JVM expression fast path for small Y --------------------------------
#
# When k·d is small the whole K(x, Y) block is cheaper as plain column
# expressions — it stays inside whole-stage codegen with no Arrow round
# trip. Above the budget (wide Y), the Arrow-batched UDF with BLAS-shaped
# numpy wins. Output (array<double>) is identical either way.

_EXPR_TERM_BUDGET = 512


def _qcol(name: str) -> str:
    """Backtick-quoted column reference for generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def _dot_sql(cols, y) -> str:
    """x·y as ONE SQL fragment — the same left-associative
    0.0 + c₀·y₀ + … chain the Column loop built (zero weights skipped
    identically), so the parsed tree and results are bit-identical.
    Built as a string because the per-element F.lit/F.col loop paid
    ~4·d py4j round trips per Y row (guide §7.3 driver-side plans;
    the same conversion measured on the ANN builders in §B)."""
    from dask_ml_spark.utils import sql_scalar_lit
    terms = ["0.0D"]
    for c, v in zip(cols, y):
        if v != 0.0:
            terms.append(f"CAST({_qcol(c)} AS DOUBLE) * {sql_scalar_lit(float(v))}")
    return " + ".join(terms)


def _sqdist_sql(cols, y) -> str:
    """‖x−y‖² as ONE SQL fragment (same tree as the old Column loop:
    0.0 + (c−v)·(c−v) + … left-associative, cast/literal typing
    exactly as F.col().cast('double') / F.lit(float))."""
    from dask_ml_spark.utils import sql_scalar_lit
    terms = ["0.0D"]
    for c, v in zip(cols, y):
        d = f"(CAST({_qcol(c)} AS DOUBLE) - {sql_scalar_lit(float(v))})"
        terms.append(f"{d} * {d}")
    return " + ".join(terms)


def _small_y_sqls(cols, Y, metric, **kwds):
    """One SQL fragment per Y row, or None when the metric/size needs
    the UDF path. Distance metrics use the direct (x-y)² form (more
    accurate than the UDF's -2XY+X²+Y² expansion, same semantics)."""
    from dask_ml_spark.utils import sql_scalar_lit
    if callable(metric) or len(Y) * len(cols) > _EXPR_TERM_BUDGET:
        return None
    g = kwds.get("gamma")
    g = g if g is not None else 1.0 / len(cols)
    coef0 = float(kwds.get("coef0", 1.0))
    degree = float(kwds.get("degree", 3))
    if metric == "linear":
        return [_dot_sql(cols, y) for y in Y]
    if metric == "rbf":
        ng = sql_scalar_lit(-float(g))
        return [f"EXP({ng} * ({_sqdist_sql(cols, y)}))" for y in Y]
    if metric in ("polynomial", "poly"):
        gl, c0, dg = (sql_scalar_lit(float(g)), sql_scalar_lit(coef0),
                      sql_scalar_lit(degree))
        return [f"POWER({gl} * ({_dot_sql(cols, y)}) + {c0}, {dg})" for y in Y]
    if metric == "sigmoid":
        gl, c0 = sql_scalar_lit(float(g)), sql_scalar_lit(coef0)
        return [f"TANH({gl} * ({_dot_sql(cols, y)}) + {c0})" for y in Y]
    if metric == "euclidean":
        return [f"SQRT({_sqdist_sql(cols, y)})" for y in Y]
    if metric == "sqeuclidean":
        return [_sqdist_sql(cols, y) for y in Y]
    if metric == "manhattan":
        sqls = []
        for y in Y:
            terms = ["0.0D"]
            for c, v in zip(cols, y):
                terms.append(
                    f"ABS(CAST({_qcol(c)} AS DOUBLE) - {sql_scalar_lit(float(v))})")
            sqls.append(" + ".join(terms))
        return sqls
    return None


def _small_y_exprs(cols, Y, metric, **kwds):
    """One JVM expression per Y row (each parsed from a single SQL
    string — see _small_y_sqls), or None for the UDF path."""
    sqls = _small_y_sqls(cols, Y, metric, **kwds)
    if sqls is None:
        return None
    return [F.expr(s) for s in sqls]


# --- distributed forms ---------------------------------------------------

def pairwise_distances(df: DataFrame, columns, Y: np.ndarray,
                       metric: str = "euclidean", output_col: str = "distances") -> DataFrame:
    """Distance from each row to every row of broadcast Y →
    array<double> column of length len(Y) (reference pairwise.py:50-67)."""
    Y = np.asarray(Y, dtype="float64")
    cols = list(columns)
    sqls = _small_y_sqls(cols, Y, metric)
    if sqls is not None:
        return df.withColumn(output_col, F.expr("array(" + ", ".join(sqls) + ")"))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _dist(*series: pd.Series) -> pd.Series:
        X = np.column_stack([s.to_numpy(dtype="float64") for s in series])
        if metric == "euclidean":
            D = euclidean_distances_matrix(X, Y)
        elif metric == "sqeuclidean":
            D = euclidean_distances_matrix(X, Y, squared=True)
        elif metric == "cosine":
            Xn = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-15)
            Yn = Y / np.maximum(np.linalg.norm(Y, axis=1)[:, None], 1e-15)
            D = 1.0 - Xn @ Yn.T
        elif metric == "manhattan":
            D = np.abs(X[:, None, :] - Y[None, :, :]).sum(axis=2)
        else:
            raise ValueError(f"Unknown metric {metric!r}")
        return pd.Series(list(D))

    return df.withColumn(output_col, _dist(*[F.col(c).cast("double") for c in cols]))


def pairwise_distances_argmin_min(df: DataFrame, columns, Y: np.ndarray,
                                  argmin_col: str = "argmin", min_col: str = "min_dist") -> DataFrame:
    """Per-row nearest index into Y + the distance (reference
    pairwise.py:19-47) — the k-means assignment primitive."""
    out = pairwise_distances(df, columns, Y, metric="euclidean", output_col="__d")
    return (
        out.withColumn(min_col, F.array_min("__d"))
        .withColumn(argmin_col, (F.array_position("__d", F.col(min_col)) - 1).cast("int"))
        .drop("__d")
    )


def pairwise_kernels(df: DataFrame, columns, Y: np.ndarray, metric: str = "linear",
                     output_col: str = "kernel", **kwds) -> DataFrame:
    """Kernel block K(x_row, Y) as array<double> (reference
    pairwise.py:136-226)."""
    Y = np.asarray(Y, dtype="float64")
    cols = list(columns)
    sqls = _small_y_sqls(cols, Y, metric, **kwds)
    if sqls is not None:
        return df.withColumn(output_col, F.expr("array(" + ", ".join(sqls) + ")"))
    if callable(metric):
        kfn = metric
    else:
        kfn = KERNELS[metric]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _kern(*series: pd.Series) -> pd.Series:
        X = np.column_stack([s.to_numpy(dtype="float64") for s in series])
        K = kfn(X, Y, **kwds)
        return pd.Series(list(K))

    return df.withColumn(output_col, _kern(*[F.col(c).cast("double") for c in cols]))


def euclidean_distances(df: DataFrame, columns, Y: np.ndarray, output_col: str = "distances") -> DataFrame:
    return pairwise_distances(df, columns, Y, metric="euclidean", output_col=output_col)


def rbf_kernel(df: DataFrame, columns, Y, gamma=None, output_col: str = "kernel") -> DataFrame:
    return pairwise_kernels(df, columns, Y, metric="rbf", output_col=output_col, gamma=gamma)


def linear_kernel(df: DataFrame, columns, Y, output_col: str = "kernel") -> DataFrame:
    return pairwise_kernels(df, columns, Y, metric="linear", output_col=output_col)


def polynomial_kernel(df: DataFrame, columns, Y, degree=3, gamma=None, coef0=1.0, output_col: str = "kernel") -> DataFrame:
    return pairwise_kernels(df, columns, Y, metric="polynomial", output_col=output_col,
                            degree=degree, gamma=gamma, coef0=coef0)


def sigmoid_kernel(df: DataFrame, columns, Y, gamma=None, coef0=1.0, output_col: str = "kernel") -> DataFrame:
    return pairwise_kernels(df, columns, Y, metric="sigmoid", output_col=output_col, gamma=gamma, coef0=coef0)
