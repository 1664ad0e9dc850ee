"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001 (scaler → split →
                logistic regression → predict → metrics), plus the
                TPC-H-style pricing summary, returned as one small
                result DataFrame.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                datapipe), from dask_ml_spark.plans.queries
                (233 entries as of round 11).
oracle_sql()  — the DuckDB-equivalent SQL for every hash-checkable
                query (225); the 8 iterative/seeded ops are rows-only
                by design, each value-checked another way (see README).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dask_ml_spark.plans.queries import build_catalog

_QUERIES, _ORACLES = build_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dask_ml_spark.plans.queries import q_logistic_regression_eval

    return q_logistic_regression_eval(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
