import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dask_ml_spark import get_spark

    s = get_spark(app_name="dask_ml_spark-tests", shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def xy_classification(spark):
    """F1 fixture: 100x20 classification frame (FIXTURES.md)."""
    from dask_ml_spark.datasets import make_classification

    return make_classification(100, 20, random_state=0, n_partitions=4, spark=spark).cache()


@pytest.fixture(scope="session")
def xy_regression(spark):
    from dask_ml_spark.datasets import make_regression

    return make_regression(100, 5, n_informative=3, random_state=0, n_partitions=4, spark=spark).cache()


@pytest.fixture(scope="session")
def blobs(spark):
    from dask_ml_spark.datasets import make_blobs

    centers = np.array([[-7.0, -7.0], [0.0, 0.0], [7.0, 7.0]])
    return make_blobs(300, 2, centers=centers, cluster_std=0.3,
                      random_state=0, n_partitions=4, spark=spark).cache()


def assert_frame_close(spark_df, expected_pdf, sort_by=None, atol=1e-8, rtol=1e-6):
    got = spark_df.toPandas()
    if sort_by:
        got = got.sort_values(sort_by).reset_index(drop=True)
        expected_pdf = expected_pdf.sort_values(sort_by).reset_index(drop=True)
    assert list(got.columns) == list(expected_pdf.columns), (got.columns, expected_pdf.columns)
    for c in got.columns:
        if np.issubdtype(np.asarray(expected_pdf[c]).dtype, np.number):
            np.testing.assert_allclose(
                got[c].to_numpy(dtype="float64"),
                expected_pdf[c].to_numpy(dtype="float64"),
                atol=atol, rtol=rtol, err_msg=f"column {c}",
            )
        else:
            assert got[c].tolist() == expected_pdf[c].tolist(), f"column {c}"
