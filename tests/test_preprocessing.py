"""Scalers/imputer vs numpy oracle (reference pattern:
assert_estimator_equal vs sklearn, tests/preprocessing/test_data.py)."""

import numpy as np
import pandas as pd
import pytest

from dask_ml_spark.operators.preprocessing import (
    MinMaxScaler,
    QuantileTransformer,
    RobustScaler,
    SimpleImputer,
    StandardScaler,
)

COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@pytest.fixture(scope="module")
def li_pdf(lineitem):
    return lineitem.select(*COLS).toPandas()


def test_standard_scaler(lineitem, li_pdf):
    sc = StandardScaler().fit(lineitem, COLS)
    np.testing.assert_allclose(sc.mean_, li_pdf[COLS].mean().to_numpy())
    np.testing.assert_allclose(sc.scale_, li_pdf[COLS].std(ddof=0).to_numpy(), rtol=1e-9)
    out = sc.transform(lineitem).select(*COLS).toPandas()
    want = (li_pdf[COLS] - li_pdf[COLS].mean()) / li_pdf[COLS].std(ddof=0)
    np.testing.assert_allclose(out.mean().to_numpy(), [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(sorted(out["l_quantity"]), sorted(want["l_quantity"]), rtol=1e-9)


def test_standard_scaler_inverse(lineitem, li_pdf):
    sc = StandardScaler().fit(lineitem, COLS)
    rt = sc.inverse_transform(sc.transform(lineitem)).select(*COLS).toPandas()
    np.testing.assert_allclose(
        sorted(rt["l_extendedprice"]), sorted(li_pdf["l_extendedprice"]), rtol=1e-9
    )


def test_minmax_scaler(lineitem, li_pdf):
    sc = MinMaxScaler().fit(lineitem, COLS)
    np.testing.assert_allclose(sc.data_min_, li_pdf[COLS].min().to_numpy())
    np.testing.assert_allclose(sc.data_max_, li_pdf[COLS].max().to_numpy())
    out = sc.transform(lineitem).select(*COLS).toPandas()
    assert out.min().min() >= -1e-12 and out.max().max() <= 1 + 1e-12


def test_robust_scaler(lineitem, li_pdf):
    sc = RobustScaler().fit(lineitem, ["l_quantity"])
    med = np.percentile(li_pdf["l_quantity"], 50, method="linear")
    q1 = np.percentile(li_pdf["l_quantity"], 25, method="linear")
    q3 = np.percentile(li_pdf["l_quantity"], 75, method="linear")
    np.testing.assert_allclose(sc.center_, [med])
    np.testing.assert_allclose(sc.scale_, [q3 - q1])


def test_quantile_transformer(lineitem, li_pdf):
    qt = QuantileTransformer(n_quantiles=100, approximate=False).fit(lineitem, ["l_extendedprice"])
    out = qt.transform(lineitem).select("l_extendedprice").toPandas()["l_extendedprice"]
    # output is in [0,1] and roughly uniform
    assert out.min() >= 0 and out.max() <= 1
    assert abs(out.mean() - 0.5) < 0.02


def test_quantile_transformer_normal(lineitem):
    qt = QuantileTransformer(n_quantiles=100, output_distribution="normal",
                             approximate=False).fit(lineitem, ["l_extendedprice"])
    out = qt.transform(lineitem).select("l_extendedprice").toPandas()["l_extendedprice"]
    assert abs(out.mean()) < 0.1 and abs(out.std() - 1.0) < 0.2


@pytest.mark.parametrize("dist", ["uniform", "normal"])
def test_quantile_transformer_inverse_roundtrip(lineitem, dist):
    """transform → inverse_transform recovers the original values
    (within interp/CDF-approximation error) for both distributions."""
    qt = QuantileTransformer(n_quantiles=200, output_distribution=dist,
                             approximate=False).fit(lineitem, ["l_extendedprice"])
    orig = lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
    back = (qt.inverse_transform(qt.transform(orig))
            .toPandas().sort_values(["l_orderkey", "l_linenumber"]))
    want = orig.toPandas().sort_values(["l_orderkey", "l_linenumber"])
    lo, hi = want["l_extendedprice"].quantile([0.01, 0.99])
    inner = want["l_extendedprice"].between(lo, hi).to_numpy()
    np.testing.assert_allclose(
        back["l_extendedprice"].to_numpy()[inner],
        want["l_extendedprice"].to_numpy()[inner], rtol=5e-3)


def test_simple_imputer_mean(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0, None], "b": [1.0, 2.0, None, 4.0]})
    df = spark.createDataFrame(pdf)
    imp = SimpleImputer(strategy="mean").fit(df, ["a", "b"])
    np.testing.assert_allclose(imp.statistics_["a"], 2.0)
    np.testing.assert_allclose(imp.statistics_["b"], 7.0 / 3.0)
    out = imp.transform(df).toPandas()
    assert not out.isna().any().any()


def test_simple_imputer_median_mode(spark):
    pdf = pd.DataFrame({"a": [1.0, 1.0, 3.0, None, 10.0]})
    df = spark.createDataFrame(pdf)
    imp = SimpleImputer(strategy="median", exact=True).fit(df, ["a"])
    np.testing.assert_allclose(imp.statistics_["a"], 2.0)
    # default is percentile_approx (reference approximate-quantile
    # semantics); returns an actual element near the median
    imp_approx = SimpleImputer(strategy="median").fit(df, ["a"])
    assert imp_approx.statistics_["a"] in (1.0, 3.0)
    imp2 = SimpleImputer(strategy="most_frequent").fit(df, ["a"])
    assert imp2.statistics_["a"] == 1.0


def test_simple_imputer_constant(spark):
    pdf = pd.DataFrame({"a": [1.0, None]})
    df = spark.createDataFrame(pdf)
    imp = SimpleImputer(strategy="constant", fill_value=-1.0).fit(df, ["a"])
    out = imp.transform(df).toPandas()
    assert out["a"].tolist() == [1.0, -1.0]


def test_kbins_discretizer_quantile_and_uniform(spark, lineitem):
    """Bins match a numpy replay (count of interior edges <= x) for
    both strategies; output bins are in [0, k-1] and every bin of a
    quantile fit is populated."""
    import numpy as np

    from dask_ml_spark.operators.preprocessing import KBinsDiscretizer

    cols = ["l_extendedprice", "l_quantity"]
    pdf = lineitem.select(*cols).toPandas()
    for strategy in ("quantile", "uniform"):
        kb = KBinsDiscretizer(n_bins=4, strategy=strategy).fit(lineitem, cols)
        out = kb.transform(lineitem.select(*cols)).toPandas()
        for c in cols:
            edges = np.asarray(kb.bin_edges_[c])
            expect = (pdf[c].to_numpy()[:, None] >= edges[1:-1]).sum(axis=1)
            np.testing.assert_array_equal(out[c].to_numpy(), expect)
            assert out[c].between(0, 3).all()
        if strategy == "quantile":
            assert set(out["l_extendedprice"].unique()) == {0, 1, 2, 3}


def test_normalizer_rowwise(spark, lineitem):
    import numpy as np

    from dask_ml_spark.operators.preprocessing import Normalizer

    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    pdf = lineitem.select(*cols).limit(200).toPandas()
    X = pdf.to_numpy(dtype="float64")
    for norm, np_norm in (("l2", lambda r: np.sqrt((r * r).sum())),
                          ("l1", lambda r: np.abs(r).sum()),
                          ("max", lambda r: np.abs(r).max())):
        out = (Normalizer(norm=norm).fit(lineitem, cols)
               .transform(spark.createDataFrame(pdf)).toPandas()
               .to_numpy(dtype="float64"))
        expect = np.array([r / (np_norm(r) or 1.0) for r in X])
        np.testing.assert_allclose(out, expect, rtol=1e-9)


def test_maxabs_scaler_roundtrip(spark, lineitem):
    import numpy as np

    from dask_ml_spark.operators.preprocessing import MaxAbsScaler

    cols = ["l_quantity", "l_extendedprice"]
    sc = MaxAbsScaler().fit(lineitem, cols)
    pdf = lineitem.select(*cols).limit(100).toPandas()
    X = pdf.to_numpy(dtype="float64")
    out = sc.transform(spark.createDataFrame(pdf)).toPandas().to_numpy("float64")
    np.testing.assert_allclose(out, X / np.asarray(sc.scale_), rtol=1e-12)
    assert np.abs(out).max() <= 1.0 + 1e-12
    back = sc.inverse_transform(
        sc.transform(spark.createDataFrame(pdf))).toPandas().to_numpy("float64")
    np.testing.assert_allclose(back, X, rtol=1e-12)


def test_maxabs_scaler_zero_and_null_columns(spark):
    """ADVICE r4: a column whose max-abs is exactly 0.0 (or all-null)
    must report max_abs_=0.0 (sklearn keeps the true value) while
    scale_ patches to 1.0 so transform is a no-op on it."""
    import numpy as np
    import pandas as pd

    from dask_ml_spark.operators.preprocessing import MaxAbsScaler

    pdf = pd.DataFrame({
        "zero": [0.0, 0.0, -0.0],
        "nul": pd.array([None, None, None], dtype="Float64"),
        "x": [2.0, -4.0, 1.0],
    })
    sc = MaxAbsScaler().fit(spark.createDataFrame(pdf), ["zero", "nul", "x"])
    assert sc.max_abs_ == [0.0, 0.0, 4.0]
    assert sc.scale_ == [1.0, 1.0, 4.0]
    out = sc.transform(spark.createDataFrame(pdf)).toPandas()
    np.testing.assert_allclose(out["zero"], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(out["x"], [0.5, -1.0, 0.25])


def test_winsorizer(spark):
    import numpy as np
    from dask_ml_spark.operators.preprocessing import Winsorizer

    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.randn(500), [100.0, -100.0]])  # outliers
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    w = Winsorizer(lower=0.05, upper=0.95, approximate=False).fit(df, ["x"])
    lo, hi = w.bounds_["x"]
    assert abs(lo - np.quantile(vals, 0.05)) < 1e-9
    assert abs(hi - np.quantile(vals, 0.95)) < 1e-9
    out = np.array([r["x"] for r in w.transform(df).collect()])
    assert out.max() <= hi + 1e-12 and out.min() >= lo - 1e-12
    # interior values untouched
    inside = vals[(vals >= lo) & (vals <= hi)]
    assert np.isin(inside, out).all()
    # approximate path still bounds the outliers away
    wa = Winsorizer().fit(df, ["x"])
    la, ha = wa.bounds_["x"]
    assert -3 < la < ha < 3
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lower"):
        Winsorizer(lower=0.9, upper=0.1)


def test_winsorizer_null_nan_propagation(spark):
    from dask_ml_spark.operators.preprocessing import Winsorizer

    rows = [(float(v), None) for v in range(100)]
    rows += [(None, None), (float("nan"), None)]
    df = spark.createDataFrame(rows, "x double, allnull double")
    w = Winsorizer(lower=0.1, upper=0.9, approximate=False).fit(
        df, ["x", "allnull"])
    # all-null column: no bounds, left untouched by transform
    assert w.bounds_["allnull"] == (None, None)
    got = w.transform(df).toPandas()
    # NULL stays NULL (greatest would have imputed the LOWER bound) and
    # NaN stays NaN (least would have imputed the UPPER bound)
    import numpy as np
    assert got["x"].isna().sum() == 2
    assert got["allnull"].isna().all()
    lo, hi = w.bounds_["x"]
    vals = got["x"].dropna()
    assert vals.min() == lo and vals.max() == hi
