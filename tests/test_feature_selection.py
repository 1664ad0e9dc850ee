"""Feature selection: VarianceThreshold / f_classif / f_regression /
SelectKBest vs closed-form numpy references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.RandomState(7)
    y = rng.randint(0, 3, 240)
    # f0 strongly separates classes, f1 weakly, f2 pure noise, f3 constant
    f0 = y * 2.0 + rng.randn(240) * 0.3
    f1 = y * 0.5 + rng.randn(240)
    f2 = rng.randn(240)
    f3 = np.full(240, 1.25)
    rows = [(float(a), float(b), float(c), float(d), int(t))
            for a, b, c, d, t in zip(f0, f1, f2, f3, y)]
    df = spark.createDataFrame(
        rows, "f0 double, f1 double, f2 double, f3 double, label int")
    return df, np.column_stack([f0, f1, f2, f3]), y


def _anova_f(x, y):
    classes = np.unique(y)
    n, g = len(x), len(classes)
    grand = x.mean()
    ssb = sum((y == c).sum() * (x[y == c].mean() - grand) ** 2
              for c in classes)
    ssw = sum(((x[y == c] - x[y == c].mean()) ** 2).sum() for c in classes)
    return (ssb / (g - 1)) / (ssw / (n - g))


def test_variance_threshold(frame):
    from dask_ml_spark.operators.feature_selection import VarianceThreshold

    df, X, _ = frame
    vt = VarianceThreshold().fit(df, ["f0", "f1", "f2", "f3"])
    for got, want in zip(vt.variances_, X.var(axis=0, ddof=0)):
        assert abs(got - want) < 1e-9
    assert vt.get_support() == [True, True, True, False]
    out = vt.transform(df)
    assert "f3" not in out.columns and "f0" in out.columns
    # a higher threshold drops low-variance features too
    hi = VarianceThreshold(threshold=X.var(axis=0, ddof=0)[2] + 0.1).fit(
        df, ["f0", "f1", "f2", "f3"])
    assert hi.get_support()[3] is False and hi.get_support()[2] is False


def test_f_classif_matches_numpy(frame):
    from dask_ml_spark.operators.feature_selection import f_classif

    df, X, y = frame
    scores = f_classif(df, ["f0", "f1", "f2"], "label")
    for i, c in enumerate(["f0", "f1", "f2"]):
        assert abs(scores[c] - _anova_f(X[:, i], y)) < 1e-6 * (
            1 + _anova_f(X[:, i], y))
    # constant feature: SS_within == 0 AND SS_between == 0 -> here inf
    # guard only fires when within-variance vanishes
    assert scores["f0"] > scores["f1"] > scores["f2"]


def test_f_regression_matches_numpy(frame):
    from dask_ml_spark.operators.feature_selection import f_regression

    df, X, y = frame
    scores = f_regression(df, ["f0", "f1", "f2"], "label")
    n = len(y)
    for i, c in enumerate(["f0", "f1", "f2"]):
        r = np.corrcoef(X[:, i], y)[0, 1]
        want = r * r / (1 - r * r) * (n - 2)
        assert abs(scores[c] - want) < 1e-6 * (1 + abs(want))
    # constant feature has undefined correlation -> NaN
    const = f_regression(df, ["f3"], "label")
    assert math.isnan(const["f3"])


def test_select_kbest(frame):
    from dask_ml_spark.operators.feature_selection import SelectKBest

    df, _, _ = frame
    kb = SelectKBest(k=2).fit(df, ["f0", "f1", "f2", "f3"],
                              label_col="label")
    assert kb.get_support() == [True, True, False, False]
    out = kb.transform(df)
    assert set(out.columns) & {"f0", "f1", "f2", "f3"} == {"f0", "f1"}
    # fit_transform and estimator save/load roundtrip
    out2 = SelectKBest(k=1).fit_transform(df, ["f0", "f1", "f2"],
                                          label_col="label")
    assert set(out2.columns) & {"f0", "f1", "f2"} == {"f0"}
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pkl") as f:
        kb.save(f.name)
        back = SelectKBest.load(f.name)
        assert back.get_support() == kb.get_support()


def test_select_kbest_f_regression_mode(frame):
    from dask_ml_spark.operators.feature_selection import SelectKBest

    df, _, _ = frame
    kb = SelectKBest(k=1, score_func="f_regression").fit(
        df, ["f1", "f2"], label_col="label")
    assert kb.get_support() == [True, False]
    with pytest.raises(ValueError, match="score_func"):
        SelectKBest(score_func="chi9").fit(df, ["f1"], label_col="label")


def test_f_classif_and_regression_null_handling(spark):
    from dask_ml_spark.operators.feature_selection import (f_classif,
                                                           f_regression)

    rows = []
    rng = np.random.RandomState(11)
    for i in range(300):
        y = i % 2
        full = float(y * 3 + rng.randn())
        half = float(y * 3 + rng.randn()) if i % 2 == 0 else None
        rows.append((full, half, None, y))
    df = spark.createDataFrame(
        rows, "full double, half double, empty double, label int")
    # all-NULL feature: NaN, not a TypeError crash
    s = f_classif(df, ["full", "half", "empty"], "label")
    assert math.isnan(s["empty"])
    # 'half' is only observed in class 0 -> a single populated class
    assert math.isnan(s["half"])
    assert s["full"] > 100
    # f_regression: degrees of freedom must count pairwise-complete
    # rows; an all-null feature is NaN
    r = f_regression(df, ["full", "empty"], "label")
    assert math.isnan(r["empty"]) and r["full"] > 100
    # nulls halve the degrees of freedom: with r pinned equal on the
    # two halves (xh = x where present), F scales ~ with the pairwise-
    # complete count, so F(xh)/F(x) ~ 0.5 — not the ~1.0 the old
    # all-rows count produced
    xs = rng.randn(400)
    noise = rng.randn(400) * 0.5
    rows2 = [(float(v), float(v) if i % 2 == 0 else None,
              float(v + e)) for i, (v, e) in enumerate(zip(xs, noise))]
    df2 = spark.createDataFrame(rows2, "x double, xh double, y double")
    r2 = f_regression(df2, ["x", "xh"], "y")
    assert 0.3 < r2["xh"] / r2["x"] < 0.7


def test_chi2_matches_reference(spark):
    from dask_ml_spark.operators.feature_selection import chi2

    rng = np.random.RandomState(5)
    y = rng.randint(0, 3, 200)
    f0 = (y + 1.0) * 2 + rng.rand(200)      # class-dependent mass
    f1 = rng.rand(200) * 4                  # independent
    rows = [(float(a), float(b), int(t)) for a, b, t in zip(f0, f1, y)]
    df = spark.createDataFrame(rows, "f0 double, f1 double, label int")
    s = chi2(df, ["f0", "f1"], "label")

    def ref(x):
        tot = x.sum()
        stat = 0.0
        for c in np.unique(y):
            exp = tot * (y == c).sum() / len(y)
            stat += (x[y == c].sum() - exp) ** 2 / exp
        return stat

    assert abs(s["f0"] - ref(f0)) < 1e-8 * (1 + ref(f0))
    assert abs(s["f1"] - ref(f1)) < 1e-8 * (1 + ref(f1))
    assert s["f0"] > s["f1"]
    # negative features raise (sklearn contract)
    neg = spark.createDataFrame([(-1.0, 0), (2.0, 1)], "f0 double, label int")
    with pytest.raises(ValueError, match="non-negative"):
        chi2(neg, ["f0"], "label")


def test_feature_selection_composes_in_pipeline(frame):
    from dask_ml_spark.operators.compose import Pipeline
    from dask_ml_spark.operators.feature_selection import (SelectKBest,
                                                           VarianceThreshold)
    from dask_ml_spark.operators.preprocessing import StandardScaler

    df, _, _ = frame
    # VarianceThreshold drops the constant f3; SelectKBest keeps the 2
    # strongest; StandardScaler must then fit on the SURVIVORS — the
    # pipeline propagates each step's transformed_columns_
    pipe = Pipeline([
        ("vt", VarianceThreshold()),
        ("kb", SelectKBest(k=2)),
        ("scale", StandardScaler()),
    ]).fit(df, columns=["f0", "f1", "f2", "f3"], label_col="label")
    out = pipe.transform(df)
    assert set(out.columns) & {"f0", "f1", "f2", "f3"} == {"f0", "f1"}
    assert pipe.named_steps["scale"].columns_ == ["f0", "f1"]
    stats = out.agg(F.avg("f0"), F.stddev_pop("f0")).collect()[0]
    assert abs(stats[0]) < 1e-9 and abs(stats[1] - 1.0) < 1e-9


def test_chi2_null_rows_and_sklearn_parity_on_dropped(spark):
    """Documented NULL edge: null rows add zero mass but stay in the
    class priors, shrinking statistics toward independence; dropping
    them first reproduces sklearn's chi2 exactly (independent numpy
    replay of sklearn's formula — sklearn itself rejects NaN input)."""
    import numpy as np

    from dask_ml_spark.operators.feature_selection import chi2

    rng = np.random.RandomState(3)
    X = rng.randint(0, 6, size=(60, 2)).astype(float)
    y = rng.randint(0, 3, size=60)
    rows = [(float(a), float(b), int(c)) for (a, b), c in zip(X, y)]
    # poke nulls into feature f0 only
    nulled = [(None if i % 5 == 0 else a, b, c)
              for i, (a, b, c) in enumerate(rows)]
    df = spark.createDataFrame(nulled, "f0 double, f1 double, label int")

    def sk_chi2(Xm, yv):
        # sklearn.feature_selection.chi2: observed per-class sums vs
        # class_prob * feature_total
        classes = np.unique(yv)
        obs = np.stack([Xm[yv == g].sum(axis=0) for g in classes])
        prior = np.array([(yv == g).mean() for g in classes])
        exp = prior[:, None] * Xm.sum(axis=0)[None, :]
        return ((obs - exp) ** 2 / exp).sum(axis=0)

    # parity after dropping null rows
    keep = ~np.array([r[0] is None for r in nulled])
    got = chi2(df.dropna(subset=["f0"]), ["f0", "f1"])
    want = sk_chi2(X[keep], y[keep])
    assert got["f0"] == pytest.approx(want[0])
    assert got["f1"] == pytest.approx(want[1])

    # with nulls retained, f0 uses whole-frame priors: equals the
    # numpy replay with nulls as zero mass but full row counts
    full = chi2(df, ["f0", "f1"])
    X0 = np.where(keep, X[:, 0], 0.0)
    classes = np.unique(y)
    obs = np.array([X0[y == g].sum() for g in classes])
    exp = np.array([(y == g).mean() for g in classes]) * X0.sum()
    assert full["f0"] == pytest.approx((((obs - exp) ** 2) / exp).sum())
    # f1 has no nulls: unaffected by f0's null pattern
    assert full["f1"] == pytest.approx(sk_chi2(X, y)[1])
