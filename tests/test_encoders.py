"""Encoders vs pandas oracle (reference tests/preprocessing F6)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.encoders import (
    Categorizer,
    DummyEncoder,
    LabelEncoder,
    OneHotEncoder,
    OrdinalEncoder,
)


@pytest.fixture(scope="module")
def cat_df(spark):
    pdf = pd.DataFrame({
        "A": ["a", "b", "c", "a"],
        "B": ["x", "y", "x", "z"],
        "D": [1, 2, 3, 4],
    })
    return spark.createDataFrame(pdf), pdf


def test_categorizer(cat_df):
    df, pdf = cat_df
    c = Categorizer().fit(df)
    assert c.columns_ == ["A", "B"]
    assert c.categories_["A"].tolist() == ["a", "b", "c"]
    assert c.categories_["B"].tolist() == ["x", "y", "z"]


def test_label_encoder(cat_df):
    df, pdf = cat_df
    le = LabelEncoder().fit(df, "A")
    assert le.classes_.tolist() == ["a", "b", "c"]
    out = le.transform(df, "code").select("A", "code").toPandas().sort_values("A")
    assert dict(zip(out.A, out.code)) == {"a": 0, "b": 1, "c": 2}
    inv = le.inverse_transform(le.transform(df, "code"), "code", "back").toPandas()
    assert (inv["back"] == inv["A"]).all()


def test_label_encoder_unseen_raises(cat_df, spark):
    df, _ = cat_df
    le = LabelEncoder().fit(df, "A")
    bad = spark.createDataFrame(pd.DataFrame({"A": ["zzz"]}))
    with pytest.raises(Exception, match="unseen"):
        le.transform(bad).collect()


def test_ordinal_encoder(cat_df):
    df, pdf = cat_df
    oe = OrdinalEncoder().fit(df, ["A", "B"])
    out = oe.transform(df).toPandas()
    assert out["A"].tolist() == [0, 1, 2, 0]
    assert out["B"].tolist() == [0, 1, 0, 2]
    rt = oe.inverse_transform(oe.transform(df)).toPandas()
    assert rt["A"].tolist() == pdf["A"].tolist()


def test_dummy_encoder(cat_df):
    df, pdf = cat_df
    de = DummyEncoder().fit(df, ["A"])
    out = de.transform(df).toPandas()
    want = pd.get_dummies(pdf, columns=["A"])
    for c in ["A_a", "A_b", "A_c"]:
        assert out[c].tolist() == want[c].astype(int).tolist()
    rt = de.inverse_transform(de.transform(df)).toPandas()
    assert rt["A"].tolist() == pdf["A"].tolist()


def test_dummy_encoder_drop_first(cat_df):
    df, _ = cat_df
    de = DummyEncoder(drop_first=True).fit(df, ["A"])
    out = de.transform(df).toPandas()
    assert "A_a" not in out.columns and "A_b" in out.columns
    rt = de.inverse_transform(de.transform(df)).toPandas()
    assert rt["A"].tolist() == ["a", "b", "c", "a"]


def test_one_hot_encoder(cat_df):
    df, pdf = cat_df
    oh = OneHotEncoder().fit(df, ["A", "B"])
    assert oh.n_features_out_ == 6
    out = oh.transform(df).select("onehot").toPandas()
    m = np.stack([v.toArray() for v in out["onehot"]])
    want = pd.get_dummies(pdf[["A", "B"]]).to_numpy(dtype=float)
    np.testing.assert_allclose(m, want)


def test_one_hot_encoder_options(spark):
    """categories= fast path, drop='first', handle_unknown semantics
    (reference _encoders.py:114-122)."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from dask_ml_spark.operators.encoders import OneHotEncoder

    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["x"])
    # known-categories fast path: no fit scan needed
    enc = OneHotEncoder(sparse_output=False, categories={"x": ["a", "b", "c"]}).fit(df)
    out = {r["x"]: r["onehot"] for r in enc.transform(df).collect()}
    assert out["a"] == [1.0, 0.0, 0.0] and out["c"] == [0.0, 0.0, 1.0]
    # drop='first': first category becomes the all-zeros baseline
    enc = OneHotEncoder(sparse_output=False, drop="first").fit(df, ["x"])
    out = {r["x"]: r["onehot"] for r in enc.transform(df).collect()}
    assert out["a"] == [0.0, 0.0] and out["b"] == [1.0, 0.0]
    # handle_unknown='ignore': unseen value encodes to all zeros
    unseen = spark.createDataFrame([("z",)], ["x"])
    enc = OneHotEncoder(sparse_output=False, handle_unknown="ignore").fit(df, ["x"])
    assert enc.transform(unseen).collect()[0]["onehot"] == [0.0, 0.0, 0.0]
    # handle_unknown='error': raises at execution
    enc = OneHotEncoder(sparse_output=False).fit(df, ["x"])
    with pytest.raises(Exception, match="unknown category"):
        enc.transform(unseen).collect()


def test_one_hot_encoder_wide_sparse_path(spark):
    """>1024 output slots takes the MLlib OneHotEncoder+VectorAssembler
    path: sparse vectors, same layout/semantics as the dense path
    (known value -> its offset slot, null/ignored-unknown -> zeros)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_ml_spark.operators.encoders import OneHotEncoder

    cats_a = [f"a{i:04d}" for i in range(700)]
    cats_b = [f"b{i:04d}" for i in range(600)]
    enc = OneHotEncoder(
        sparse_output=True, handle_unknown="ignore",
        categories={"A": cats_a, "B": cats_b},
    ).fit(None)
    assert enc.n_features_out_ == 1300
    df = spark.createDataFrame(
        [("a0005", "b0000"), ("a0699", "b0599"), ("zzz", None)], ["A", "B"])
    rows = {(r["A"]): r["onehot"] for r in enc.transform(df).collect()}
    v = rows["a0005"]
    assert v.size == 1300 and list(v.indices) == [5, 700] and list(v.values) == [1.0, 1.0]
    v = rows["a0699"]
    assert list(v.indices) == [699, 700 + 599]
    v = rows["zzz"]  # unknown A (ignored) + null B -> all zeros
    assert len(v.indices) == 0


def test_target_encoder_matches_formula(spark, lineitem):
    """Smoothed mean-target encoding vs a pandas replay of the exact
    formula, plus the unseen-category fallback to the global mean."""
    import numpy as np
    import pandas as pd

    from dask_ml_spark.operators.encoders import TargetEncoder

    df = lineitem.withColumn("y", (F.col("l_quantity")).cast("double"))
    te = TargetEncoder(smoothing=10.0).fit(df, ["l_returnflag"], target_col="y")
    pdf = df.select("l_returnflag", "y").toPandas()
    g = pdf.groupby("l_returnflag")["y"].agg(["count", "mean"])
    gm = pdf["y"].mean()
    for cat, row in g.iterrows():
        expect = (row["count"] * row["mean"] + 10.0 * gm) / (row["count"] + 10.0)
        np.testing.assert_allclose(te.encodings_["l_returnflag"][cat], expect,
                                   rtol=1e-9)
    out = te.transform(df.limit(50)).toPandas()
    np.testing.assert_allclose(
        out["l_returnflag_enc"],
        [te.encodings_["l_returnflag"][c] for c in out["l_returnflag"]])
    unseen = spark.createDataFrame(pd.DataFrame({"l_returnflag": ["ZZ"]}))
    got = te.transform(unseen).toPandas()
    np.testing.assert_allclose(got["l_returnflag_enc"], [gm], rtol=1e-9)


def test_target_encoder_null_category_and_all_null_targets(spark):
    """ADVICE r4: null category keys must not reach F.create_map
    ([NULL_MAP_KEY]), and a category whose targets are all null must
    not TypeError in fit — it smooths fully to the global mean."""
    import numpy as np
    import pandas as pd

    from dask_ml_spark.operators.encoders import TargetEncoder

    pdf = pd.DataFrame({
        "cat": ["a", "a", None, None, "b", "b"],
        "y": [1.0, 3.0, 10.0, 20.0, None, None],
    })
    df = spark.createDataFrame(pdf)
    te = TargetEncoder(smoothing=2.0).fit(df, ["cat"], target_col="y")
    gm = np.nanmean([1.0, 3.0, 10.0, 20.0])  # avg ignores nulls
    # category 'b': n=0 non-null targets -> pure global mean
    np.testing.assert_allclose(te.encodings_["cat"]["b"], gm, rtol=1e-12)
    # null category: its own level, encoded separately
    null_expect = (2 * 15.0 + 2.0 * gm) / (2 + 2.0)
    np.testing.assert_allclose(te.null_encodings_["cat"], null_expect, rtol=1e-12)
    out = te.transform(df).toPandas().sort_values("y", na_position="last")
    a_expect = (2 * 2.0 + 2.0 * gm) / (2 + 2.0)
    got = te.transform(df).toPandas()
    by_cat = {
        "a": a_expect, "b": gm, None: null_expect,
    }
    for _, r in got.iterrows():
        key = r["cat"] if pd.notna(r["cat"]) else None
        np.testing.assert_allclose(r["cat_enc"], by_cat[key], rtol=1e-12)
