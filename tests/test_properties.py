"""Property-based tests (hypothesis) — beyond the reference's strategy
(SURVEY §5: dask-ml has no randomized testing). Each property is an
algebraic invariant that must hold for ARBITRARY inputs, not a golden
value: split laws, metric parity with numpy, scaler round-trips.

Spark jobs per example are expensive — max_examples stays small and the
session is reused; the point is the generator's edge cases (empty-ish
frames, constant columns, extreme fractions), not volume.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def xy_frames(draw, min_rows=4, max_rows=60):
    n = draw(st.integers(min_rows, max_rows))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    pdf = pd.DataFrame({
        "key": np.arange(n) * 7 + draw(st.integers(0, 1000)),
        "y_true": rng.randn(n),
        "y_pred": rng.randn(n),
        "label": (rng.rand(n) > 0.5).astype("float64"),
        "pred_label": (rng.rand(n) > 0.5).astype("float64"),
    })
    return pdf


@given(pdf=xy_frames(), test_size=st.floats(0.05, 0.95))
@settings(**SETTINGS)
def test_hash_split_laws(spark, pdf, test_size):
    """Disjoint, complete, and invariant under repartitioning."""
    from dask_ml_spark.plans.model_selection import hash_split

    df = spark.createDataFrame(pdf)
    tr, te = hash_split(df, "key", test_size=test_size)
    ids_tr = {r[0] for r in tr.select("key").collect()}
    ids_te = {r[0] for r in te.select("key").collect()}
    assert ids_tr.isdisjoint(ids_te)
    assert ids_tr | ids_te == set(pdf["key"].tolist())
    tr2, te2 = hash_split(df.repartition(5), "key", test_size=test_size)
    assert {r[0] for r in tr2.select("key").collect()} == ids_tr


@given(pdf=xy_frames())
@settings(**SETTINGS)
def test_regression_metrics_match_numpy(spark, pdf):
    from dask_ml_spark.metrics import (
        mean_absolute_error,
        mean_squared_error,
        r2_score,
    )

    df = spark.createDataFrame(pdf)
    t, p = pdf["y_true"].to_numpy(), pdf["y_pred"].to_numpy()
    assert mean_squared_error(df, "y_true", "y_pred") == pytest.approx(
        ((t - p) ** 2).mean())
    assert mean_absolute_error(df, "y_true", "y_pred") == pytest.approx(
        np.abs(t - p).mean())
    ss_tot = ((t - t.mean()) ** 2).sum()
    if ss_tot > 1e-12:
        assert r2_score(df, "y_true", "y_pred") == pytest.approx(
            1 - ((t - p) ** 2).sum() / ss_tot)


@given(pdf=xy_frames())
@settings(**SETTINGS)
def test_accuracy_matches_numpy(spark, pdf):
    from dask_ml_spark.metrics import accuracy_score

    df = spark.createDataFrame(pdf)
    expected = float((pdf["label"] == pdf["pred_label"]).mean())
    assert accuracy_score(df, "label", "pred_label") == pytest.approx(expected)


@given(pdf=xy_frames(min_rows=5))
@settings(**SETTINGS)
def test_minmax_scaler_roundtrip(spark, pdf):
    """inverse_transform(transform(x)) == x wherever the column isn't
    constant (constant columns collapse by definition)."""
    from dask_ml_spark.preprocessing import MinMaxScaler

    df = spark.createDataFrame(pdf[["key", "y_true"]])
    sc = MinMaxScaler().fit(df, ["y_true"])
    back = sc.inverse_transform(sc.transform(df))
    got = back.select("y_true").toPandas()["y_true"].to_numpy()
    want = pdf["y_true"].to_numpy()
    if np.ptp(want) > 1e-9:
        np.testing.assert_allclose(np.sort(got), np.sort(want), atol=1e-9 * max(1, np.abs(want).max()))


@given(pdf=xy_frames(), frac=st.floats(0.0, 1.0))
@settings(**SETTINGS)
def test_stratified_sample_subset_law(spark, pdf, frac):
    """The sample is always a subset, keeps rows iff their bucket is
    under the cut, and frac=1 keeps everything."""
    from dask_ml_spark.datapipe.sampling import stratified_sample

    pdf = pdf.assign(stratum=(pdf["key"] % 3).astype("string"))
    df = spark.createDataFrame(pdf)
    kept = stratified_sample(df, "stratum", frac, key_cols="key")
    ids = {r[0] for r in kept.select("key").collect()}
    assert ids <= set(pdf["key"].tolist())
    if frac == 1.0:
        assert len(ids) == len(pdf)
    M, P = 2654435761, 1 << 31
    cut = int(round(frac * 10_000))
    expect = {k for k in pdf["key"].tolist() if ((k % P) * M % P) % 10_000 < cut}
    assert ids == expect


@st.composite
def paragraph_corpora(draw):
    """Docs assembled from a small paragraph pool → guaranteed repeats."""
    pool = [f"para {i} body text" for i in range(draw(st.integers(2, 6)))]
    n_docs = draw(st.integers(1, 8))
    docs = []
    for d in range(n_docs):
        k = draw(st.integers(1, 5))
        idxs = [draw(st.integers(0, len(pool) - 1)) for _ in range(k)]
        docs.append((d, "\n\n".join(pool[i] for i in idxs)))
    return docs


@given(docs=paragraph_corpora())
@settings(**SETTINGS)
def test_paragraph_dedup_laws(spark, docs):
    """(1) each distinct paragraph survives exactly once corpus-wide;
    (2) the earliest document containing it keeps it; (3) kept counts
    sum to the number of distinct paragraphs; (4) repartitioning does
    not change the result."""
    from dask_ml_spark.datapipe.dedup import paragraph_dedup

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    all_paras = [(d, i, p) for d, t in docs for i, p in enumerate(t.split("\n\n"))]
    distinct = {p for _, _, p in all_paras}
    assert sum(r.n_kept for r in out.values()) == len(distinct)
    for p in distinct:
        first_doc, first_idx = min((d, i) for d, i, q in all_paras if q == p)
        assert p in out[first_doc].text
    out2 = {r.doc_id: r for r in paragraph_dedup(
        spark.createDataFrame(docs, ["doc_id", "text"]).repartition(4)).collect()}
    for d in out:
        assert out[d].text == out2[d].text


@st.composite
def vec_frames(draw, min_rows=2, max_rows=20, dim=6):
    n = draw(st.integers(min_rows, max_rows))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    scale = draw(st.sampled_from([1e-6, 1.0, 1e6]))
    vecs = rng.randn(n, dim) * scale
    if draw(st.booleans()):
        vecs[0] = vecs[0][0]  # constant vector: zero span edge case
    return pd.DataFrame({
        "vec_id": range(n),
        "embedding": [[float(v) for v in row] for row in vecs],
    })


@given(pdf=vec_frames())
@settings(**SETTINGS)
def test_quantize_roundtrip_error_law(spark, pdf):
    """For ARBITRARY vectors (any magnitude, including constant
    vectors where the span floors at 1e-12): codes stay in int8 range
    and |dequantize(quantize(v)) - v| <= vstep/2 elementwise."""
    from dask_ml_spark.datapipe.similarity import (
        dequantize_embeddings, quantize_embeddings)

    df = spark.createDataFrame(pdf)
    out = dequantize_embeddings(
        quantize_embeddings(df).withColumnRenamed("embedding", "orig"),
        vec_col="embedding").toPandas()
    for row in out.itertuples():
        orig = np.asarray(row.orig, dtype="float64")
        rec = np.asarray(row.embedding, dtype="float64")
        assert all(-128 <= c <= 127 for c in row.code)
        assert np.abs(orig - rec).max() <= row.vstep / 2 + 1e-9 * max(
            1.0, np.abs(orig).max())
