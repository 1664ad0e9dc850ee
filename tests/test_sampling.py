"""Sampling / selection operators and the LSH ANN index."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_stratified_sample_deterministic(documents):
    from dask_ml_spark.datapipe.sampling import stratified_sample

    fr = {"en": 0.3, "de": 1.0}
    a = stratified_sample(documents, "lang", fr, key_cols="doc_id")
    b = stratified_sample(documents.repartition(7), "lang", fr, key_cols="doc_id")
    ids_a = {r[0] for r in a.select("doc_id").collect()}
    ids_b = {r[0] for r in b.select("doc_id").collect()}
    # content-addressed: identical selection under any partitioning
    assert ids_a == ids_b and ids_a
    langs = {r[0] for r in a.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unlisted strata dropped
    # full-fraction stratum keeps everything
    n_de = documents.where(F.col("lang") == "de").count()
    assert a.where(F.col("lang") == "de").count() == n_de


def test_stratified_sample_scalar_fraction(documents):
    from dask_ml_spark.datapipe.sampling import stratified_sample

    n = documents.count()
    kept = stratified_sample(documents, "lang", 0.5, key_cols="doc_id").count()
    assert 0.3 * n < kept < 0.7 * n


def test_topk_per_group(documents):
    from dask_ml_spark.datapipe.sampling import topk_per_group

    top = topk_per_group(documents.select("lang", "doc_id", "n_chars"),
                         "lang", ["n_chars", ("doc_id", True)], k=3)
    pdf = top.toPandas()
    assert (pdf.groupby("lang").size() <= 3).all()
    # the selected rows really are each group's maxima
    full = documents.select("lang", "doc_id", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        best = (full[full.lang == lang]
                .sort_values(["n_chars", "doc_id"], ascending=[False, True])
                .head(3))
        assert set(grp.doc_id) == set(best.doc_id)


def test_lsh_recall_vs_bruteforce(embeddings):
    from dask_ml_spark.datapipe.similarity import CosineLSHIndex, brute_force_topk

    queries = embeddings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(embeddings, queries, k=10).toPandas()
    # wide-angle neighbors (synthetic near-random vectors) need
    # high-collision settings: short bands, many of them
    lsh = CosineLSHIndex(n_bands=24, bits_per_band=4).fit(embeddings)
    approx = lsh.search(embeddings, queries, k=10).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp.vec_id)
        got = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.6, recalls


def test_lsh_deterministic(embeddings):
    from dask_ml_spark.datapipe.similarity import CosineLSHIndex

    queries = embeddings.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    lsh = CosineLSHIndex(n_bands=4, bits_per_band=8).fit(embeddings)
    a = lsh.search(embeddings, queries, k=5).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = lsh.search(embeddings.repartition(5), queries, k=5).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert (a[["query_id", "vec_id"]].values == b[["query_id", "vec_id"]].values).all()


def test_knn_graph_matches_query_search(embeddings):
    """knn_graph (self-join rendering, no query broadcast) returns
    exactly what CosineLSHIndex.search returns when the query set IS
    the corpus — same candidates, same ranks, same tie-breaks."""
    from dask_ml_spark.datapipe.similarity import CosineLSHIndex, knn_graph

    lsh = CosineLSHIndex(n_bands=24, bits_per_band=4).fit(embeddings)
    graph = knn_graph(embeddings, k=5, index=lsh).toPandas()
    queries = embeddings.select(F.col("vec_id").alias("query_id"),
                                "embedding")
    ref = lsh.search(embeddings, queries, k=5).toPandas()
    g = graph.sort_values(["src", "rank"]).reset_index(drop=True)
    r = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(r)
    assert (g["src"].values == r["query_id"].values).all()
    assert (g["dst"].values == r["vec_id"].values).all()
    assert (g["rank"].values == r["rank"].values).all()


def test_knn_graph_recall_and_autofit(embeddings):
    """The auto-fit path (no index passed) builds a graph whose
    neighbors overlap exact brute-force neighbors."""
    from dask_ml_spark.datapipe.similarity import brute_force_topk, knn_graph

    graph = knn_graph(embeddings, k=10, n_bands=24,
                      bits_per_band=4).toPandas()
    queries = embeddings.select(F.col("vec_id").alias("query_id"),
                                "embedding")
    exact = brute_force_topk(embeddings, queries, k=10).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp.vec_id)
        got = set(graph[graph.src == qid].dst)
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.6, np.mean(recalls)
    # scores are genuine cosines: every listed edge's score is the
    # true cosine similarity of its endpoints
    vecs = {r["vec_id"]: np.asarray(r["embedding"])
            for r in embeddings.collect()}
    for row in graph.sample(min(len(graph), 50), random_state=0).itertuples():
        a, b = vecs[row.src], vecs[row.dst]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(row.score - want) < 1e-6


def test_hash_split_string_keys(documents):
    """String keys fold through a portable md5-prefix integer: split is
    deterministic, disjoint, complete, and partition-invariant."""
    from dask_ml_spark.plans.model_selection import hash_split

    tr, te = hash_split(documents, "text", test_size=0.3)
    a = {r[0] for r in tr.select("doc_id").collect()}
    b = {r[0] for r in te.select("doc_id").collect()}
    assert a.isdisjoint(b)
    assert len(a) + len(b) == documents.count()
    assert 0.1 < len(b) / (len(a) + len(b)) < 0.5
    tr2, _ = hash_split(documents.repartition(9), "text", test_size=0.3)
    assert {r[0] for r in tr2.select("doc_id").collect()} == a


def test_string_key_hash_matches_duckdb(spark, documents):
    """The Spark md5-prefix bucket equals the documented SQL rendering."""
    import duckdb

    from dask_ml_spark.plans.model_selection import _hash_bucket_expr

    got = (documents.select("doc_id", _hash_bucket_expr("text", 10_000, 0, df=documents)
                            .alias("bucket"))
           .orderBy("doc_id").limit(20).toPandas())
    pdf = documents.select("doc_id", "text").orderBy("doc_id").limit(20).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql("""
        SELECT doc_id,
               ((0 + CAST(('0x' || substr(md5(text),1,14)) AS BIGINT)) % 2147483648)
               * 2654435761 % 2147483648 % 10000 AS bucket
        FROM docs ORDER BY doc_id
    """).df()
    assert (got["bucket"].to_numpy() == want["bucket"].to_numpy()).all()


def test_mixture_by_token_budget(documents):
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.datapipe.sampling import mixture_by_token_budget

    weights = {"en": 3.0, "de": 1.0}  # zh/others excluded
    total_tokens = documents.select(
        F.sum(F.size(tokens_expr(F.col("text"))))).collect()[0][0]
    budget = int(total_tokens * 0.3)
    kept = mixture_by_token_budget(
        documents, weights, budget, source_col="lang").persist()
    langs = {r[0] for r in kept.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unlisted sources dropped
    # sampled token mass never exceeds each source's floor-quantized target
    per = {r["lang"]: r["tok"] for r in
           kept.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()}
    for lang, tok in per.items():
        target = weights[lang] / sum(weights.values()) * budget
        src_total = documents.where(F.col("lang") == lang).select(
            F.sum(F.size(tokens_expr(F.col("text"))))).collect()[0][0]
        cap = min(float(src_total), target)
        # hash sampling is approximate row-wise; allow one document of slack
        assert tok <= cap * 1.5 + 200
    # deterministic under repartition
    kept2 = mixture_by_token_budget(
        documents.repartition(5), weights, budget, source_col="lang")
    assert ({r[0] for r in kept.select("doc_id").collect()}
            == {r[0] for r in kept2.select("doc_id").collect()})
    kept.unpersist()


def test_contamination_scores_and_decontaminate(spark):
    from dask_ml_spark.datapipe.decontam import (
        contamination_scores,
        decontaminate,
    )

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (2, "a quick brown fox jumps over a sleeping cat"),   # partial
        (3, "completely unrelated text about spark engines"), # clean
    ], ["doc_id", "text"])
    scores = {r["doc_id"]: r for r in
              contamination_scores(corpus, eval_docs, shingle_n=3).collect()}
    assert scores[1]["contamination"] == 1.0
    assert 0.0 < scores[2]["contamination"] < 1.0
    assert scores[3]["contamination"] == 0.0
    assert scores[2]["contamination"] == 0.6  # 3 of 5 shingles shared
    clean = decontaminate(corpus, eval_docs, threshold=0.7)
    assert {r["doc_id"] for r in clean.select("doc_id").collect()} == {2, 3}
    assert clean.columns == corpus.columns  # full schema survives
    strict = decontaminate(corpus, eval_docs, threshold=0.5)
    assert {r["doc_id"] for r in strict.select("doc_id").collect()} == {3}


def test_bloom_prefilter_matches_exact_decontam(spark, documents):
    from dask_ml_spark.datapipe.decontam import (contamination_scores,
                                                 contamination_scores_bloom)

    corpus = documents.where(F.col("doc_id") >= 20)
    eval_set = documents.where(F.col("doc_id") < 20)
    exact = {r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
             for r in contamination_scores(corpus, eval_set).collect()}
    bloom = {r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
             for r in contamination_scores_bloom(corpus, eval_set).collect()}
    # byte-identical by construction: the Bloom stage only prunes
    # definite negatives before the exact verify join
    assert bloom == exact
    # and with an aggressive (tiny) filter the answer still holds —
    # false positives cost work, never correctness
    bloom_small = {r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
                   for r in contamination_scores_bloom(
                       corpus, eval_set, bits_per_item=2, n_hashes=1).collect()}
    assert bloom_small == exact


def test_weighted_sample_without_replacement(documents):
    from dask_ml_spark.datapipe.sampling import weighted_sample

    got = weighted_sample(documents, 40, "n_chars", "doc_id").collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 40 and len(set(ids)) == 40
    # content-addressed: identical selection under any partitioning
    again = weighted_sample(documents.repartition(7), 40, "n_chars",
                            "doc_id").collect()
    assert set(ids) == {r["doc_id"] for r in again}
    # a different salt draws a different sample
    other = weighted_sample(documents, 40, "n_chars", "doc_id",
                            salt=99).collect()
    assert set(ids) != {r["doc_id"] for r in other}


def test_weighted_sample_weight_bias(spark):
    from dask_ml_spark.datapipe.sampling import weighted_sample

    # one row with overwhelming weight is (essentially) always drawn;
    # zero/negative/null weights are never drawn
    rows = ([(i, 1.0) for i in range(100)] + [(100, 1e12)]
            + [(101, 0.0), (102, -5.0), (103, None),
               (104, float("nan"))])
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    for salt in range(5):
        ids = {r["doc_id"]
               for r in weighted_sample(df, 10, "w", "doc_id",
                                        salt=salt).collect()}
        assert 100 in ids
        # zero / negative / NULL / NaN weights are never drawn (NaN
        # compares greater than 0 in Spark, so it needs its own guard)
        assert not ids & {101, 102, 103, 104}


def test_weighted_sample_per_group_matches_global_rule(documents):
    from dask_ml_spark.datapipe.sampling import (weighted_sample,
                                                 weighted_sample_per_group)

    per = weighted_sample_per_group(documents, "lang", 3, "n_chars",
                                    "doc_id", salt=5)
    pdf = per.toPandas()
    assert (pdf.groupby("lang").size() <= 3).all()
    # each group's selection equals running the global sampler on that
    # group alone (same keys, same ordering rule)
    lang = pdf["lang"].iloc[0]
    sub = documents.where(F.col("lang") == lang)
    solo = {r["doc_id"]
            for r in weighted_sample(sub, 3, "n_chars", "doc_id",
                                     salt=5).collect()}
    assert set(pdf[pdf["lang"] == lang]["doc_id"]) == solo
    # skew-safety: repartition-stable
    again = weighted_sample_per_group(documents.repartition(9), "lang", 3,
                                      "n_chars", "doc_id", salt=5)
    assert {tuple(r) for r in pdf[["doc_id"]].itertuples(index=False)} == \
        {(r["doc_id"],) for r in again.collect()}


def test_heavy_hitters_exact_with_forced_reductions(spark):
    from dask_ml_spark.datapipe.sketches import heavy_hitters

    # zipf-ish: value v appears 200 // (v + 1) times, 400 distinct
    rows = [(v,) for v in range(400) for _ in range(200 // (v + 1))]
    df = spark.createDataFrame(rows, ["x"]).repartition(4)
    # capacity 64 << ~200 distinct-per-partition forces MG reductions
    # (N ~ 1175 so the certificate bound is ~18 < the 10th freq of 20);
    # require_sketch pins that the certificate held anyway
    got = heavy_hitters(df, "x", k=10, capacity=64,
                        require_sketch=True).collect()
    import collections
    exact = collections.Counter(v for v, in rows)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["value"], r["freq"]) for r in got] == want


def test_heavy_hitters_flat_fallback_still_exact(spark):
    from dask_ml_spark.datapipe.sketches import heavy_hitters

    # all-unique: no certificate possible -> exact fallback, with nulls
    # never counted
    rows = [(v,) for v in range(300)] + [(None,)] * 50
    df = spark.createDataFrame(rows, "x: int").repartition(3)
    with pytest.raises(RuntimeError, match="certificate"):
        heavy_hitters(df, "x", k=5, capacity=16, require_sketch=True)
    got = heavy_hitters(df, "x", k=5, capacity=16).collect()
    assert [(r["value"], r["freq"]) for r in got] == [
        (0, 1), (1, 1), (2, 1), (3, 1), (4, 1)]


def test_weighted_sample_per_group_preserves_user_columns(spark):
    from dask_ml_spark.datapipe.sampling import weighted_sample_per_group

    # the corpus frame already carries 'score' and 'rank' columns —
    # they must come back untouched, and NaN weights never selected
    rows = [(g, i, 1.0 + i, 0.5, 7) for g in ("a", "b") for i in range(20)]
    rows.append(("a", 99, float("nan"), 0.5, 7))
    df = spark.createDataFrame(
        rows, ["grp", "doc_id", "w", "score", "rank"])
    out = weighted_sample_per_group(df, "grp", 3, "w", "doc_id")
    pdf = out.toPandas()
    assert set(pdf.columns) == {"grp", "doc_id", "w", "score", "rank"}
    assert (pdf["score"] == 0.5).all() and (pdf["rank"] == 7).all()
    assert 99 not in set(pdf["doc_id"])


def test_kcenter_sample_matches_numpy_greedy(spark):
    """Greedy farthest-point selection replays exactly in numpy: same
    seed (min id), same argmax with min-id tie-breaks, same covering
    radii; k=1 degenerates to the seed; duplicate points pick the
    smaller id on the distance-0 tie."""
    import numpy as np

    from dask_ml_spark.datapipe.sampling import kcenter_sample

    rng = np.random.RandomState(9)
    X = rng.randn(60, 5)
    X[13] = X[4]  # planted duplicate
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "doc_id long, embedding array<double>")

    got = [(r["round"], r["doc_id"], r["dist"])
           for r in kcenter_sample(df, k=7).orderBy("round").collect()]

    import math

    centers = [0]
    want = [(1, 0, 0.0)]
    for r in range(2, 8):
        d = np.min([((X - X[c]) ** 2).sum(axis=1) for c in centers], axis=0)
        best = max(range(60), key=lambda i: (d[i], -i))
        centers.append(best)
        want.append((r, best, math.floor(float(d[best]) * 1e6 + 0.5) / 1e6))
    assert got == want
    # covering radius is non-increasing (greedy k-center invariant)
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)
    # k=1: just the seed
    assert [(r["round"], r["doc_id"])
            for r in kcenter_sample(df, k=1).collect()] == [(1, 0)]
