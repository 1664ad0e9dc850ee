"""Gaussian mixture models.

Beyond the reference (dask-ml has no mixture module; sklearn's
GaussianMixture is the single-node workhorse it defers to). MLlib does
ship a GaussianMixture, but with full covariances and a seeded random
init only; this implementation is the deterministic, oracle-able
DataFrame-EM sibling of the pinned-init Lloyd loop in
operators/cluster.py — diagonal covariances, explicit init, and the
whole E+M step fused into ONE narrow aggregate per iteration.

Shape at 100 TB: each EM iteration is a single projection computing
the k responsibilities per row from LITERAL parameters (JVM codegen,
no UDF, no shuffle) feeding a global aggregate of k·(2d+1) partial
sums with map-side combine — the driver ever holds only the k·(2d+1)
parameter scalars. Soft assignment means every component receives
positive responsibility from every row in exact arithmetic, so no
empty-cluster repair pass is needed (unlike Lloyd); the one float64
exception — exp underflow for a component stranded ~40σ from all
data — keeps that component's previous parameters for the round.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator

TWO_PI = 6.283185307179586


def _log_prob_exprs(cols, weights, means, variances):
    """Per-component log w_j + log N(x | mu_j, diag(var_j)) as literal
    column expressions. Term order is fixed (dims in `cols` order) so
    an SQL oracle can replay the identical floating-point sum."""
    exprs = []
    for w, mu, var in zip(weights, means, variances):
        quad = F.lit(0.0)
        for c, m, v in zip(cols, mu, var):
            d = F.col(c).cast("double") - F.lit(float(m))
            quad = quad + (F.lit(math.log(TWO_PI * float(v)))
                           + d * d / F.lit(float(v)))
        exprs.append(F.lit(math.log(float(w))) - 0.5 * quad)
    return exprs


class GaussianMixture(BaseEstimator):
    """EM for a diagonal-covariance Gaussian mixture.

    Parameters mirror sklearn's GaussianMixture where they apply:
    n_components, max_iter, tol (convergence on the CHANGE IN MEAN
    PER-SAMPLE log-likelihood, sklearn semantics; tol=0 always runs
    max_iter rounds — the oracle-replay mode), reg_covar (added to
    every updated variance). covariance_type is 'diag' only — the
    design point that keeps the M-step a flat sum-of-scalars aggregate;
    for full covariances use MLlib's GaussianMixture.

    init_means: explicit (k, d) array → fully deterministic fit (with
    init_weights/init_variances optionally pinned too — else weights
    start uniform and variances at the per-dimension global variance).
    init_means=None draws the k lexicographically-smallest rows by
    md5 of the joined coordinates — content-deterministic (stable
    under repartitioning), one global-sort-limit job.
    """

    def __init__(self, n_components: int = 3, max_iter: int = 100,
                 tol: float = 1e-3, reg_covar: float = 1e-6,
                 covariance_type: str = "diag",
                 init_means=None, init_weights=None, init_variances=None):
        if covariance_type != "diag":
            raise ValueError(
                "covariance_type='diag' only (full covariances need a "
                "per-component matrix solve per M-step — use MLlib's "
                "GaussianMixture for that)")
        self.n_components = n_components
        self.max_iter = max_iter
        self.tol = tol
        self.reg_covar = reg_covar
        self.covariance_type = covariance_type
        self.init_means = init_means
        self.init_weights = init_weights
        self.init_variances = init_variances

    def _init_params(self, data: DataFrame, cols):
        k, d = self.n_components, len(cols)
        # np.array (not asarray): the M-step updates these in place, so
        # aliasing a caller-owned init array would mutate the caller's data
        if self.init_means is not None:
            means = np.array(self.init_means, dtype="float64")
            if means.shape != (k, d):
                raise ValueError(
                    f"init_means shape {means.shape} != ({k}, {d})")
        else:
            # content-deterministic seed rows: smallest md5 of the
            # joined coordinate text (distinct so duplicated rows can't
            # collapse two components onto one point)
            key = F.md5(F.concat_ws(",", *[F.col(c).cast("double")
                                           for c in cols]))
            rows = (data.distinct()
                    .orderBy(key).limit(k).collect())
            if len(rows) < k:
                raise ValueError(
                    f"n_components={k} but only {len(rows)} distinct rows")
            means = np.asarray([[float(r[c]) for c in cols] for r in rows],
                               dtype="float64")
        if self.init_variances is not None:
            variances = np.array(self.init_variances, dtype="float64")
            if variances.shape != (k, d):
                raise ValueError(
                    f"init_variances shape {variances.shape} != ({k}, {d})")
        else:
            gv = data.agg(*[F.var_pop(c).alias(c) for c in cols]).collect()[0]
            variances = np.tile(
                [max(float(gv[c]), self.reg_covar) for c in cols], (k, 1))
        if self.init_weights is not None:
            weights = np.array(self.init_weights, dtype="float64")
            if weights.shape != (k,):
                raise ValueError(f"init_weights shape {weights.shape} != ({k},)")
        else:
            weights = np.full(k, 1.0 / k)
        return weights, means, variances

    def fit(self, df: DataFrame, columns=None) -> "GaussianMixture":
        cols = self._validate_data(df, columns)
        k, d = self.n_components, len(cols)
        from dask_ml_spark.utils import ensure_min_partitions

        if self.max_iter < 1:
            raise ValueError("max_iter must be >= 1")
        data = ensure_min_partitions(df.select(*cols)).persist()
        try:
            weights, means, variances = self._init_params(data, cols)
            # aggregate expressions never change across rounds
            aggs = [F.count(F.lit(1)).alias("__n"),
                    F.sum("__ll").alias("__sll")]
            for j in range(k):
                aggs.append(F.sum(f"__r{j}").alias(f"n{j}"))
                for i, c in enumerate(cols):
                    r = F.col(f"__r{j}")
                    x = F.col(c).cast("double")
                    aggs.append(F.sum(r * x).alias(f"sx{j}_{i}"))
                    aggs.append(F.sum(r * x * x).alias(f"sxx{j}_{i}"))

            def _round():
                # parameters fold as LITERALS via _log_prob_exprs (the
                # same helper predict/score use, so the SQL oracle
                # replay shares its term order by construction). The
                # plan is then a pure narrow projection + aggregate —
                # no join at all. Measured on a 600k-row round: the
                # literal plan costs ~0.55s end-to-end vs ~1.3s for the
                # r8 broadcast-1-row-frame variant (whose crossJoin
                # analysis/AQE work outweighed the codegen recompile it
                # saved) and ~60ms of actual execution; per-round plan
                # compilation is the floor, and this is the cheapest
                # plan that expresses the round.
                lps = _log_prob_exprs(cols, weights, means, variances)
                mx = F.greatest(*lps) if k > 1 else lps[0]
                # responsibilities computed ONCE in a projection (the
                # aggregate reads the named columns, so the k exp()
                # calls don't replicate per aggregate expression)
                es = [F.exp(lp - F.col("__mx")) for lp in lps]
                proj = (data
                        .withColumn("__mx", mx)
                        .withColumn("__s", sum(es[1:], es[0]))
                        .select(*cols,
                                (F.col("__mx") + F.log("__s"))
                                .alias("__ll"),
                                *[(e / F.col("__s")).alias(f"__r{j}")
                                  for j, e in enumerate(es)]))
                return proj.agg(*aggs)

            def _apply_m_step(row):
                """Driver M-step from one round's aggregate row.
                Returns (mean_ll, shift) — shift is the uniform
                log-likelihood offset the starved-round weight
                renormalization introduces into the NEXT round."""
                nonlocal weights
                n = row["__n"]
                mean_ll = row["__sll"] / n
                starved = False
                for j in range(k):
                    nj = row[f"n{j}"]
                    if nj <= 0.0:
                        # soft assignment can't starve in exact
                        # arithmetic, but exp(lp - mx) underflows to
                        # exactly 0.0 beyond ~-745 — e.g. an init mean
                        # planted tens of sigma from all data. Keep the
                        # component's previous parameters (weight
                        # included) instead of dividing by zero.
                        starved = True
                        continue
                    weights[j] = nj / n
                    for i in range(d):
                        mu = row[f"sx{j}_{i}"] / nj
                        means[j][i] = mu
                        variances[j][i] = (row[f"sxx{j}_{i}"] / nj
                                           - mu * mu + self.reg_covar)
                shift = 0.0
                if starved:
                    # the survivors' updated weights already sum to 1,
                    # so keeping the starved weight would leave the
                    # mixture unnormalized (sum > 1) and predict_proba /
                    # score_samples would score an improper mixture.
                    # Uniform rescaling shifts every log-weight by the
                    # same constant, so next-round responsibilities are
                    # unchanged — only the reported weights are proper.
                    # The NEXT round's mean log-likelihood shifts by
                    # that same −log(s); the caller adds `shift` to
                    # this round's ll before the tol comparison so the
                    # rescale can't masquerade as non-convergence.
                    s = float(weights.sum())
                    weights = weights / s
                    shift = -math.log(s)
                return mean_ll, shift

            prev_mean_ll = None
            mean_ll = None
            for it in range(self.max_iter):
                row = _round().collect()[0]
                mean_ll, shift = _apply_m_step(row)
                self.n_iter_ = it + 1
                if (prev_mean_ll is not None
                        and abs(mean_ll - prev_mean_ll) <= self.tol
                        and self.tol > 0):
                    self.converged_ = True
                    break
                # a starved-round renorm shifts the next round's ll by
                # a constant; fold it into the comparison baseline so
                # the rescale can't read as non-convergence
                prev_mean_ll = mean_ll + shift
            else:
                self.converged_ = False
            self.lower_bound_ = float(mean_ll)
        finally:
            data.unpersist()
        self.weights_ = weights
        self.means_ = means
        self.covariances_ = variances
        self.feature_columns_ = cols
        return self

    def _lps(self):
        return _log_prob_exprs(self.feature_columns_, self.weights_,
                               self.means_, self.covariances_)

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        """Argmax responsibility; first-max tie-break (the kmeans
        convention) so results are content-deterministic."""
        lps = F.array(*self._lps())
        return df.withColumn(
            output_col,
            (F.array_position(lps, F.array_max(lps)) - 1).cast("int"))

    def predict_proba(self, df: DataFrame, output_col: str = "probability") -> DataFrame:
        lps = self._lps()
        mx = F.greatest(*lps) if len(lps) > 1 else lps[0]
        es = [F.exp(lp - mx) for lp in lps]
        s = sum(es[1:], es[0])
        return df.withColumn(output_col, F.array(*[e / s for e in es]))

    def score_samples(self, df: DataFrame, output_col: str = "log_likelihood") -> DataFrame:
        lps = self._lps()
        mx = F.greatest(*lps) if len(lps) > 1 else lps[0]
        es = [F.exp(lp - mx) for lp in lps]
        return df.withColumn(output_col, mx + F.log(sum(es[1:], es[0])))

    def fit_predict(self, df: DataFrame, columns=None,
                    output_col: str = "prediction") -> DataFrame:
        return self.fit(df, columns).predict(df, output_col)
