"""Composition: Pipeline, ColumnTransformer, FeatureUnion.

Reference: dask_ml/compose/_column_transformer.py:12-219 and the
pipeline handling inside model_selection/_search.py:619-749.

Spark advantage (SURVEY §2.7): with a single DataFrame carrying all
columns, column-wise composition is just sequential withColumns —
there is no positional zip-join problem, no dd.concat(axis=1). Each
stage's transform composes into ONE Catalyst plan, so a full pipeline
(impute → scale → encode → assemble) executes as a single fused
projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dask_ml_spark.base import BaseEstimator, TransformerMixin


class Pipeline(BaseEstimator):
    """Sequential estimator chain; all but the last stage must be
    transformers. Mirrors sklearn.pipeline.Pipeline over DataFrames."""

    def __init__(self, steps):
        self.steps = steps

    @property
    def named_steps(self):
        return dict(self.steps)

    def _final(self):
        return self.steps[-1][1]

    def set_params(self, **params) -> "Pipeline":
        """sklearn step__param routing (reference search graphs rely on
        it to address pipeline stages, _search.py:619-749)."""
        named = self.named_steps
        for k, v in params.items():
            if "__" in k:
                step, _, sub = k.partition("__")
                if step not in named:
                    raise ValueError(f"Unknown pipeline step {step!r} in param {k!r}")
                named[step].set_params(**{sub: v})
            elif k == "steps":
                self.steps = v
            else:
                raise ValueError(
                    f"Pipeline params must use step__param syntax, got {k!r}"
                )
        return self

    def clone(self) -> "Pipeline":
        return Pipeline([(name, est.clone()) for name, est in self.steps])

    def required_input_columns(self, columns):
        """Union of the stages' input needs (w.r.t. the ORIGINAL
        frame). Stages after a shape-changing step reference DERIVED
        columns; including those names is harmless — the planner
        intersects with the frame's actual columns — while any stage
        that cannot declare its needs (returns None) disables pruning
        for the whole pipeline."""
        out: list = []
        for _name, est in self.steps:
            req = est.required_input_columns(columns)
            if req is None:
                return None
            out.extend(c for c in req if c not in out)
        if columns is not None:
            out.extend(c for c in columns if c not in out)
        return out

    def fit(self, df: DataFrame, columns=None, label_col: str = "label"):
        data = df
        for name, est in self.steps[:-1]:
            est.fit(data, columns=columns)
            data = est.transform(data)
            # a shape-changing step (feature selection, dummy encoding)
            # publishes its surviving/produced columns — downstream
            # steps must fit on THOSE, not the original list
            if hasattr(est, "transformed_columns_"):
                columns = est.transformed_columns_
        final = self._final()
        try:
            final.fit(data, columns=columns, label_col=label_col)
        except TypeError:
            final.fit(data, columns=columns)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        data = df
        for _, est in self.steps:
            data = est.transform(data)
        return data

    def predict(self, df: DataFrame, **kw) -> DataFrame:
        data = df
        for _, est in self.steps[:-1]:
            data = est.transform(data)
        return self._final().predict(data, **kw)

    def score(self, df: DataFrame, label_col: str = "label"):
        data = df
        for _, est in self.steps[:-1]:
            data = est.transform(data)
        return self._final().score(data, label_col=label_col)


def make_pipeline(*steps):
    return Pipeline([(type(s).__name__.lower(), s) for s in steps])


class ColumnTransformer(BaseEstimator, TransformerMixin):
    """Apply different transformers to column subsets (reference
    _column_transformer.py:12-219). remainder='passthrough'|'drop'.

    Each transformer sees (and replaces) only its columns; the outputs
    stay in the same DataFrame — one plan, zero joins.
    """

    def __init__(self, transformers, remainder: str = "passthrough"):
        self.transformers = transformers
        self.remainder = remainder

    def required_input_columns(self, columns):
        """The transformers' own column specs, not the caller's list
        (each sub-transformer is column-scoped on its spec); with
        remainder='passthrough' the whole frame flows through, so
        pruning is unsafe -> None."""
        if self.remainder == "passthrough":
            return None
        out: list = []
        for _name, est, cols in self.transformers:
            cols = [cols] if isinstance(cols, str) else list(cols)
            req = est.required_input_columns(cols)
            if req is None:
                return None
            out.extend(c for c in req if c not in out)
        return out

    def fit(self, df: DataFrame, columns=None) -> "ColumnTransformer":
        self.fitted_ = []
        for name, est, cols in self.transformers:
            cols = [cols] if isinstance(cols, str) else list(cols)
            est.fit(df, columns=cols)
            self.fitted_.append((name, est, cols))
        self.transformed_columns_ = [c for _, _, cols in self.fitted_ for c in cols]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = df
        for _, est, cols in self.fitted_:
            out = est.transform(out)
        if self.remainder == "drop":
            keep = []
            for _, est, cols in self.fitted_:
                produced = getattr(est, "transformed_columns_", cols)
                keep += [c for c in produced if c in out.columns]
            out = out.select(*keep)
        return out


def make_column_transformer(*transformers, remainder: str = "passthrough"):
    named = [(f"t{i}", est, cols) for i, (est, cols) in enumerate(transformers)]
    return ColumnTransformer(named, remainder=remainder)


class FeatureUnion(BaseEstimator, TransformerMixin):
    """Apply several transformers to the same input and keep all their
    outputs side by side (reference methods.py:199-208 hstack — here
    the union is column-wise in one DataFrame, so it's free).

    Stages should produce NEW columns (PCA `pc*`, encoders
    `col_value`, vectorizer `output_col`, …). A stage that rewrites
    its input columns in place (scalers) contributes its rewritten
    values and later stages see them — wrap such stages in a
    ColumnTransformer on disjoint columns if isolation is needed.
    """

    def __init__(self, transformer_list):
        self.transformer_list = transformer_list

    def required_input_columns(self, columns):
        out: list = []
        for _name, est in self.transformer_list:
            req = est.required_input_columns(columns)
            if req is None:
                return None
            out.extend(c for c in req if c not in out)
        return out

    def fit(self, df: DataFrame, columns=None) -> "FeatureUnion":
        for _, est in self.transformer_list:
            est.fit(df, columns=columns)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = df
        for _, est in self.transformer_list:
            out = est.transform(out)
        return out
