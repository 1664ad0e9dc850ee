"""Categorical encoders.

Reference: dask_ml/preprocessing/label.py (LabelEncoder),
dask_ml/preprocessing/_encoders.py (OneHotEncoder),
dask_ml/preprocessing/data.py:421-1045 (Categorizer, DummyEncoder,
OrdinalEncoder).

Design: "fit" discovers per-column dictionaries with a distinct-scan
(`SELECT DISTINCT ... ORDER BY` — a shuffle on the column, map-side
partial distinct first). Dictionaries are small driver-side arrays.
"transform" is a broadcast lookup: for small dictionaries we fold the
mapping into the plan as a chained when()/element_at on a map literal
(pure JVM expression, no join, no shuffle); the generic path is a
broadcast hash join against the dictionary. Both scale: the data
never shuffles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, TransformerMixin

# Above this many categories we stop inlining map literals into the plan.
_INLINE_MAP_MAX = 10_000


def _code_expr(col, mapping: dict):
    """Expression mapping values→codes via an inline map literal."""
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return m[col]


class Categorizer(BaseEstimator, TransformerMixin):
    """Discover the category dictionary of each string column
    (reference data.py:421-580 — dask's df.categorize()). Spark has no
    categorical dtype; the fitted state is the dictionary itself, which
    downstream encoders reuse (the reference's known-categories fast
    path, label.py:104-112)."""

    def __init__(self, columns=None):
        self.columns = columns

    def fit(self, df: DataFrame, columns=None) -> "Categorizer":
        cols = columns or self.columns
        if cols is None:
            cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
        types = {f.name: f.dataType.typeName() for f in df.schema.fields}
        self.categories_ = {}
        if cols and all(types.get(c) == "string" for c in cols):
            # ONE scan for every dictionary: stack (column, value) pairs
            # and distinct — instead of one full-table scan per column,
            # which is the difference between 1 and D passes at scale.
            # The result is dimension-sized (sum of cardinalities).
            pairs = (
                df.select(F.explode(F.array(*[
                    F.struct(F.lit(c).alias("c"), F.col(c).alias("v")) for c in cols
                ])).alias("p"))
                .select("p.c", "p.v")
                .where(F.col("v").isNotNull())
                .distinct()
                .collect()
            )
            by_col: dict[str, list] = {c: [] for c in cols}
            for r in pairs:
                by_col[r["c"]].append(r["v"])
            for c in cols:
                self.categories_[c] = np.asarray(sorted(by_col[c]))
        else:
            # mixed/non-string dtypes: per-column distinct keeps values typed
            for c in cols:
                vals = [r[0] for r in df.select(c).where(F.col(c).isNotNull()).distinct().orderBy(c).collect()]
                self.categories_[c] = np.asarray(vals)
        self.columns_ = list(cols)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        # No categorical dtype in Spark — transform is identity; the value
        # of Categorizer is its fitted dictionaries feeding the encoders.
        return df


class LabelEncoder(BaseEstimator, TransformerMixin):
    """Encode a single column to integer codes 0..k-1 ordered by value
    (reference label.py:114-196: fit = da.unique → sorted classes_,
    transform = searchsorted, unseen labels raise)."""

    def __init__(self, use_categorical: bool = True):
        self.use_categorical = use_categorical

    def fit(self, df: DataFrame, column: str = None) -> "LabelEncoder":
        if column is None:
            if len(df.columns) != 1:
                raise ValueError("LabelEncoder.fit needs a single column")
            column = df.columns[0]
        vals = [
            r[0]
            for r in df.select(column).where(F.col(column).isNotNull()).distinct().orderBy(column).collect()
        ]
        self.classes_ = np.asarray(vals)
        self.column_ = column
        return self

    def _mapping(self):
        return {v: i for i, v in enumerate(self.classes_.tolist())}

    def transform(self, df: DataFrame, output_col: str | None = None) -> DataFrame:
        out = output_col or self.column_
        code = _code_expr(F.col(self.column_), self._mapping())
        # unseen-label check (reference label.py:217-232): null code with
        # non-null input → error. Done lazily via a guard column that
        # raise_error()s at execution time — no extra pass over the data.
        guarded = F.when(
            F.col(self.column_).isNotNull() & code.isNull(),
            F.raise_error(F.concat(F.lit("y contains previously unseen label: "), F.col(self.column_).cast("string"))),
        ).otherwise(code)
        return df.withColumn(out, guarded.cast("int"))

    def inverse_transform(self, df: DataFrame, code_col: str, output_col: str | None = None) -> DataFrame:
        out = output_col or code_col
        arr = F.array(*[F.lit(v) for v in self.classes_.tolist()])
        return df.withColumn(out, F.element_at(arr, F.col(code_col).cast("int") + 1))

    def fit_transform(self, df: DataFrame, column: str = None, output_col: str | None = None) -> DataFrame:
        return self.fit(df, column).transform(df, output_col)


class OrdinalEncoder(BaseEstimator, TransformerMixin):
    """Replace each categorical column with its integer code
    (reference data.py:837-1045 — X[col].cat.codes)."""

    def __init__(self, columns=None):
        self.columns = columns

    def fit(self, df: DataFrame, columns=None) -> "OrdinalEncoder":
        cat = Categorizer().fit(df, columns or self.columns)
        self.categories_ = cat.categories_
        self.columns_ = cat.columns_
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c in self.columns_:
            mapping = {v: i for i, v in enumerate(self.categories_[c].tolist())}
            exprs[c] = _code_expr(F.col(c), mapping).cast("int")
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c in self.columns_:
            arr = F.array(*[F.lit(v) for v in self.categories_[c].tolist()])
            exprs[c] = F.element_at(arr, F.col(c).cast("int") + 1)
        return df.withColumns(exprs)


class DummyEncoder(BaseEstimator, TransformerMixin):
    """pandas get_dummies semantics: one 0/1 column per category, named
    ``col_value`` (reference data.py:583-834). Pure CASE WHEN projection
    — wide but narrow-dependency; inverse via greatest-of-codes."""

    def __init__(self, columns=None, drop_first: bool = False):
        self.columns = columns
        self.drop_first = drop_first

    def fit(self, df: DataFrame, columns=None) -> "DummyEncoder":
        cat = Categorizer().fit(df, columns or self.columns)
        self.categories_ = cat.categories_
        self.columns_ = cat.columns_
        # fitted output layout (reference's categorical_blocks_ bookkeeping)
        self.transformed_columns_ = []
        for c in self.columns_:
            cats = self.categories_[c].tolist()
            if self.drop_first:
                cats = cats[1:]
            self.transformed_columns_ += [f"{c}_{v}" for v in cats]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        new_cols = {}
        for c in self.columns_:
            cats = self.categories_[c].tolist()
            if self.drop_first:
                cats = cats[1:]
            for v in cats:
                new_cols[f"{c}_{v}"] = (F.col(c) == F.lit(v)).cast("tinyint")
        return df.withColumns(new_cols).drop(*self.columns_)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        exprs = {}
        for c in self.columns_:
            cats = self.categories_[c].tolist()
            base = cats[1:] if self.drop_first else cats
            # argmax over the dummy block (reference data.py:705-711)
            expr = None
            for v in base:
                cond = F.col(f"{c}_{v}") == 1
                expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
            if self.drop_first:
                expr = expr.otherwise(F.lit(cats[0]))
            exprs[c] = expr
        drop = [f"{c}_{v}" for c in self.columns_ for v in (self.categories_[c].tolist()[1:] if self.drop_first else self.categories_[c].tolist())]
        return df.withColumns(exprs).drop(*drop)


class OneHotEncoder(BaseEstimator, TransformerMixin):
    """One-hot to an MLlib SparseVector column (never densified —
    reference keeps CSR, label.py:235-248). Composes StringIndexer-style
    dictionaries with a sparse vector construction per row."""

    def __init__(self, columns=None, sparse_output: bool = True,
                 categories: dict | str = "auto", drop: str | None = None,
                 handle_unknown: str = "error"):
        if handle_unknown not in ("error", "ignore"):
            raise ValueError("handle_unknown must be 'error' or 'ignore'")
        if drop not in (None, "first"):
            raise ValueError("drop must be None or 'first'")
        self.columns = columns
        self.sparse_output = sparse_output
        self.categories = categories
        self.drop = drop
        self.handle_unknown = handle_unknown

    def fit(self, df: DataFrame, columns=None) -> "OneHotEncoder":
        if isinstance(self.categories, dict):
            # known-categories fast path (reference _encoders.py
            # categories= param): no fit scan at all
            self.columns_ = list(self.categories)
            self.categories_ = {c: np.asarray(v) for c, v in self.categories.items()}
        else:
            cat = Categorizer().fit(df, columns or self.columns)
            self.categories_ = cat.categories_
            self.columns_ = cat.columns_
        self.known_categories_ = dict(self.categories_)
        if self.drop == "first":
            self.categories_ = {c: v[1:] for c, v in self.categories_.items()}
        sizes = [len(self.categories_[c]) for c in self.columns_]
        self.feature_offsets_ = np.concatenate([[0], np.cumsum(sizes)])
        self.n_features_out_ = int(self.feature_offsets_[-1])
        return self

    def transform(self, df: DataFrame, output_col: str = "onehot") -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        if self.handle_unknown == "error":
            # lazy guard (reference _encoders.py handle_unknown='error'):
            # raises at execution time, no extra data pass
            for c in self.columns_:
                known = F.array_contains(
                    F.array(*[F.lit(v) for v in self.known_categories_[c].tolist()]), F.col(c)
                )
                df = df.withColumn(
                    c,
                    F.when(
                        F.col(c).isNotNull() & ~known,
                        F.raise_error(F.concat(
                            F.lit(f"Found unknown category in column {c}: "),
                            F.col(c).cast("string"),
                        )),
                    ).otherwise(F.col(c)),
                )

        n = self.n_features_out_
        if not self.sparse_output or n <= 1024:
            # dense array<double> built JVM-side: one direct equality
            # indicator per (column, category) slot — O(total
            # categories) per row, fully inside codegen
            slots = []
            for c in self.columns_:
                for v in self.categories_[c].tolist():
                    slots.append(F.when(F.col(c) == F.lit(v), 1.0).otherwise(0.0))
            arr = F.array(*slots)
            out = df.withColumn(output_col, array_to_vector(arr) if self.sparse_output else arr)
            return out
        # wide path: per-column JVM code lookup feeding MLlib's
        # OneHotEncoder + VectorAssembler — sparse vectors built entirely
        # JVM-side, no Python in the row path. handleInvalid='keep' +
        # dropLast=True makes the sentinel code (null / ignored-unknown)
        # an all-zero block, matching the dense path's semantics.
        from pyspark.ml.feature import OneHotEncoder as MLlibOneHotEncoder
        from pyspark.ml.feature import VectorAssembler

        sizes = [len(self.categories_[c]) for c in self.columns_]
        code_names = [f"__ohe_code_{j}" for j in range(len(self.columns_))]
        vec_names = [f"__ohe_vec_{j}" for j in range(len(self.columns_))]
        codes = {}
        for j, c in enumerate(self.columns_):
            mapping = {v: i for i, v in enumerate(self.categories_[c].tolist())}
            codes[code_names[j]] = F.coalesce(
                _code_expr(F.col(c), mapping).cast("double"),
                F.lit(float(sizes[j])),
            )
        work = df.withColumns(codes)
        # fit on a synthetic range frame so MLlib learns the category
        # sizes from the fitted dictionaries — never a data scan
        fit_df = df.sparkSession.range(max(sizes)).select(
            *[(F.col("id") % s).cast("double").alias(nm)
              for s, nm in zip(sizes, code_names)])
        model = MLlibOneHotEncoder(
            inputCols=code_names, outputCols=vec_names,
            handleInvalid="keep", dropLast=True,
        ).fit(fit_df)
        assembled = VectorAssembler(inputCols=vec_names, outputCol=output_col)
        return assembled.transform(model.transform(work)).drop(*code_names, *vec_names)


class TargetEncoder(BaseEstimator, TransformerMixin):
    """Mean-target (impact) encoding with additive smoothing —
    beyond-reference (sklearn 1.3 TargetEncoder semantics, fit on the
    full data):

        enc(cat) = (n_cat · mean_cat + smooth · global_mean)
                   / (n_cat + smooth)

    Fit is one groupBy per encoded column plus one global aggregate —
    per-category state is dictionary-sized (same contract as the other
    encoders, which all hold collected category dictionaries).
    Transform folds the mapping in as a literal map lookup with the
    global mean as the unseen-category default: a narrow projection,
    no join, no UDF.
    """

    def __init__(self, columns=None, smoothing: float = 20.0):
        self.columns = columns
        self.smoothing = smoothing

    def fit(self, df: DataFrame, columns=None, target_col: str = "label") -> "TargetEncoder":
        cols = [c for c in (columns or self.columns or [])]
        if not cols:
            raise ValueError("TargetEncoder requires explicit columns")
        t = F.col(target_col).cast("double")
        self.global_mean_ = float(df.agg(F.avg(t)).first()[0])
        s = float(self.smoothing)
        self.encodings_ = {}
        self.null_encodings_ = {}
        for c in cols:
            stats = df.groupBy(c).agg(F.count(t).alias("n"), F.avg(t).alias("m"))
            # cardinality guard (same policy as CountVectorizer's
            # vocabulary gate): the collected dictionary must stay
            # dimension-sized — a high-cardinality key (user ids, urls)
            # needs hashing or bucketing upstream, not a driver OOM here
            n_cat = stats.count()
            if n_cat > 100_000:
                raise ValueError(
                    f"TargetEncoder: column {c!r} has {n_cat:,} categories; "
                    "the per-category dictionary would not be driver-sized. "
                    "Hash or bucket the column first (e.g. FeatureHasher), "
                    "or encode with a join against the stats table.")
            rows = stats.collect()
            enc = {}
            null_enc = self.global_mean_
            for r in rows:
                # F.count(t) counts non-null targets: a category whose
                # targets are all null has n=0/m=None and smooths fully
                # back to the global mean
                m = self.global_mean_ if r["m"] is None else r["m"]
                val = (r["n"] * m + s * self.global_mean_) / (r["n"] + s)
                if r[c] is None:
                    # nulls are their own category (sklearn TargetEncoder
                    # treats NaN as a level) but can't be a map key —
                    # Spark rejects NULL_MAP_KEY — so they ride separately
                    null_enc = val
                else:
                    enc[r[c]] = val
            self.encodings_[c] = enc
            self.null_encodings_[c] = null_enc
        self.columns_ = cols
        self.target_col_ = target_col
        return self

    def transform(self, df: DataFrame, suffix: str = "_enc") -> DataFrame:
        exprs = {}
        for c in self.columns_:
            mapping = self.encodings_[c]
            null_enc = getattr(self, "null_encodings_", {}).get(
                c, self.global_mean_)
            if mapping:
                m = F.create_map(*[
                    x for k, v in mapping.items()
                    for x in (F.lit(k), F.lit(float(v)))
                ])
                seen = F.coalesce(m[F.col(c)], F.lit(self.global_mean_))
            else:
                seen = F.lit(self.global_mean_)
            exprs[c + suffix] = F.when(
                F.col(c).isNull(), F.lit(float(null_enc))).otherwise(seen)
        return df.withColumns(exprs)
