"""Schema/column utilities shared across operators.

The reference spends ~500 LoC defending against unknown chunk sizes and
meta inference (dask_ml/utils.py:123-279); on Spark the schema is
authoritative, so the equivalents here are thin.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_SPARK_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def is_numeric_field(field: T.StructField) -> bool:
    return isinstance(field.dataType, NUMERIC_SPARK_TYPES)


def sql_scalar_lit(v) -> str:
    """SQL literal typed exactly as ``F.lit`` would type the Python
    value (int32-range ints are INT, larger BIGINT, floats DOUBLE via
    repr round-trip + D suffix, bools BOOLEAN, strings STRING) — the
    building block for single-parse literal arrays."""
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        i = int(v)
        return str(i) if -2 ** 31 <= i < 2 ** 31 else f"{i}L"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite literal {v!r}")
        return f"{f!r}D"
    if isinstance(v, str):
        # backslash escapes are only decoded by the DEFAULT parser; under
        # spark.sql.parser.escapedStringLiterals=true neither \' nor ''
        # is unescaped (verified on 4.1), so a quote/backslash in data
        # would silently change value or break the parse — refuse loudly
        # (lit_array falls back to per-element F.lit for this case)
        if _legacy_string_literals():
            raise ValueError(
                "sql_scalar_lit(str) requires the default parser "
                "(spark.sql.parser.escapedStringLiterals=false); use "
                "F.lit for string literals under the legacy conf")
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"unsupported literal {v!r}")


def _legacy_string_literals() -> bool:
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    return (sess is not None and sess.conf.get(
        "spark.sql.parser.escapedStringLiterals", "false") == "true")


def lit_array(vals) -> F.Column:
    """A literal array as ONE parsed SQL expression.

    ``F.array(*[F.lit(v) for v in vals])`` pays a py4j round trip per
    element — ~1 s per thousand literals on an idle driver and several
    times that under contention (round trips are latency-bound; this
    was measured as the DOMINANT cost of the ANN index and bootstrap
    builders before their r13 conversions). The generated SQL types
    every element exactly as ``F.lit`` would, so downstream arithmetic
    and results are bit-identical."""
    vals = list(vals)
    if not vals:
        return F.array()
    if any(isinstance(v, str) for v in vals) and _legacy_string_literals():
        # the legacy parser decodes no escape style — pay the py4j
        # round trips rather than emit literals that could mis-parse
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ", ".join(sql_scalar_lit(v) for v in vals) + ")")


def numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if is_numeric_field(f)]


def resolve_feature_columns(df: DataFrame, columns=None) -> list[str]:
    """Resolve a feature-column spec to concrete column names.

    ``None`` → all numeric columns (mirrors the reference treating a whole
    dask array as features); a string → single column; else a sequence.
    """
    if columns is None:
        cols = numeric_columns(df)
        if not cols:
            raise ValueError("DataFrame has no numeric columns to use as features")
        return cols
    if isinstance(columns, str):
        columns = [columns]
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"Columns not in DataFrame: {missing}")
    return list(columns)


def vector_struct(cols: Sequence[str]):
    """An array<double> expression packing feature columns (JVM-side)."""
    return F.array(*[F.col(c).cast("double") for c in cols])


def check_matching_columns(df_a: DataFrame, df_b: DataFrame, cols: Iterable[str]) -> None:
    """Analog of check_matching_blocks (reference dask_ml/utils.py:248-279):
    with a single DataFrame holding X and y, alignment is structural; this
    only checks that two frames share the named columns."""
    for c in cols:
        if c not in df_a.columns or c not in df_b.columns:
            raise ValueError(f"Column {c!r} missing from one of the frames")


def infer_output_fields(model, n_features: int, method: str = "predict") -> np.dtype:
    """Meta inference: run ``model.<method>`` on a 1-row dummy to learn the
    output dtype/shape (reference dask_ml/wrappers.py:642-695). Used to
    declare pandas-UDF return schemas."""
    dummy = np.zeros((1, n_features), dtype="float64")
    out = getattr(model, method)(dummy)
    out = np.asarray(out)
    return out.dtype, out.shape[1:] if out.ndim > 1 else ()


def numpy_dtype_to_spark(dt: np.dtype) -> T.DataType:
    dt = np.dtype(dt)
    if dt.kind == "f":
        return T.DoubleType() if dt.itemsize == 8 else T.FloatType()
    if dt.kind in "iu":
        return T.LongType() if dt.itemsize >= 8 else T.IntegerType()
    if dt.kind == "b":
        return T.BooleanType()
    return T.StringType()


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input is under-partitioned for CPU-heavy work.

    Small parquet inputs scan as 1-3 partitions (128 MB splits), which
    serializes expression-heavy operators (hashing, shingling, UDF
    inference) onto a few cores. At 100 TB inputs already carry
    thousands of partitions and this is a no-op — the check is
    driver-side and costs nothing but a plan conversion.
    """
    if df.isStreaming:
        # no static partition count to inspect; micro-batch sizing is
        # the stream's own concern (maxFilesPerTrigger etc.)
        return df
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        plan = ""
    if "Exchange" in plan:
        # under AQE, probing df.rdd FINALIZES the plan: every query
        # stage below the probe point (shuffle maps, broadcasts, cache
        # materializations) runs as REAL jobs whose output is thrown
        # away when the caller extends or persists the plan afterwards
        # (measured: 1-2 discarded jobs per call on CV-fold-cache
        # shapes). A frame behind an exchange is already
        # shuffle-partitions wide — scale-governed, not a 1-3-split
        # parquet scan — so skip both the probe and the repartition.
        # (executedPlan() is pure planning, no jobs, and the
        # QueryExecution is cached for the caller's eventual action.)
        return df
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def right_size_cv_cache(df: DataFrame, n_jobs: int,
                        bytes_per_part: int = 64 << 20) -> DataFrame:
    """Partition a CV fold cache for CONCURRENT consumers.

    A cached fold feeding n_jobs concurrent (candidate, fold) fits only
    needs ~cores/n_jobs partitions per fit to saturate the machine —
    the racing fits supply the rest of the parallelism, and every extra
    partition multiplies per-iteration scheduling cost across EVERY
    LBFGS/IRLS job of every fit (measured: a 600k-row cache at 8
    partitions runs a 6-way grid ~30% faster than at 32).

    Scale safety: the shrink is floored by a bytes-per-partition bound
    from Catalyst plan statistics (parquet row-group metadata x column
    pruning), so a cache whose estimated size needs more partitions
    keeps them; when statistics are unknown (post-shuffle plans report
    Long.Max) the frame is left alone apart from the usual
    under-partitioning floor.
    """
    sc = df.sparkSession.sparkContext
    per_fit = max(2, sc.defaultParallelism // max(1, n_jobs))
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        size = -1
    if size <= 0 or size > (1 << 42):  # unknown / absurd estimate
        return ensure_min_partitions(df)
    # deserialized cache is fatter than the scan estimate (vector
    # boxing, java object headers) — budget 4x
    by_bytes = (4 * size) // bytes_per_part + 1
    target = max(per_fit, by_bytes)
    current = df.rdd.getNumPartitions()
    if target < current:
        return df.repartition(target)
    return ensure_min_partitions(df, target)


def add_row_index(df: DataFrame, name: str = "__row_id__") -> DataFrame:
    """Stable unique row id without a global sort.

    monotonically_increasing_id is partition-local-monotonic which is all
    the engine needs (join keys, fold assignment); a global contiguous
    index would force a full pass + shuffle and does not scale.
    """
    return df.withColumn(name, F.monotonically_increasing_id())


def zip_with_index(df: DataFrame, order_cols, id_col: str = "index",
                   num_partitions: int | None = None):
    """Dense 0-based ids in global ``order_cols`` order, fully
    distributed (no single-partition window, no driver collect of
    data).  The classic two-phase scheme: range-partition + sort by the
    order key, count rows per partition (only #partitions longs reach
    the driver), then id = partition offset + local row_number.

    Returns (indexed_df, persisted_input) — caller unpersists the
    second when done; the persist pins the partitioning so the count
    pass and the id pass see identical splits.
    """
    from pyspark.sql import Window

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n_parts, *order_cols)
              .sortWithinPartitions(*order_cols)
              .withColumn("__pid", F.spark_partition_id())
              .persist())
    sizes = {r["__pid"]: r["n"] for r in
             ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_col = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (ranged.withColumn(
        id_col, (offset_col + F.row_number().over(w) - 1).cast("long"))
           .drop("__pid"))
    return out, ranged


def check_array(df: DataFrame, columns=None, *, accept_spark_dataframe: bool = True,
                ensure_min_features: int = 1, ensure_all_finite: bool = False) -> DataFrame:
    """Validate a feature DataFrame (reference utils.py:123-214).

    The reference fabricates a numpy sample and runs sklearn's
    ``check_array`` on it; on Spark the schema is authoritative, so
    this validates the schema directly: the input must be a DataFrame
    with at least ``ensure_min_features`` numeric feature columns.
    ``ensure_all_finite=True`` adds the reference's NaN/inf scan
    (k_means.py:195-201), which forces one pass over the data.
    """
    if not isinstance(df, DataFrame):
        raise TypeError(f"Expected a pyspark DataFrame, got {type(df).__name__}")
    if not accept_spark_dataframe:
        raise TypeError("Spark DataFrame input was explicitly disallowed")
    cols = resolve_feature_columns(df, columns)
    if len(cols) < ensure_min_features:
        raise ValueError(
            f"Found {len(cols)} feature(s) but ensure_min_features={ensure_min_features}")
    non_numeric = [c for c in cols
                   if not is_numeric_field(df.schema[c])]
    if non_numeric:
        raise ValueError(f"Non-numeric feature columns: {non_numeric}")
    if ensure_all_finite:
        bad = df.where(
            " OR ".join(f"(isnan({c}) OR {c} IS NULL OR abs({c}) = double('inf'))"
                        for c in cols)
        ).limit(1).count()
        if bad:
            raise ValueError("Input contains NaN, infinity, or null values")
    return df


def check_X_y(df: DataFrame, y: str, columns=None, **check_array_kwargs) -> DataFrame:
    """Validate features + a label column in one frame (reference
    utils.py:282-343).  The reference checks X/y length consistency;
    a single DataFrame holding both makes that free — what remains is
    schema validation of both sides."""
    check_array(df, columns, **check_array_kwargs)
    if y not in df.columns:
        raise ValueError(f"Label column {y!r} not in DataFrame")
    if not is_numeric_field(df.schema[y]) and not isinstance(
            df.schema[y].dataType, T.StringType):
        raise ValueError(f"Label column {y!r} must be numeric or string")
    return df


def check_chunks(n_samples: int, n_features: int, chunks=None) -> tuple:
    """Partitioning analog of the reference's chunk normalizer
    (utils.py:444-483): returns ``(rows_per_partition, n_features)``.
    ``chunks=None`` picks one partition per default-parallelism core
    with at least 100 rows per partition, mirroring the reference's
    defaults; an int is interpreted as a partition count."""
    min_rows = 100
    if chunks is None:
        from dask_ml_spark._session import get_spark

        n_parts = get_spark().sparkContext.defaultParallelism
        rows = max(min_rows, (n_samples + n_parts - 1) // max(n_parts, 1))
        return (rows, n_features)
    if isinstance(chunks, int):
        rows = max(min_rows, (n_samples + chunks - 1) // max(chunks, 1))
        return (rows, n_features)
    chunks = tuple(chunks)
    if len(chunks) != 2:
        raise AssertionError("Chunks should be a 2-tuple.")
    return chunks


def copy_learned_attributes(from_estimator, to_estimator) -> None:
    """Copy every fitted attribute (trailing-underscore convention)
    from one estimator to another (reference _utils.py:8-12)."""
    for k, v in vars(from_estimator).items():
        if k.endswith("_") and not k.startswith("_"):
            setattr(to_estimator, k, v)


def handle_zeros_in_scale(scale):
    """Constant features scale by 1 instead of dividing by zero
    (reference utils.py:74-83)."""
    import numbers

    if isinstance(scale, numbers.Number):
        return 1.0 if scale == 0.0 else scale
    s = np.asarray(scale, dtype="float64").copy()
    s[s == 0.0] = 1.0
    return s


def check_random_state(random_state):
    """Normalize None/int/RandomState to a RandomState (reference
    utils.py:235-246, minus the dask-specific branch)."""
    if random_state is None:
        return np.random.RandomState()
    if isinstance(random_state, int):
        return np.random.RandomState(random_state)
    if isinstance(random_state, np.random.RandomState):
        return random_state
    raise TypeError(f"Cannot use {random_state!r} to seed a RandomState")


def assert_estimator_equal(left, right, exclude=None, **kwargs):
    """Compare every learned attribute (trailing-underscore) of two
    fitted estimators (reference utils.py:91-121) — the reference's
    main testing utility; numpy-tolerant via **kwargs (atol/rtol)."""
    exclude = set() if exclude is None else set(exclude)
    l_attrs = {a for a in dir(left) if a.endswith("_") and not a.startswith("_")}
    r_attrs = {a for a in dir(right) if a.endswith("_") and not a.startswith("_")}
    attrs = (l_attrs & r_attrs) - exclude
    assert attrs, "no learned attributes in common"
    for attr in attrs:
        _assert_eq(getattr(left, attr), getattr(right, attr), name=attr, **kwargs)


def _assert_eq(l, r, name=None, **kwargs):
    if isinstance(l, dict):
        assert isinstance(r, dict) and set(l) == set(r), name
        for k in l:
            _assert_eq(l[k], r[k], name=f"{name}[{k}]", **kwargs)
    elif isinstance(l, np.ndarray) or isinstance(r, np.ndarray):
        la, ra = np.asarray(l), np.asarray(r)
        if la.dtype.kind in "fc" or ra.dtype.kind in "fc":
            np.testing.assert_allclose(la, ra, err_msg=str(name), **kwargs)
        else:
            np.testing.assert_array_equal(la, ra, err_msg=str(name))
    elif isinstance(l, float) or isinstance(r, float):
        assert l == pytest_approx(r, **kwargs), f"{name}: {l} != {r}"
    else:
        assert l == r, f"{name}: {l!r} != {r!r}"


def pytest_approx(value, atol=1e-8, rtol=1e-6, **_):
    import math

    class _Approx:
        def __eq__(self, other):
            return math.isclose(other, value, rel_tol=rtol, abs_tol=atol)

    return _Approx()


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP (LTZ).

    Spark 4.1+ delivers parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ, which
    `withWatermark` rejects and which cannot be cast straight to long.
    Session timezone is pinned UTC, so the NTZ→LTZ cast is lossless.
    No-op when the column is already a (LTZ) timestamp.
    """
    field = df.schema[ts_col]
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def salted_join(left: DataFrame, right: DataFrame, on: str, n_salt: int = 16,
                how: str = "inner", hot_keys="auto",
                hot_threshold: int | None = None,
                max_hot_keys: int = 1000) -> DataFrame:
    """Join a key-skewed left side against a right side by splitting
    each HOT key across n_salt sub-keys, leaving the uniform remainder
    on the plain hash join.

    Only detected/listed hot keys are salted: their left rows get a
    random salt (spread over n_salt reducers) and ONLY the matching
    right rows are replicated n_salt times — the naive form that
    replicates the whole right side multiplies right shuffle volume by
    n_salt for every key, skewed or not. The unsalted remainder joins
    normally and the two branches union. AQE skew-join handles the
    same problem adaptively; this is the explicit form for planned
    skew.

    hot_keys:
      - ``"auto"`` (default): detect heavy keys with one exact
        ``groupBy(on).count()`` pass — map-side combine makes the
        detection itself skew-immune (a hot key reduces to one row per
        map partition before the shuffle). Costs one extra count job
        for the default threshold; pass ``hot_threshold`` (or an
        explicit key list) to skip that.
      - ``"all"``: salt every key — the demonstration form
        (right side replicated n_salt times wholesale).
      - an iterable of key values: explicit hot list, no detection
        pass (the production shape when skew is known up front).
    hot_threshold: a key is hot when its left row count exceeds this;
      default is a task's fair share, ``left.count() /
      spark.sql.shuffle.partitions`` (floored at 1000 so small tables
      never salt).
    max_hot_keys: the hot list is collected to the driver for the
      split predicates; above this, prefer AQE skew-join
      (``spark.sql.adaptive.skewJoin.enabled``) over explicit salting.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated n_salt times for hot keys, so right/full outer would
    emit each unmatched hot right row once per salt replica. Flip the
    inputs (salting the skewed side as ``left``) for the mirrored
    cases.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the salt-replicated right side would duplicate unmatched right rows"
        )

    def _salted(l_side: DataFrame, r_side: DataFrame) -> DataFrame:
        salt_l = F.floor(F.rand(seed=0) * n_salt).cast("int")
        salted_l = l_side.withColumn("__salt", salt_l)
        salted_r = r_side.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0).cast("int"),
                                           F.lit(n_salt - 1).cast("int"))))
        return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")

    if isinstance(hot_keys, str) and hot_keys == "all":
        return _salted(left, right)
    if isinstance(hot_keys, str) and hot_keys == "auto":
        counts = left.groupBy(on).agg(F.count(F.lit(1)).alias("__c"))
        if hot_threshold is None:
            # ONE pass over left: the fair-share total comes from the
            # (persisted) per-key counts, not a second left.count()
            # scan (review-caught — the stated use case is an
            # expensive skewed fact frame)
            counts = counts.persist()
            sp = int(left.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "200"))
            total = counts.agg(F.sum("__c")).collect()[0][0] or 0
            hot_threshold = max(total // max(sp, 1), 1000)
        hot = counts.where(F.col("__c") > hot_threshold)
        rows = hot.select(on).limit(max_hot_keys + 1).collect()
        counts.unpersist()
        if len(rows) > max_hot_keys:
            raise ValueError(
                f"more than max_hot_keys={max_hot_keys} keys exceed "
                f"hot_threshold={hot_threshold}; use AQE skew-join "
                "(spark.sql.adaptive.skewJoin.enabled) instead of an "
                "explicit hot list this long")
        hot_list = [r[0] for r in rows]
    elif isinstance(hot_keys, str):
        raise ValueError(f"hot_keys must be 'auto', 'all', or a list, "
                         f"got {hot_keys!r}")
    else:
        # NULL keys never equi-match; dropping them from the hot list
        # keeps the split predicates three-valued-logic-safe
        hot_list = [k for k in hot_keys if k is not None]

    if not hot_list:
        return left.join(right, on, how)

    is_hot = F.col(on).isin(hot_list)
    # null-key left rows go to the cold branch (they survive a left
    # join unmatched there; ~isin(NULL) is NULL and would drop them)
    cold = (left.where(~is_hot | F.col(on).isNull())
            .join(right.where(~is_hot), on, how))
    hot = _salted(left.where(is_hot), right.where(is_hot))
    return hot.unionByName(cold)


class ScalabilityError(RuntimeError):
    """Raised by assert_scalable when a plan contains a known
    scale-killer shape."""


def assert_scalable(df: DataFrame, *, allow_cartesian: bool = False,
                    allow_row_python: bool = False,
                    allow_broadcast_nested_loop: bool = False) -> DataFrame:
    """Plan lint: raise ScalabilityError if the physical plan contains
    a shape that is quietly fine on test data and catastrophic at
    100 TB — the library's plan-shape regression tests, packaged for
    user pipelines (call it on a DataFrame in CI before the job ships).

    Checks, each individually waivable:
    - CartesianProduct — O(N·M) pairs of two LARGE sides; only ever
      acceptable as an explicitly-chosen brute-force baseline.
    - BatchEvalPython — a ROW-AT-A-TIME Python UDF in the plan (Arrow
      / pandas UDFs show up as ArrowEvalPython and are not flagged).
    - BroadcastNestedLoopJoin WITH a join condition — a non-equi join
      Spark could not hash; usually a missed equi-key or an unbucketed
      range. A condition-free Cross BNLJ is NOT flagged: Spark only
      plans it when one side fits the broadcast threshold, which is
      the scalar-aggregate crossJoin pattern (1-row stats broadcasts)
      this library itself uses — bounded by construction.

    Returns the DataFrame unchanged so it chains:
        assert_scalable(build_pipeline(...)).write.parquet(...)
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    problems = []
    if not allow_cartesian and "CartesianProduct" in plan:
        problems.append("CartesianProduct (O(N*M) pair explosion)")
    if not allow_row_python and "BatchEvalPython" in plan:
        problems.append("BatchEvalPython (row-at-a-time Python UDF; "
                        "use an Arrow pandas_udf)")
    if not allow_broadcast_nested_loop:
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line and ", Cross" not in line:
                problems.append(
                    "BroadcastNestedLoopJoin with a join condition "
                    "(non-equi join; add an equi key or bucket the range)")
                break
    if problems:
        raise ScalabilityError(
            "plan contains scale-killer shapes: " + "; ".join(problems)
            + "\n(waive explicitly via allow_* if intentional)")
    return df
