"""The engine's query catalog: every entry pairs a Spark DataFrame
plan (exercising the package operators) with an ANSI-SQL oracle that
DuckDB can run on the same parquet tables.

This is the correctness surface for SURVEY.md §2 plus the
beyond-reference datapipe operators. Column names AND types are
aligned between the Spark plan and the oracle (the driver hash
compares after sorting columns by name).

CANONICAL DOUBLE AGGREGATION (r10 convention, grep: _dsum/_davg):
every OUTPUT column that sums or averages a double measure at
revenue/price scale accumulates in exact int64 FIXED-POINT (1e-4
units) in BOTH engines, then converts to double once:

    Spark:  _dsum(e) = sum(floor(e*10000 + 0.5)::long)::double / 1e4
            _davg(e) = _dsum(e) / count(e)
    SQL:    CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                 AS DOUBLE) / 10000
            ... / count(e)

Integer addition is exact and associative, so NO plan-shape change
(salting, AQE re-plan, partial-agg reorder, join strategy swap) can
move the output bits — unlike raw double sums, whose partial-sum
association order drifts ~n*eps*Σ (≈1e-3 on 1e9-scale revenues at
sf0.1, straddling the driver's 1e-6 rounding grid; this flipped
salted_join_revenue red in round 9). floor on a bit-identical double
needs no cross-engine rounding-mode agreement (a DECIMAL(18,4) cast
hits exact .xxxx50 midpoints where Spark's HALF_UP and DuckDB
disagree — measured on sum_charge), and the int64 sum benchmarked as
fast as a raw double sum where decimal aggregation was 3-4x slower.
Exactness bound: |Σ| < 2^63 fixed-point units ≈ 9.2e14 currency units
— headroom through ~SF 1000; a true 100 TB GLOBAL rollup should widen
to sum(CAST(e AS DECIMAL(18,4))) (same bit-stability, slower, 1e34
headroom). Ratios of big sums (r², market share, correlations)
self-normalize (relative drift ~1e-11) and stay raw doubles.
"""
from __future__ import annotations
from pyspark.sql import functions as F
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from dask_ml_spark.datapipe import text_stats as TS

LINEITEM_FEATS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


TOKEN_RE_SQL = "[a-z0-9_]{2,}"


def _dsum(col):
    """Order-independent sum of a double measure: exact int64
    fixed-point (1e-4 unit) accumulation — immune to any plan-shape
    change, no cross-engine rounding-mode dependence (floor of a
    bit-identical double), and benchmarked as fast as a raw double sum
    (DECIMAL aggregation was 3-4x slower). Exact while |Σ| < 2^63
    units ≈ 9.2e14 currency units (see module docstring).
    SQL twin: CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000."""
    if isinstance(col, str):
        col = F.col(col)
    return (F.sum(F.floor(col * 10000 + F.lit(0.5)).cast("long"))
            .cast("double") / F.lit(10000))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dask_ml_spark.sources.io import load_table

    return load_table(spark, sf_dir, name)


def _sql_shingles(n: int = 3) -> str:
    """DuckDB expression producing the distinct word-n-gram list."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(toks) - {n - 2}, 1)), i -> {gram}))"
    )


def _sql_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TS.STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')), [{words}]))"
        f" / greatest(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))), 1)"
    )


SQL_KNN_GRAPH_TOPK = """
WITH planes AS (
    SELECT vec_id - 100 AS p, embedding::DOUBLE[] AS pvec
    FROM embeddings WHERE vec_id >= 100 AND vec_id < 180
), bits AS (
    SELECT e.vec_id, e.embedding, p // 10 AS band,
           CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.pvec) > 0
                THEN 1 << (p % 10) ELSE 0 END AS bit
    FROM embeddings e CROSS JOIN planes pl
), buckets AS (
    SELECT vec_id, any_value(embedding) AS embedding, band,
           CAST(sum(bit) AS BIGINT) AS bucket
    FROM bits GROUP BY vec_id, band
), cand AS (
    SELECT DISTINCT a.vec_id AS src, a.embedding AS avec,
           b.vec_id AS dst, b.embedding AS bvec
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.vec_id != b.vec_id
), scored AS (
    SELECT src, dst, list_cosine_similarity(avec, bvec) AS score
    FROM cand
)
SELECT src, dst, rank FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY score DESC, dst ASC) AS rank
    FROM scored
) WHERE rank <= 5
"""


