"""Dump .explain("formatted") for named catalog queries to
plans/r13/<name>_<suffix>.txt (the optimization-round evidence files).

Usage: python scripts/dump_plans.py SUFFIX name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    spark = get_spark(app_name="dump-plans",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_catalog()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
