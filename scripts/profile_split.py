"""Split each named catalog query's wall time into DataFrame BUILD
(driver-side plan construction, incl. any eager index fitting) vs
EXECUTE (noop sink), min over N runs of each. Driver-bound queries are
invisible to the Spark UI (guide §7.3) — this makes them visible.

Usage: python scripts/profile_split.py [SF_DIR] name ... [--runs=N]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs") and "=" in a:
            runs = int(a.split("=", 1)[1])
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    spark = get_spark(app_name="profile-split",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_catalog()

    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100_000).repartition(32).select(_warm("id")).write.mode(
        "overwrite").format("noop").save()

    for name in names:
        fn = queries[name]
        builds, execs = [], []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(f"{name}: build_min={min(builds):.2f}s exec_min={min(execs):.2f}s "
              f"builds={[round(b, 2) for b in builds]} "
              f"execs={[round(e, 2) for e in execs]}", flush=True)


if __name__ == "__main__":
    main()
