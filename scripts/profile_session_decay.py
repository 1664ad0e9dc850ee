"""Diagnose the r13 VERDICT's 32-core "late-bench degradation" claim:
re-time a fixed sentinel set of trivial-aggregate queries at several
positions inside a bench-shaped session, alongside JVM/session state
(GC time, heap, block-manager storage, persistent-RDD count).

If sentinel times grow with position, accumulated session state is
real (checkpoint blocks / GC debris); if they stay flat, the driver's
inverse-scaling cluster was ambient box load, not session decay.

Usage: python scripts/profile_session_decay.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

SENTINELS = ["jarque_bera_value", "part_attribute_stats",
             "f_regression_scores", "brier_event_probability",
             "zipf_token_fit", "winsorized_prices"]
CHECK_EVERY = 50


def jvm_state(spark):
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean().getHeapMemoryUsage()
    sc = spark.sparkContext._jsc.sc()
    infos = sc.getRDDStorageInfo()
    n_rdds = len(infos)
    mem_used = 0
    for i in range(n_rdds):
        for meth in ("memUsed", "memSize"):
            try:
                mem_used += getattr(infos[i], meth)()
                break
            except Exception:
                continue
    return {"gc_ms": int(gc_ms), "heap_mb": int(mem.getUsed() / 1e6),
            "stored_rdds": n_rdds, "storage_mb": int(mem_used / 1e6)}


def time_query(spark, queries, name, runs=2):
    ts = []
    for _ in range(runs):
        t0 = time.time()
        queries[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
        spark.catalog.clearCache()
    return round(min(ts), 3)


def main() -> None:
    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    import bench as B

    spark = get_spark(app_name="session-decay",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_catalog()

    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100_000).repartition(32).select(_warm("id")).write.mode(
        "overwrite").format("noop").save()

    log = []

    def checkpoint(pos):
        row = {"pos": pos, **jvm_state(spark),
               "sentinels": {n: time_query(spark, queries, n)
                             for n in SENTINELS}}
        log.append(row)
        print(json.dumps(row), flush=True)

    checkpoint(0)
    for i, name in enumerate(B.HEADLINE):
        queries[name](spark, SF_DIR).write.mode("overwrite").format(
            "noop").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        if (i + 1) % CHECK_EVERY == 0:
            checkpoint(i + 1)
    checkpoint(len(B.HEADLINE))
    print("RESULT " + json.dumps(log))
    spark.stop()


if __name__ == "__main__":
    main()
