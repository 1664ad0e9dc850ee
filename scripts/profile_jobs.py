"""Per-query job/stage forensics: run a catalog query once (after
warmup) and report wall time, Spark job count, stage count, and task
count — the scheduling-overhead profile that explains driver-loop
queries (searches, BPE, EM) where the plan dump explains nothing.

Usage: python scripts/profile_jobs.py [SF_DIR] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    spark = get_spark(app_name="profile-jobs",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_catalog()

    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100_000).repartition(32).select(_warm("id")).write.mode(
        "overwrite").format("noop").save()

    tracker = spark.sparkContext.statusTracker()

    def snap():
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    for name in names:
        spark.catalog.clearCache()
        before = snap()
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
        wall = time.time() - t0
        after = snap()
        job_ids = [j for j in (tracker.getJobIdsForGroup(None) or [])
                   if before < j <= after]
        n_stages = n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{name}: wall={wall:.2f}s jobs={len(job_ids)} "
              f"stages~={n_stages} tasks~={n_tasks}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
