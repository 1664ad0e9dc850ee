"""Standalone query timer — the trustworthy alternative to reading
bench.py numbers off a loaded machine (the driver harness can inflate a
single query 10x; see PLANS.md / memory notes).

Usage:
    python scripts/time_queries.py [SF_DIR] name [name ...] [--runs N]

Runs each named catalog query through the noop sink (never .count() —
Catalyst would prune the computed columns) after warming the JVM and the
Python worker pool, and prints min/median of N runs. Min is the
contention-free estimate; a median far above min means ambient load.
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else runs
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        print("usage: time_queries.py [SF_DIR] name [name ...] [--runs=N]")
        sys.exit(2)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    spark = get_spark(app_name="time-queries",
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
        ts = []
        steals = []
        for _ in range(runs):
            spark.catalog.clearCache()
            s0 = _cpu_snap()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
            steals.append(_steal_pct(s0, _cpu_snap()))
        print(f"{name}: min={min(ts):.2f}s median={statistics.median(ts):.2f}s "
              f"runs={[round(t, 2) for t in ts]} "
              f"steal%={[round(s, 1) for s in steals]}")


def _cpu_snap():
    """(total, steal) jiffies from /proc/stat — ambient-load forensics
    on a shared host: a run with high steal%% was time-sliced away by a
    noisy neighbor and its wall-clock is not the engine's cost."""
    try:
        with open("/proc/stat") as f:
            parts = list(map(int, f.readline().split()[1:]))
        return sum(parts), parts[7] if len(parts) > 7 else 0
    except Exception:
        return 0, 0


def _steal_pct(a, b):
    dt = b[0] - a[0]
    return 100.0 * (b[1] - a[1]) / dt if dt else 0.0


if __name__ == "__main__":
    main()
