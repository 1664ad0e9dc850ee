"""STRICTER-than-driver audit: Spark vs DuckDB compared bit-exactly,
no float rounding. The driver's hash gate rounds floats first
(CORRECTNESS_r02 hash-matched many queries whose raw doubles differ at
1e-15 relative), so failures here are NOT necessarily driver failures —
they are queries relying on that rounding. Use to find queries whose
cross-engine drift is large enough to threaten the rounded gate
(diffs approaching 1e-6), and note that date/timestamp columns may
false-positive on representation (pandas Timestamp vs duckdb datetime).

Usage: python scripts/check_bitexact.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    import __spark_entry__ as E
    from dask_ml_spark import get_spark

    spark = get_spark(app_name="bitexact-check", shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, sql in oracles.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = qs[name](spark, SF_DIR).toPandas()
            want = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
        cols = sorted(got.columns)
        ok = cols == sorted(want.columns) and len(got) == len(want)
        bad_cols = []
        if ok:
            got = got[cols].sort_values(cols).reset_index(drop=True)
            want = want[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                g, w = got[c].to_numpy(), want[c].to_numpy()
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    ga, wa = g.astype("float64"), w.astype("float64")
                    eq = bool(((ga == wa) | (np.isnan(ga) & np.isnan(wa))).all())
                else:
                    eq = list(map(str, g)) == list(map(str, w))
                if not eq:
                    bad_cols.append(c)
            ok = not bad_cols
        if ok:
            n_pass += 1
            print(f"OK   {name}: {len(got)} rows bit-exact [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL {name}: cols={bad_cols or 'shape/schema'}")
    print(f"\n{n_pass} bit-exact, {n_fail} failed")
    spark.stop()


if __name__ == "__main__":
    main()
