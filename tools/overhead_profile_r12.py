"""Item-7 (VERDICT r11) decomposition: what does the fixed per-entry
overhead of a bench sweep consist of, at N=565?

Measures, in one warm session:
  1. noop floor        — spark.range(1) -> noop write, min/mean of N
  2. hygiene RPC       — spark.catalog.clearCache() on an EMPTY cache
  3. hygiene w/ cache  — clearCache() right after a tiny .cache().count()
  4. catalog conf.set  — the two conf.set calls Catalog.__init__ makes
  5. catalog table()   — memoized relation lookup (warm path)
  6. plan build only   — QUERIES[name](spark, sf_dir) WITHOUT an action,
                         for a few representative entries
  7. full entry        — build + noop for the same entries (bench shape)

Run AFTER any concurrent load has drained; numbers are same-session
relative only (memory: fresh-JVM numbers carry +20-50% bias).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from redmap_spark.catalog import Catalog  # noqa: E402
from redmap_spark.inventory import QUERIES  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N", "50"))


def bench(label, fn, n=N):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:28s} min {ts[0]*1e3:8.2f} ms   med {ts[n//2]*1e3:8.2f} ms"
          f"   mean {sum(ts)/n*1e3:8.2f} ms", flush=True)
    return ts[0]


def main():
    spark = get_spark("overhead-profile-r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    one = spark.range(1)
    bench("noop write (range 1)", lambda: one.write.format("noop")
          .mode("overwrite").save())
    bench("clearCache (empty)", lambda: spark.catalog.clearCache())

    def with_cache():
        df = spark.range(10).cache()
        df.count()
        spark.catalog.clearCache()
    bench("cache+count+clearCache", with_cache, n=20)

    bench("conf.set x2 (Catalog init)", lambda: (
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"),
        spark.conf.set("spark.sql.session.timeZone", "UTC")))
    cat = Catalog(spark, SF_DIR)
    cat.table("lineitem")  # prime the memo
    bench("Catalog() + table() warm", lambda: Catalog(spark, SF_DIR)
          .table("lineitem"))

    for name in ("q_brand_switching", "mr_pagerank", "dedup_exact",
                 "q21_sole_returner"):
        fn = QUERIES[name]
        bench(f"build-only {name}", lambda f=fn: f(spark, SF_DIR), n=10)
        bench(f"build+noop {name}", lambda f=fn: f(spark, SF_DIR)
              .write.format("noop").mode("overwrite").save(), n=5)


if __name__ == "__main__":
    main()
