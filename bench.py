"""Benchmark: run every inventory query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query is timed end-to-end (plan + full execution into the
`noop` sink — the standard Spark benchmarking sink: every operator
runs, results are fully materialized executor-side, but driver-side
row serialization (irrelevant to engine throughput; a real pipeline
writes parquet) is excluded). A warmup no-op runs first so
JVM/session startup isn't attributed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from redmap_spark.inventory import QUERIES  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    spark = get_spark("redmap-spark-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "inventory_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
