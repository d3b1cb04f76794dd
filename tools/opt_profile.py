"""Optimization-round profiling harness (r11).

Times named inventory entries with the bench methodology (noop sink,
min-of-N) and optionally dumps ``explain("formatted")`` to
``plans/$REDMAP_PLANS_ROUND/<entry>_{before,after}.txt`` (default r12).

Run:
  python tools/opt_profile.py NAME [NAME ...]        # min-of-3 each
  python tools/opt_profile.py --plans before NAME... # also dump plans
  python tools/opt_profile.py --reps 5 NAME...
  python tools/opt_profile.py --ab NAME              # interleaved A/B:
        requires REDMAP_AB=module:callable pointing at the B variant.

Timing is end-to-end per the bench contract: plan construction
(QUERIES[name](spark, sf_dir)) plus full noop materialization.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from redmap_spark.inventory import QUERIES  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402


def time_entry(spark, name, sf_dir, reps):
    fn = QUERIES[name]
    best = float("inf")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times.append(round(dt, 3))
        best = min(best, dt)
    return round(best, 3), times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", choices=["before", "after"], default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("opt-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    out = {}
    for name in args.names:
        if name not in QUERIES:
            print(f"!! unknown entry {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        best, times = time_entry(spark, name, args.sf_dir, args.reps)
        out[name] = best
        print(f"{best:8.3f}  {name}  (runs: {times})", flush=True)
        if args.plans:
            pdir = REPO / "plans" / os.environ.get("REDMAP_PLANS_ROUND", "r12")
            pdir.mkdir(parents=True, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (pdir / f"{name}_{args.plans}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
