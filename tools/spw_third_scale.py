"""Third-scale-point sweep for the SinglePartition-window bound
(r10 verdict item 5).

The r10 round proved each new scale decade can expose data-scaled
singleton frames the smaller gate can't see (sf0.1 caught ten
dimension-scaled entries that sf0.01 passed). This tool manufactures
the NEXT decade-ish point — an "sf0.4" scratch built by replicating
every sf0.1 table x4 with per-replica key shifts that keep foreign
keys consistent (replica i customers join replica i orders, etc.) —
then executes every PLANS.md SinglePartition+Window entry against it
and reports the max rows crossing any singleton exchange.

Pass criterion: the same ABSOLUTE bound as the gate test (6000).
Frames fed by legitimate domain grids (calendars, price/value
domains, parameter rows) are SF-independent by construction, so they
must NOT grow when the dimension tables quadruple (customer 15k->60k,
part 20k->80k rows vs sf0.1); anything that grows with the x4 is a
100TB OOM shape by definition.

Usage:
    python tools/spw_third_scale.py [--entries a,b,c] [--keep]
Writes one JSON line: {"scale": "sf0.1x4", "worst": {entry: rows},
"offenders": {...}, "bound": 6000}.
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from redmap_spark.inventory import QUERIES  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402
from tools.sp_window_audit import singleton_exchange_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = Path("/tmp/spw_x4")
BOUND = 6000
FACTOR = 4
SHIFT = 100_000_000

# Per-table key columns to shift per replica — FK-consistent: every
# key column keeps the SAME shift on both sides of its joins.
TABLE_KEYS: dict[str, list[str]] = {
    "region": [],  # 5 rows — shared across replicas, like nation
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TEXT_TAG = {"documents": "text"}


def build_scratch(spark) -> None:
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    SCRATCH.mkdir(parents=True)
    for table, keys in TABLE_KEYS.items():
        base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        if not keys:
            out = base
        else:
            parts = []
            for i in range(FACTOR):
                shifted = base
                for c in keys:
                    shifted = shifted.withColumn(c, F.col(c) + F.lit(i * SHIFT))
                tag = TEXT_TAG.get(table)
                if tag is not None and i > 0:
                    shifted = shifted.withColumn(
                        tag, F.concat(F.col(tag), F.lit(f" replica{i}"))
                    )
                parts.append(shifted)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(str(SCRATCH / f"{table}.parquet"))
        print(f"built {table}", file=sys.stderr)


def flagged_entries() -> list[str]:
    """The PLANS.md (win, sp) set — same selection as the gate test."""
    out = []
    for line in (REPO / "PLANS.md").read_text().splitlines():
        m = re.match(
            r"\| (\w+) \| \d+ \| \d+ \| \d+ \| \d+ \| \d+ \| \d+ "
            r"\| (\d+) \| \d+ \| \d+ \| (\d+) \|",
            line,
        )
        if m and int(m.group(2)) and int(m.group(3)) and m.group(1) in QUERIES:
            out.append(m.group(1))
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default=None,
                    help="comma-separated subset (default: all flagged)")
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing scratch dir")
    args = ap.parse_args()

    spark = get_spark("spw-third-scale")
    if not (args.keep and SCRATCH.exists()):
        build_scratch(spark)

    names = (
        args.entries.split(",") if args.entries else flagged_entries()
    )
    worst: dict[str, int] = {}
    errs: dict[str, str] = {}
    for i, name in enumerate(names):
        try:
            rows = singleton_exchange_rows(QUERIES[name](spark, str(SCRATCH)))
            worst[name] = max(rows, default=0)
        except Exception as e:  # noqa: BLE001 — report, don't die mid-sweep
            errs[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"[{i + 1}/{len(names)}] {name}: "
              f"{worst.get(name, errs.get(name))}", file=sys.stderr)
    offenders = {k: v for k, v in worst.items() if v > BOUND}
    print(json.dumps({
        "scale": "sf0.1x4", "bound": BOUND,
        "n": len(names), "n_err": len(errs),
        "max_frame": max(worst.values(), default=0),
        "offenders": offenders, "errors": errs,
        "worst_top20": dict(sorted(worst.items(), key=lambda kv: -kv[1])[:20]),
    }, sort_keys=True))


if __name__ == "__main__":
    main()
