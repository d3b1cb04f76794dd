"""SinglePartition-window audit: for every inventory entry whose
physical plan has a SinglePartition shuffle exchange co-occurring with
a Window node, EXECUTE the query at sf0.01 and record how many rows
actually flowed into each singleton exchange (shuffleRecordsWritten on
the final AQE plan).

This turns the PLANS.md claim — "each singleton window operates on a
bounded pre-aggregated grid, not fact rows" (the q_eta_promise r7 OOM
shape) — into a measured number per entry. tests/test_plans.py
enforces the resulting bound; this script exists to (re)calibrate it.

Run:  python tools/sp_window_audit.py            # all flagged entries
      python tools/sp_window_audit.py q_gmm_em   # named entries only
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from redmap_spark.inventory import QUERIES  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def singleton_exchange_rows(df) -> list[int]:
    """Execute df and return shuffleRecordsWritten for every
    SinglePartition shuffle exchange in the final (post-AQE) physical
    plan, deduplicated (reused exchanges count once)."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    out: list[int] = []
    seen: set[int] = set()

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
        if cls == "ReusedExchangeExec":
            walk(node.child())
        if cls == "InMemoryTableScanExec":
            try:
                walk(node.relation().cachedPlan())
            except Exception:  # noqa: BLE001 — best-effort descent
                pass
        if (
            cls == "ShuffleExchangeExec"
            and node.outputPartitioning().toString() == "SinglePartition"
        ):
            oid = node.hashCode()
            if oid not in seen:
                seen.add(oid)
                m = node.metrics()
                if m.contains("shuffleRecordsWritten"):
                    out.append(m.apply("shuffleRecordsWritten").value())
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:  # noqa: BLE001
            pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(root)
    return out


def flagged_entries(spark) -> list[str]:
    """Entries whose static plan shows SinglePartition + Window."""
    names = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:  # noqa: BLE001
            continue
        nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
        has_win = any(n in ("Window", "WindowGroupLimit") for n in nodes)
        if has_win and "Arguments: SinglePartition" in plan:
            names.append(name)
    return names


def main() -> None:
    spark = get_spark("sp-window-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or flagged_entries(spark)
    results: dict[str, list[int]] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            results[name] = singleton_exchange_rows(QUERIES[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — audit must not abort
            errors[name] = repr(e)[:120]
        print(name, results.get(name, errors.get(name)), flush=True)
    worst = {n: max(v) for n, v in results.items() if v}
    print(json.dumps({
        "flagged": len(names),
        "errors": errors,
        "max_rows": dict(sorted(worst.items(), key=lambda kv: -kv[1])[:20]),
    }, indent=2))


if __name__ == "__main__":
    main()
