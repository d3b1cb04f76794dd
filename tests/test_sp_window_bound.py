"""The PLANS.md SinglePartition-window claim, as a measured test
(r8 verdict item 5): every inventory plan that funnels rows through a
SinglePartition shuffle exchange next to a Window must feed it a
BOUNDED frame — a calendar/day grid, a value-domain grid, a parameter
row — never fact-scale rows (the q_eta_promise r7 OOM shape, where a
59k-row-at-sf0.01 frame becomes 590M rows in one executor at SF100).

The flagged set comes from PLANS.md's per-entry (win, sp) columns —
kept fresh by the staleness guard below — and each flagged entry is
EXECUTED at sf0.01 so the assertion is on the rows that actually
crossed the exchange (shuffleRecordsWritten on the final AQE plan),
not on plan shape alone.

Bound rationale: the largest legitimate frames are SF-INDEPENDENT
domains — the |days| calendar (~2400), the order-to-ship delay domain
(~4700) — while the smallest fact-scale funnel at sf0.01 is orders
(15000). 6000 separates the two with margin on both sides. An entry
that trips this either needs its grid collapsed to the window's own
keys (q_eta_promise shape) or the two-phase prefix sum/rank in
redmap_spark/plans/prefix.py (q_mus_sampling / q_gmm_em shape).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from redmap_spark.inventory import QUERIES  # noqa: E402

# Default gate runs at sf0.01; the bound is SF-INDEPENDENT for
# legitimate domain grids by construction, so once per round the same
# test is run at sf0.1 (SPARK_GRAFT_SPW_SF_DIR=/root/testdata/sf0.1)
# to prove it — the 100x-scale invariant, measured (PERF.md #89).
import os

SF_DIR = os.environ.get("SPARK_GRAFT_SPW_SF_DIR", "/root/testdata/sf0.01")
BOUND = 6000


def _plans_table() -> dict[str, tuple[int, int]]:
    """entry -> (win, sp) from PLANS.md's full table."""
    out: dict[str, tuple[int, int]] = {}
    for line in (REPO / "PLANS.md").read_text().splitlines():
        m = re.match(
            r"\| (\w+) \| \d+ \| \d+ \| \d+ \| \d+ \| \d+ \| \d+ "
            r"\| (\d+) \| \d+ \| \d+ \| (\d+) \|",
            line,
        )
        if m:
            out[m.group(1)] = (int(m.group(2)), int(m.group(3)))
    return out


def test_singleton_window_frames_are_grid_bounded(spark):
    table = _plans_table()
    # Staleness guard: PLANS.md must cover the current inventory —
    # regenerate with `python tools/plan_audit.py` after adding or
    # renaming entries, or new entries would dodge this invariant.
    missing = sorted(set(QUERIES) - set(table))
    assert not missing, (
        f"PLANS.md is stale — {len(missing)} inventory entries absent "
        f"(first: {missing[:5]}). Run: python tools/plan_audit.py"
    )

    from tools.sp_window_audit import singleton_exchange_rows

    flagged = sorted(n for n, (win, sp) in table.items()
                     if win and sp and n in QUERIES)
    assert flagged, "expected a non-empty SinglePartition+Window set"
    offenders: dict[str, int] = {}
    for name in flagged:
        rows = singleton_exchange_rows(QUERIES[name](spark, SF_DIR))
        worst = max(rows, default=0)
        if worst > BOUND:
            offenders[name] = worst
    assert not offenders, (
        f"fact-scale rows crossed a SinglePartition exchange feeding a "
        f"Window (sf0.01, bound {BOUND}): {offenders}. Collapse the "
        "grid to the window's keys, or use plans/prefix.py's "
        "two-phase prefix sum / row_number."
    )
