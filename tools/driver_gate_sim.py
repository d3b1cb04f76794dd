"""Driver-gate simulation: replay the per-round CORRECTNESS check
locally, exactly as the driver runs it.

- VANILLA SparkSession (not redmap_spark.session.get_spark), so the
  Catalog's self-defensive confs are exercised — the driver does the
  same.
- The FIRST 50 ``queries()`` entries from ``__spark_entry__`` (the
  driver's window), each compared against its ``oracle_sql()`` in
  DuckDB at sf0.01: row count, sorted column names, and an
  order-insensitive value hash over stringified cells.

Run:  python tools/driver_gate_sim.py          # prints one line per entry + a summary
      SPARK_GRAFT_GATE_SF_DIR=/root/testdata/sf0.1 python tools/driver_gate_sim.py   # cross-SF replay
      python tools/driver_gate_sim.py q_ewma   # restrict to named entries
      python tools/driver_gate_sim.py --all --out CORRECTNESS_full_r07.json
          # sweep EVERY oracle entry (not just the first-50 window) and
          # write a CORRECTNESS_r{N}-format JSON artifact
"""

from __future__ import annotations

import hashlib
import importlib.util
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: str(v))
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False).encode("utf-8")
    ).hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    argv = sys.argv[1:]
    sweep_all = "--all" in argv
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            raise SystemExit("--out requires a path argument")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = {a for a in argv if a != "--all"}
    unknown = only - set(queries)
    if unknown:
        raise SystemExit(f"not in queries(): {sorted(unknown)}")
    if sweep_all:
        window = [n for n in queries if n in oracles and (not only or n in only)]
    else:
        outside = sorted(only & set(queries) - set(list(queries)[:50]))
        if outside:
            print(
                f"WARNING: outside the driver's first-50 window "
                f"(the real gate will NOT check them): {outside}"
            )
        window = [n for n in list(queries)[:50] if not only or n in only]
    if only and not window:
        raise SystemExit(
            "no requested entry is inside the driver window; nothing checked"
        )

    ok = bad = 0
    results: dict[str, dict] = {}
    for name in window:
        try:
            got = queries[name](spark, SF_DIR).toPandas()
            want = con.execute(oracles[name]).df()
            rows = len(got) == len(want)
            schema = sorted(got.columns) == sorted(want.columns)
            hashes = value_hash(got) == value_hash(want)
            good = rows and schema and hashes
            results[name] = {
                "rows_match": rows, "schema_match": schema,
                "hash_match": hashes, "spark_rows": len(got),
                "oracle_rows": len(want), "err": None,
            }
        except Exception as exc:  # noqa: BLE001 — report, keep going
            print(f"FAIL {name}: {exc}", flush=True)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(exc)[:500],
            }
            bad += 1
            continue
        print(
            f"{'ok  ' if good else 'FAIL'} {name}: rows={rows} "
            f"schema={schema} hash={hashes} ({len(got)} rows)",
            flush=True,
        )
        ok += good
        bad += not good
    print(f"== {ok} ok / {bad} fail over {len(window)} window entries ==")
    if out_path:
        import json

        Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
        print(f"wrote {out_path} ({len(results)} entries)")
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
