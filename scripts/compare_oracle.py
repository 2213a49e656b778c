#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

For every query in ``__spark_entry__.queries()``: run the Spark plan and the
DuckDB oracle at the given sf, compare row count, column names/order
(sorted), and values (order-insensitive).  Exit non-zero on any mismatch.

Usage: python scripts/compare_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json OUT.json`` additionally writes a per-query result artifact
(the committed ORACLE_SWEEP_r{N}.json — makes the full registry
auditable without a re-run).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "M":
            # unify datetime unit: ns-vs-us frames with NaT fail
            # assert_frame_equal even when values are identical
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from vector_search_engine_spark.session import get_spark

    spark = get_spark("compare_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # keep sweeping; the artifact records it
            failures.append((name, f"ERROR {e}"))
            print(f"  {name}: ERROR — {e}")
            report[name] = {"mode": "error", "err": str(e)[:500]}
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only check — {len(sdf)} rows ({spark_s:.1f}s)")
            report[name] = {
                "mode": "rows_only",
                "spark_rows": len(sdf),
                "ok": len(sdf) > 0,
                "spark_sec": round(spark_s, 2),
            }
            if len(sdf) == 0:
                failures.append((name, "zero rows (rows-only query)"))
            continue
        odf = con.sql(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        status = []
        if len(a) != len(b):
            status.append(f"ROWS {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"COLS {list(a.columns)} vs {list(b.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
            except AssertionError as e:
                status.append("VALUES: " + str(e).split("\n")[0])
                # show a sample diff
                neq = (a.values != b.values).any(axis=1)
                print(a[neq].head(3))
                print(b[neq].head(3))
        report[name] = {
            "mode": "oracle",
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "ok": not status,
            "spark_sec": round(spark_s, 2),
            **({"err": "; ".join(status)} if status else {}),
        }
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name}: FAIL — {'; '.join(status)}")
        else:
            print(f"  {name}: OK ({len(a)} rows, spark {spark_s:.1f}s)")

    if json_out:
        import json as _json

        n_ok = sum(1 for r in report.values() if r.get("ok"))
        artifact = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_ok": n_ok,
            "n_fail": len(report) - n_ok,
            "queries": report,
        }
        with open(json_out, "w") as f:
            _json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {n_ok}/{len(report)} ok")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, s in failures:
            print(f"  {n}: {s}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
