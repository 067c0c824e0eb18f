#!/usr/bin/env python
"""Simulate the DRIVER's verify pass exactly (the /verify recipe, committed).

Differences from tools/gate_sim.py (which uses the engine's own session and
oracle helper): this script reproduces the driver's hostile conditions —

* runs from a NEUTRAL cwd (chdir to /tmp) so cwd-relative imports can't
  mask path bugs and Python-worker pickling by reference fails loudly,
* imports ``__spark_entry__`` the way the driver does,
* builds a PLAIN SparkSession (local[8], UTC, UI off) — not
  flinkexp_spark.session.get_session — so engine-session-only configs
  can't be load-bearing,
* optionally sets a non-UTC host TZ for the DuckDB side (--tz).

Usage:
  python tools/driver_sim.py [--only q1,q2] [--sf-dir DIR] [--tz America/New_York]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True).astype(str)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--tz", default=None, help="DuckDB connection TimeZone")
    args = ap.parse_args()

    os.chdir("/tmp")
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    n_entry = len(e.entry(spark).collect())
    print(f"entry(): {n_entry} rows")

    con = duckdb.connect()
    if args.tz:
        con.execute(f"SET TimeZone='{args.tz}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)
    t0, n_ok = time.time(), 0
    failures: list[str] = []
    for i, name in enumerate(names, 1):
        try:
            s = canon(qs[name](spark, args.sf_dir).toPandas())
            if name not in osql:
                print(f"[{i}/{len(names)}] {name}: rows-only ({len(s)})")
                n_ok += 1
                continue
            o = canon(con.execute(osql[name]).df())
            ok = (
                list(s.columns) == list(o.columns)
                and len(s) == len(o)
                and s.equals(o)
            )
        except Exception as ex:  # noqa: BLE001
            ok = False
            failures.append(f"{name}: ERR {type(ex).__name__}: {ex}")
        if ok:
            n_ok += 1
        else:
            if not failures or not failures[-1].startswith(name):
                failures.append(f"{name}: mismatch")
            print(f"[{i}/{len(names)}] {name}: FAIL")
        if i % 25 == 0:
            print(f"[{i}/{len(names)}] {n_ok} ok, {time.time()-t0:.0f}s")
    print(f"DONE {n_ok}/{len(names)} ok in {time.time()-t0:.0f}s")
    for f in failures:
        print("  " + f[:300])
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
