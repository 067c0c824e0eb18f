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
    ap.add_argument(
        "--driver-mem",
        default=None,
        help="spark.driver.memory for the plain session (the 1g default "
        "OOMs at sf1 — the r10 sweep used 32g)",
    )
    ap.add_argument(
        "--timeout",
        type=float,
        default=0,
        help="per-query watchdog seconds (0 = off): on expiry Spark jobs "
        "are cancelled and the DuckDB query interrupted, the query is "
        "recorded as err='timeout' and the sweep continues — the loud "
        "exclusion mechanism for deliberately-quadratic oracles at sf1",
    )
    ap.add_argument(
        "--artifact",
        default=None,
        help="write a CORRECTNESS_FULL.json-style artifact (driver row "
        "schema: rows/schema/hash_match, spark/oracle_rows, err) here",
    )
    args = ap.parse_args()

    os.chdir("/tmp")
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
    )
    if args.driver_mem:
        builder = builder.config("spark.driver.memory", args.driver_mem)
    spark = builder.getOrCreate()
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
    records: dict[str, dict] = {}

    import threading

    class _Watchdog:
        """Cancel Spark jobs + interrupt DuckDB if a query overruns."""

        def __init__(self, seconds: float):
            self.seconds = seconds
            self.fired = False
            self._timer = None

        def _fire(self):
            self.fired = True
            try:
                spark.sparkContext.cancelAllJobs()
            except Exception:
                pass
            try:
                con.interrupt()
            except Exception:
                pass

        def __enter__(self):
            if self.seconds:
                self._timer = threading.Timer(self.seconds, self._fire)
                self._timer.daemon = True
                self._timer.start()
            return self

        def __exit__(self, *exc):
            if self._timer:
                self._timer.cancel()

    for i, name in enumerate(names, 1):
        rec = {
            "oracle": True,
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        q_t0 = time.time()
        try:
          with _Watchdog(args.timeout) as wd:
            s = canon(qs[name](spark, args.sf_dir).toPandas())
            rec["spark_rows"] = len(s)
            if name not in osql:
                # Rows-only query (no DuckDB oracle): the driver records a
                # weaker ran-and-produced-rows check.  Mark it explicitly
                # instead of faking green match flags (ADVICE r08) so an
                # artifact consumer cannot overcount oracle-verified rows.
                print(f"[{i}/{len(names)}] {name}: rows-only ({len(s)})")
                rec.update(
                    oracle=False,
                    rows_match=True,
                    schema_match=None,
                    hash_match=None,
                    oracle_rows=None,
                    err=None,
                )
                records[name] = rec
                n_ok += 1
                continue
            o = canon(con.execute(osql[name]).df())
            rec["oracle_rows"] = len(o)
            rec["rows_match"] = len(s) == len(o)
            rec["schema_match"] = list(s.columns) == list(o.columns)
            rec["hash_match"] = (
                rec["rows_match"] and rec["schema_match"] and s.equals(o)
            )
            ok = rec["hash_match"]
        except Exception as ex:  # noqa: BLE001
            ok = False
            if args.timeout and wd.fired:
                rec["err"] = f"timeout: cancelled after {args.timeout:.0f}s"
                failures.append(f"{name}: TIMEOUT {args.timeout:.0f}s")
            else:
                rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
                failures.append(f"{name}: ERR {type(ex).__name__}: {ex}")
        rec["secs"] = round(time.time() - q_t0, 2)
        records[name] = rec
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
    if args.artifact:
        import json

        with open(args.artifact, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=False)
            fh.write("\n")
        print(f"wrote {args.artifact} ({len(records)} rows)")
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
