#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS gate with per-query wall timing.

Runs every registered query (registry order — the order the driver sees)
at sf0.01 against the DuckDB oracle and writes
``/tmp/gate_sim_timings.json``:  {name: {"ok": bool, "spark_s": float,
"oracle_s": float, "detail": str}}.

Used to (a) verify all queries fit a driver time budget, (b) find slow
leaders worth optimizing, (c) choose the registration order.

Usage: python tools/gate_sim.py [--sf-dir DIR] [--only name1,name2] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkexp_spark.registry import REGISTRY, queries  # noqa: E402
from flinkexp_spark.session import get_session  # noqa: E402
from flinkexp_spark.testing import oracle  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="/tmp/gate_sim_timings.json")
    args = ap.parse_args()

    queries()  # force registration
    spark = get_session(app_name="gate_sim")
    con = oracle.duck_connection(args.sf_dir)
    names = list(REGISTRY)
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    results: dict[str, dict] = {}
    t_start = time.monotonic()
    for i, name in enumerate(names):
        timings: dict = {"spark_s": 0.0, "oracle_s": 0.0}
        try:
            # the ONE comparison pipeline (testing/oracle.compare_query) —
            # same verdict logic as the test path, by construction
            res = oracle.compare_query(spark, con, name, args.sf_dir, timings)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"ERR {type(e).__name__}: {e}"
        results[name] = {
            "ok": ok,
            "spark_s": timings["spark_s"],
            "oracle_s": timings["oracle_s"],
            "detail": detail[:200],
        }
        cum = time.monotonic() - t_start
        print(
            f"[{i + 1}/{len(names)}] {name}: {'OK' if ok else 'FAIL'} "
            f"spark={timings['spark_s']:.2f}s oracle={timings['oracle_s']:.2f}s "
            f"cum={cum:.1f}s",
            flush=True,
        )
        if not ok:
            print(f"    {detail[:300]}", flush=True)

    total = time.monotonic() - t_start
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{n_ok}/{len(results)} ok, total {total:.1f}s")
    slow = sorted(results.items(), key=lambda kv: -(kv[1]["spark_s"] + kv[1]["oracle_s"]))[:15]
    print("slowest:")
    for name, r in slow:
        print(f"  {name}: spark={r['spark_s']}s oracle={r['oracle_s']}s")
    with open(args.out, "w") as f:
        json.dump({"total_s": round(total, 1), "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
