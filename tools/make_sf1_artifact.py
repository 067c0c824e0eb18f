#!/usr/bin/env python
"""Post-process the raw sf1 full-registry sweep into CORRECTNESS_SF1.json.

The r09 verdict (#3) asks for the sf1 oracle signal FROZEN with a loud,
per-query exclusion list instead of silent caps.  This tool enforces the
documentation discipline mechanically:

* every green row passes through (hash-verified at sf1, or rows-only for
  the queries that never had a SQL oracle — same weaker flag the driver
  records),
* every excluded query (watchdog timeout or a known sf-variant contract)
  MUST have a curated justification in EXCLUSION_REASONS below — an
  unexplained timeout/mismatch fails this tool, so nothing can fall out
  of the artifact silently,
* the summary block records counts so a consumer needn't diff registries.

Usage: python tools/make_sf1_artifact.py RAW_JSON [--out CORRECTNESS_SF1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Curated per-query exclusion justifications.  A query may appear here only
# with a reason a reviewer can check; the tool cross-checks that every
# non-green row is listed and that every listed row is actually non-green
# (a stale entry for a now-green query also fails).
EXCLUSION_REASONS: dict[str, str] = {
    # dedup_jaccard_prefix: exclusion RETIRED in r12 — the oracle is now a
    # gated dual chain (brute force below 20k docs, int-id AllPairs replay
    # above) and hash-verifies the full 250,500-pair result at sf1.
    "geo_neighbor_pairs": (
        "oracle timeout (600s watchdog): oracle is the brute-force a<b "
        "customer self cross join with haversine (geo.py:383) — ~1.1e10 "
        "pair evaluations at sf1's 150k customers, by design quadratic as "
        "the cell-blocking losslessness proof.  Spark's 8-degree "
        "cell-blocked join completed: 10,241,882 pairs.  Proof holds at "
        "sf0.001/sf0.01 (274 pairs, non-vacuous per r08)."
        "r11: `geo_neighbor_pairs_sf_audit` (green row in this artifact) restricts the REAL full-corpus cell-blocked join to md5-bucket-sampled endpoints and brute-forces exactly those — positive sampled losslessness signal at sf1."
    ),
    "sim_search_graph_beam": (
        "oracle infeasible at sf1 (r11: exhausts the 48GB-capped DuckDB's "
        "spill disk mid-join; pre-cap r10 run hit the 600s watchdog — "
        "same deliberate-quadratic class): the oracle unrolls the ENTIRE "
        "graph-ANN pipeline — kNN-graph build (10M scored shared-cell "
        "pairs at sf1 even after the score-once-and-mirror halving, each "
        "a 64-dim list-lambda cosine) plus 3 beam-hop CTEs re-referencing "
        "the materialized graph — into one DuckDB query for auditability. "
        "The Spark side completed (200 rows = 20 queries x top-10).  The "
        "contract is hash-proven at sf0.001/0.01/0.1 and the 0.90 recall "
        "floor is pinned in tests/test_llm_ops.py."
        "r11: `sim_search_graph_beam_sf_audit` (green row in this artifact) runs the identical graph-ANN pipeline on a stride+renumber sample of the sf1 corpus where the exhaustive oracle is feasible."
    ),
    "geo_neighbor_pairs_salted": (
        "excluded from the sf1 sweep by invocation (r14, via driver_sim "
        "--exclude): the row is OUTPUT-BOUND, not plan-bound — the salted "
        "join itself is sf1-fast (the identical join/salting machinery "
        "completes inside `geo_neighbor_pairs_fold` in ~20s engine-side "
        "at 32 threads), but this row's contract materializes and "
        "value-hashes all 317,372,856 result rows on BOTH engines, which "
        "is sweep cost with no added signal.  `geo_neighbor_pairs_fold` "
        "(green row in this artifact) runs the SAME salted cell-blocked "
        "pair stream and collapses it per cell into an exact "
        "count + 2^31-split multiplicative fold that any lost, duplicated "
        "or perturbed pair must move — the pair-multiset check without "
        "the materialization.  Full-pair contract stays hash-proven at "
        "sf0.001/0.01/0.1 (brute-force oracle)."
    ),
    "sim_search_recall_graph": (
        "oracle timeout (600s watchdog; the uncapped r10 run instead OOMed "
        "DuckDB at ~100 GiB): nests the full "
        "sim_search_graph_beam oracle (see its exclusion) AND the "
        "brute-force oracle as CTEs.  The Spark side completed (1 recall "
        "row); hash-proven at sf0.001/0.01/0.1 with measured recall "
        "0.990/0.995/0.955 and the pytest-pinned 0.90 floor."
        "r11: `sim_search_recall_graph_sf_audit` (green row in this artifact) is the sampled twin with the exhaustive oracle feasible."
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("raw")
    ap.add_argument("--out", default=os.path.join(REPO, "CORRECTNESS_SF1.json"))
    ap.add_argument(
        "--sf-dir", default="/tmp/sf1", help="recorded provenance only"
    )
    ap.add_argument(
        "--note",
        default=None,
        help="free-form provenance note recorded in the payload (e.g. "
        "which rows were re-run and merged, and why)",
    )
    args = ap.parse_args()

    with open(args.raw) as f:
        raw: dict[str, dict] = json.load(f)

    results: dict[str, dict] = {}
    excluded: dict[str, dict] = {}
    problems: list[str] = []
    for name, rec in raw.items():
        green = (
            rec.get("hash_match") is True
            or (rec.get("oracle") is False and rec.get("rows_match") is True)
        )
        if green:
            results[name] = rec
            if name in EXCLUSION_REASONS:
                problems.append(
                    f"{name}: listed in EXCLUSION_REASONS but GREEN at sf1 — "
                    "remove the stale exclusion"
                )
        elif name in EXCLUSION_REASONS:
            excluded[name] = {**rec, "why_excluded": EXCLUSION_REASONS[name]}
        else:
            problems.append(
                f"{name}: NOT green at sf1 and NOT justified "
                f"(err={rec.get('err')!r} rows={rec.get('spark_rows')}/"
                f"{rec.get('oracle_rows')}) — triage it: fix the query or "
                "add a reviewed reason to EXCLUSION_REASONS"
            )
    if problems:
        print("REFUSING to write the artifact:", file=sys.stderr)
        for p in problems:
            print("  " + p, file=sys.stderr)
        return 1

    oracle_green = sum(1 for r in results.values() if r.get("hash_match"))
    payload = {
        "sf_dir": args.sf_dir,
        "fixture": "tools/gen_sf1.py — key-shift 10x replication of sf0.1 "
        "(per-key fanout/selectivity preserved; doc text gets per-copy "
        "suffix markers)",
        "sweep": "tools/driver_sim.py --sf-dir /tmp/sf1 --driver-mem 32g "
        "--timeout 600 --artifact",
        **({"note": args.note} if args.note else {}),
        "summary": {
            "registry": len(raw),
            "green": len(results),
            "oracle_hash_green": oracle_green,
            "rows_only_green": len(results) - oracle_green,
            "excluded": len(excluded),
        },
        "results": results,
        "exclusions": excluded,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        f"wrote {args.out}: {len(results)} green "
        f"({oracle_green} hash-verified), {len(excluded)} excluded"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
