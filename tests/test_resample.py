"""timeseries_resample_linear semantics against an independent
pure-Python reference (bisect-based interpolation per series)."""

from __future__ import annotations

import bisect
import math
import os

import pytest


def test_engine_matches_bisect_reference(spark) -> None:
    if not os.path.exists("/root/testdata/sf0.01/events.parquet"):
        pytest.skip("sf0.01 events fixture not present")
    from flinkexp_spark.catalog.timeseries import RESAMPLE_USERS
    from flinkexp_spark.registry import queries

    rows = queries()["timeseries_resample_linear"](
        spark, "/root/testdata/sf0.01"
    ).collect()

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(f"user_id < {RESAMPLE_USERS}")
        .select("user_id", "ts", "value")
        .collect()
    )
    series: dict[int, dict[int, int]] = {}
    for r in ev:
        t = int(r["ts"].timestamp())  # UTC session: epoch floor
        v = int(round(r["value"] * 100))
        s = series.setdefault(r["user_id"], {})
        s[t] = min(s.get(t, v), v)  # per-second tie -> MIN, as documented

    expect = {}
    for uid, obs in series.items():
        ts = sorted(obs)
        h0 = -(-ts[0] // 3600)  # ceil division
        h1 = ts[-1] // 3600
        for h in range(h0, h1 + 1):
            g = h * 3600
            i = bisect.bisect_right(ts, g)
            pt = ts[i - 1] if i > 0 else None  # last <= g
            j = bisect.bisect_left(ts, g)
            nt = ts[j] if j < len(ts) else None  # first >= g
            assert pt is not None and nt is not None  # interior grid
            if nt == pt:
                val = obs[pt] * 10000
            else:
                num = (obs[pt] * (nt - g) + obs[nt] * (g - pt)) * 10000.0
                # float division + floor — mirrors both the engine and the
                # oracle (ADVICE r12: the dead integer floor-div line that
                # previously shadowed this misstated the reference math)
                val = math.floor(num / (nt - pt))
            expect[(uid, g)] = val

    got = {(r["user_id"], r["g"]): r["val_x1e6"] for r in rows}
    assert got == expect
    # non-vacuous: a month of hourly grid points across the user slice
    assert len(got) > 1000
