"""grouped_mode and events.debounce: hand-computable fixtures pinning
the deterministic mode tie-break and the lag-debounce keep rule."""
from __future__ import annotations

import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.agg import grouped_mode
from pyrdf2vec_ray.ops.events import debounce


def test_mode_counts_and_tie_break():
    df = pd.DataFrame({"g": list("aaaabbbb"),
                       "v": [3, 3, 5, 5, 7, 9, 9, 7]})
    out = grouped_mode(ray.data.from_pandas(df), "g", "v").to_pandas()
    got = {r.g: (r.mode, r.n) for r in out.itertuples()}
    # a: 3 and 5 tie at 2 -> smaller value wins; b: 7/9 tie -> 7
    assert got == {"a": (3, 2), "b": (7, 2)}


def test_mode_multibatch_counts_merge():
    df = pd.DataFrame({"g": ["x"] * 6, "v": [1, 2, 2, 1, 2, 3]})
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:].reset_index(drop=True)])
    out = grouped_mode(ds, "g", "v").to_pandas()
    assert out["mode"].tolist() == [2] and out["n"].tolist() == [3]


def _ev(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["user_id", "event_type", "event_id", "ts"]))


def test_debounce_lag_rule():
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    s = pd.Timedelta(seconds=1)
    ev = _ev([
        (1, "click", 1, t0),
        (1, "click", 2, t0 + 5 * s),    # 5s after #1 -> dropped
        (1, "click", 3, t0 + 65 * s),   # 60s after #2 -> kept (lag rule)
        (1, "view", 4, t0 + 1 * s),     # other type: first -> kept
        (2, "click", 5, t0 + 2 * s),    # other user: first -> kept
    ])
    out = debounce(ev, min_gap_s=60).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 4, 5]


def test_debounce_boundary_inclusive_and_ts_tie():
    t0 = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    ev = _ev([
        (1, "a", 10, t0),
        (1, "a", 11, t0 + 60 * s),  # exactly the gap -> kept (>=)
        (1, "a", 12, t0 + 60 * s),  # same ts, higher id -> 0s gap, drop
    ])
    out = debounce(ev, min_gap_s=60).to_pandas()
    assert sorted(out["event_id"]) == [10, 11]
