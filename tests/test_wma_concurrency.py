"""wma_daily and peak_concurrency: hand-computable fixtures pinning
the dyadic-weight algebra, observation indexing, closed-interval sweep
semantics and midnight clipping."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.events import peak_concurrency, wma_daily

T0 = pd.Timestamp("2026-03-01 00:00:00")
DAY = pd.Timedelta(days=1)
H = pd.Timedelta(hours=1)


def test_wma_dyadic_weights_and_warmup():
    # type 'a': counts 1, 3, 5 on three consecutive days
    rows = ([("a", T0)] * 1 + [("a", T0 + DAY)] * 3
            + [("a", T0 + 2 * DAY)] * 5)
    ev = ray.data.from_pandas(pd.DataFrame(rows, columns=["event_type", "ts"]))
    out = (wma_daily(ev).to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert out["n"].tolist() == [1, 3, 5]
    # day0: 8*1/8; day1: (8*3+4*1)/12; day2: (8*5+4*3+2*1)/14
    assert out["wma"].tolist() == [1.0, 28 / 12, 54 / 14]


def test_wma_observation_indexed_across_gap():
    rows = [("a", T0), ("a", T0 + 5 * DAY), ("a", T0 + 5 * DAY)]
    ev = ray.data.from_pandas(pd.DataFrame(rows, columns=["event_type", "ts"]))
    out = (wma_daily(ev).to_pandas()
           .sort_values("day").reset_index(drop=True))
    # the 5-day gap is one observation step: (8*2 + 4*1) / 12
    assert out["wma"].tolist() == [1.0, 20 / 12]


def _intervals(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["session_start", "session_end"]))


def test_peak_overlap_and_closed_ties():
    out = peak_concurrency(_intervals([
        (T0 + 1 * H, T0 + 3 * H),
        (T0 + 2 * H, T0 + 4 * H),   # overlaps the first -> peak 2
        (T0 + 4 * H, T0 + 5 * H),   # starts AS #2 ends: both active
        (T0 + 8 * H, T0 + 8 * H),   # zero-length still counts
    ])).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_active"] == 4
    assert out.loc[0, "peak"] == 2


def test_peak_midnight_crossing_counts_both_days():
    out = (peak_concurrency(_intervals([
        (T0 + 23 * H, T0 + 26 * H),   # crosses into day 2
        (T0 + 1 * H, T0 + 2 * H),
        (T0 + DAY + 1 * H, T0 + DAY + 2 * H),
    ])).to_pandas().sort_values("day").reset_index(drop=True))
    assert out["n_active"].tolist() == [2, 2]
    assert out["peak"].tolist() == [1, 2]


def test_fill_daily_gaps_densifies_per_key_range():
    from pyrdf2vec_ray.ops.events import fill_daily_gaps

    daily = ray.data.from_pandas(pd.DataFrame(
        {"event_type": ["a", "a", "a", "b"],
         "day": [T0, T0 + 3 * DAY, T0 + 5 * DAY, T0 + 10 * DAY],
         "n": [2, 4, 8, 1]}))
    out = (fill_daily_gaps(daily).to_pandas()
           .sort_values(["event_type", "day"]).reset_index(drop=True))
    a = out[out["event_type"] == "a"]
    # a's range is 6 calendar days; observed 3, filled 3
    assert len(a) == 6
    assert a["n"].tolist() == [2, 0, 0, 4, 0, 8]
    assert a["filled"].tolist() == [False, True, True, False, True,
                                    False]
    # b spans one day, nothing synthesized; its range is its own
    b = out[out["event_type"] == "b"]
    assert len(b) == 1 and not b["filled"].iloc[0]


def test_cusum_recursion_closed_form():
    from pyrdf2vec_ray.ops.events import cusum_scores

    days = [T0 + i * DAY for i in range(6)]
    xs = [5, 5, 9, 20, 5, 30]
    daily = ray.data.from_pandas(pd.DataFrame(
        {"event_type": ["a"] * 6, "day": days, "n": xs}))
    out = (cusum_scores(daily, slack_k=8, threshold_h=10).to_pandas()
           .sort_values("day").reset_index(drop=True))
    # straight-line recursion S_t = max(0, S_{t-1} + x - k)
    ref, s = [], 0
    for x in xs:
        s = max(0, s + x - 8)
        ref.append(s)
    assert out["s"].tolist() == ref
    assert out["alarm"].tolist() == [r > 10 for r in ref]


def test_cusum_keys_independent():
    from pyrdf2vec_ray.ops.events import cusum_scores

    daily = ray.data.from_pandas(pd.DataFrame(
        {"event_type": ["a", "a", "b"],
         "day": [T0, T0 + DAY, T0],
         "n": [100, 1, 100]}))
    out = cusum_scores(daily, slack_k=10, threshold_h=50).to_pandas()
    got = {(r.event_type, r.day): r.s for r in out.itertuples()}
    assert got[("a", T0)] == 90 and got[("a", T0 + DAY)] == 81
    assert got[("b", T0)] == 90  # b's S does not inherit a's


def test_recency_scores_halving():
    from pyrdf2vec_ray.ops.events import recency_scores

    ev = ray.data.from_pandas(pd.DataFrame(
        {"user_id": [1, 1, 2],
         "ts": [T0 + 7 * DAY, T0, T0 + 7 * DAY]}))
    out = (recency_scores(ev, half_life_days=7.0).to_pandas()
           .set_index("user_id").sort_index())
    # user 1: newest event weight 1, 7-day-old weight 0.5
    assert abs(out.loc[1, "score"] - 1.5) < 1e-12
    assert out.loc[1, "n_events"] == 2
    assert abs(out.loc[2, "score"] - 1.0) < 1e-12
