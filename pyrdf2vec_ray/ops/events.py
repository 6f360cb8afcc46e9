"""Windowed aggregation over the `events` stream table.

Ray Data has no event-time windows (ray_guide.md "Streaming-shaped
workloads"): tumbling windows are expressed as a grouped aggregate on
(key, window_start) — partial per-batch combine, then one shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def tumbling_window(
    events: ray.data.Dataset, freq: str = "h"
) -> ray.data.Dataset:
    """(user_id, window_start, n_events, sum_value): per-user tumbling
    window of `freq`; pre-aggregated inside map_batches before the
    groupby shuffle."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["user_id", "ts", "value"]].copy()
        batch["window_start"] = batch["ts"].dt.floor(freq)
        g = (
            batch.groupby(["user_id", "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby(["user_id", "window_start"]).sum(["n_events", "sum_value"])

    def rename(batch: pa.Table) -> pa.Table:
        m = {"sum(n_events)": "n_events", "sum(sum_value)": "sum_value"}
        return batch.rename_columns([m.get(c, c) for c in batch.column_names])

    return out.map_batches(rename, batch_format="pyarrow")


def sessionize(
    events: ray.data.Dataset, gap_minutes: int = 30
) -> ray.data.Dataset:
    """Session windows per user: sort by ts within the user group, break a
    session when the gap exceeds `gap_minutes` (groupby(key).map_groups —
    the documented partitioning assumption: one user's events fit one
    group)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap).cumsum()
        agg = g.groupby(new_session).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        agg["user_id"] = g["user_id"].iloc[0]
        return agg.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events"]
        ]

    return events.groupby("user_id").map_groups(sessions, batch_format="pandas")
