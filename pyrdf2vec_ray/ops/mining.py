"""Association-rule mining over (basket, item) tables.

The market-basket staple the relational side of a data engine is asked
for (recommendations, co-occurrence features): for every unordered item
pair appearing in at least ``min_support`` baskets, support, confidence
and lift.  The reference engine has no analog — its co-occurrence
notion is the graph walk; this is the set-pair form over transactional
data (same family as the entity co-mention graph,
pipelines/construct.comention_edges, whose pair-generation shape it
reuses).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

__all__ = ["basket_lift"]


def basket_lift(
    rows: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> ray.data.Dataset:
    """(item_a, item_b, n_ab, lift, confidence): for unordered item
    pairs co-occurring in >= ``min_support`` baskets —
    ``lift = (n_ab * N) / (n_a * n_b)`` and
    ``confidence = n_ab / n_a`` (a → b, with item_a < item_b), N = the
    number of distinct baskets.  Duplicate (basket, item) rows collapse
    first, so a basket contributes each pair at most once.

    Scale shape: one distinct, one basket-bucket pair generation
    (fan-out O(basket_size²) — transactional baskets are small by
    nature; a pathological mega-basket should be pre-capped the same
    way link_scores caps hub centers), one pair-bucket count with the
    min_support prune BEFORE the frequency joins, then two item-bucket
    hash joins (schema-hinted, single-execution) against the item
    counts.  N is a scalar aggregate of the distinct table; nothing
    reaches the driver but that one number."""
    from pyrdf2vec_ray.ops.join import _dtypes_of, hash_join
    from pyrdf2vec_ray.shuffle import bucket_agg, bucket_apply, distinct

    pairs_cols = [basket_col, item_col]
    d = distinct(rows.select_columns(pairs_cols), pairs_cols).materialize()
    n_baskets = int(distinct(
        d.select_columns([basket_col]), [basket_col]).count())

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g[[basket_col, item_col]]
        j = m.merge(m, on=basket_col, suffixes=("_a", "_b"))
        j = j[j[f"{item_col}_a"] < j[f"{item_col}_b"]]
        return pd.DataFrame({"item_a": j[f"{item_col}_a"].to_numpy(),
                             "item_b": j[f"{item_col}_b"].to_numpy()})

    pair_rows = bucket_apply(d, [basket_col], gen_pairs,
                             batch_format="pandas")
    pc = bucket_agg(pair_rows, ["item_a", "item_b"],
                    {"n_ab": ("item_a", "size")})

    ms = int(min_support)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_ab"] >= ms].reset_index(drop=True)

    pc = pc.map_batches(prune, batch_format="pandas")

    ic = bucket_agg(d, [item_col], {"n": (item_col, "size")}).materialize()
    it = _dtypes_of(ic, None)[item_col]
    i8 = np.dtype("int64")

    def rn(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({f"item_{side}": batch[item_col].to_numpy(),
                                 f"n_{side}": batch["n"].to_numpy()})
        return fn

    pc_schema = {"item_a": it, "item_b": it, "n_ab": i8}
    j1 = hash_join(pc, ic.map_batches(rn("a"), batch_format="pandas"),
                   on=["item_a"], lschema=pc_schema,
                   rschema={"item_a": it, "n_a": i8})
    j2 = hash_join(j1, ic.map_batches(rn("b"), batch_format="pandas"),
                   on=["item_b"],
                   lschema={**pc_schema, "n_a": i8},
                   rschema={"item_b": it, "n_b": i8})

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        n_ab = batch["n_ab"].to_numpy(np.float64)
        n_a = batch["n_a"].to_numpy(np.float64)
        n_b = batch["n_b"].to_numpy(np.float64)
        return pd.DataFrame(
            {"item_a": batch["item_a"], "item_b": batch["item_b"],
             "n_ab": batch["n_ab"].to_numpy().astype(np.int64),
             "lift": (n_ab * float(n_baskets)) / (n_a * n_b),
             "confidence": n_ab / n_a})

    return j2.map_batches(score, batch_format="pandas")


def skyline_2d(
    ds: ray.data.Dataset,
    max_col: str,
    min_col: str,
) -> ray.data.Dataset:
    """2-D skyline (Pareto front): the rows not DOMINATED by any other
    — maximize ``max_col`` while minimizing ``min_col`` (row A
    dominates B when A is ≥/≤ on both axes and strictly better on at
    least one).  The multi-objective "best tradeoffs" query (price vs
    latency, quality vs length) a top-k can't answer; ties on both
    axes all survive.

    Distributed shape: the skyline operator is a CLOSURE under union
    — the global front is contained in the union of per-block fronts
    — so one vectorized per-batch kernel (sort-free grouped min +
    strict prefix-min over descending keys) shrinks each block to its
    local front, and ONE bounded final task merges the candidates
    with the same kernel.  No shuffle at all: exchange volume is the
    (typically tiny) sum of local front sizes, never the corpus.
    Worst case (anti-correlated axes, everything on the front) the
    merge degenerates to the data — the caller's axes choose that,
    not the operator."""
    cols = list(ds.schema().names)

    def front(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch[max_col].to_numpy()
        if p.dtype.kind not in "iuf":
            raise TypeError("skyline_2d max_col must be numeric")
        d = batch[min_col].to_numpy()
        order = np.lexsort((d, -p))
        p, d = p[order], d[order]
        # per distinct p (descending): its min d; keep a p-group iff
        # its min d beats the STRICT prefix min (higher-p groups)
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        ends = np.r_[starts[1:], len(p)]
        md = d[starts]  # d sorted asc within p: group min = first
        prefix = np.empty(len(md), dtype=md.dtype)
        if len(md):
            prefix[0] = md.max()  # sentinel: nothing above the top p
            np.minimum.accumulate(md[:-1], out=prefix[1:])
        keep_grp = np.r_[True, md[1:] < prefix[1:]]
        keep = np.zeros(len(p), dtype=bool)
        for gi in np.flatnonzero(keep_grp):  # front-sized, not row-sized
            s = starts[gi]
            e = ends[gi]
            keep[s:e] = d[s:e] == md[gi]
        out = batch.iloc[order[keep]]
        return out[cols]

    parts = ds.map_batches(front, batch_format="pandas")
    return parts.repartition(1).map_batches(
        front, batch_format="pandas", batch_size=None)
