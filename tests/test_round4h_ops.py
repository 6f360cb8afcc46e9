"""Round-4 seventh-wave operators: neighbor-set Jaccard similarity.

Hand-computable fixtures pin the wedge/Jaccard contract the SQL oracle
also encodes: shared-neighbor intersection counts, degrees over the
hub-capped edge set, u<v pair order, the single-division float score,
duplicate-edge collapse and self-loop drop, plus the multi-block path.
"""
from __future__ import annotations

import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.graph import neighbor_jaccard


def _edges(rows, blocks: int = 1) -> ray.data.Dataset:
    df = pd.DataFrame(rows, columns=["a", "b"])
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_neighbor_jaccard_exact_small():
    # u: {x, y, z}; v: {x, y}; w: {y}
    rows = [("u", "x"), ("u", "y"), ("u", "z"),
            ("v", "x"), ("v", "y"),
            ("w", "y")]
    out = neighbor_jaccard(_edges(rows), k=10).to_pandas()
    out = out.sort_values(["u", "v"]).reset_index(drop=True)
    got = {(r.u, r.v): (r.inter, r.deg_u, r.deg_v, r.jaccard)
           for r in out.itertuples()}
    assert got[("u", "v")] == (2, 3, 2, 2 / 3)
    assert got[("u", "w")] == (1, 3, 1, 1 / 3)
    assert got[("v", "w")] == (1, 2, 1, 1 / 2)
    assert len(got) == 3


def test_neighbor_jaccard_dedup_and_self_loops():
    # duplicate edges collapse; self-loops never count as neighbors
    rows = [("u", "x"), ("u", "x"), ("u", "u"),
            ("v", "x"), ("v", "v")]
    out = neighbor_jaccard(_edges(rows, blocks=3), k=5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["u"], r["v"]) == ("u", "v")
    assert (r["inter"], r["deg_u"], r["deg_v"]) == (1, 1, 1)
    assert r["jaccard"] == 1.0


def test_neighbor_jaccard_fanin_cap_drops_hub():
    # hub h is shared by all three sources; with max_fanin=2 the hub
    # contributes neither wedges NOR degree, so only the x-wedge pair
    # survives and its degrees exclude h.
    rows = [("u", "h"), ("v", "h"), ("w", "h"),
            ("u", "x"), ("v", "x")]
    out = neighbor_jaccard(_edges(rows), max_fanin=2, k=10).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["u"], r["v"], r["inter"]) == ("u", "v", 1)
    assert (r["deg_u"], r["deg_v"], r["jaccard"]) == (1, 1, 1.0)


def test_neighbor_jaccard_topk_tie_break():
    # two jaccard=1.0 pairs; k=1 keeps the lexicographically first
    # (u, v) — the oracle's ORDER BY jaccard DESC, u, v contract.
    rows = [("a1", "x"), ("a2", "x"), ("b1", "y"), ("b2", "y")]
    out = neighbor_jaccard(_edges(rows), k=1).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["u"], out.iloc[0]["v"]) == ("a1", "a2")


def test_gini_int_hand_values():
    from pyrdf2vec_ray.ops.agg import gini_int

    def g(vals, blocks=1):
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
        if blocks > 1:
            ds = ds.repartition(blocks)
        t = gini_int(ds, "x").to_pandas().iloc[0]
        return (int(t["n"]), int(t["total"]), float(t["gini"]))

    # mean-abs-difference definition: G = ΣΣ|xi−xj| / (2 n² μ)
    assert g([1, 3]) == (2, 4, 0.25)
    assert g([5, 5, 5, 5], blocks=3) == (4, 20, 0.0)
    assert g([0, 0, 0, 10]) == (4, 10, 0.75)
    # all-zero column: total 0 → gini defined as 0
    assert g([0, 0]) == (2, 0, 0.0)


def test_grouped_chisq_hand_values():
    from pyrdf2vec_ray.ops.agg import grouped_chisq

    def run(rows, blocks=1):
        ds = ray.data.from_pandas(pd.DataFrame(rows, columns=["g", "c"]))
        if blocks > 1:
            ds = ds.repartition(blocks)
        out = grouped_chisq(ds, "g", "c").to_pandas()
        return {r.g: (int(r.n), float(r.chi2)) for r in out.itertuples()}

    # A: 3x+1y, B: 1x+3y — e=2 everywhere, chi2 = 0.5+0.5 per group
    rows = [("A", "x")] * 3 + [("A", "y")] + [("B", "x")] + [("B", "y")] * 3
    got = run(rows, blocks=3)
    assert got == {"A": (4, 1.0), "B": (4, 1.0)}

    # zero cells count: A only x, B only y — e=1, chi2 = 1+1 = 2
    got = run([("A", "x"), ("A", "x"), ("B", "y"), ("B", "y")])
    assert got == {"A": (2, 2.0), "B": (2, 2.0)}

    # a group matching the pooled distribution exactly scores 0
    rows = ([("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")])
    got = run(rows)
    assert got == {"A": (2, 0.0), "B": (2, 0.0)}


def test_grouped_weighted_quantiles_hand_values():
    from pyrdf2vec_ray.ops.agg import grouped_weighted_quantiles

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 2,
                       "x": [1, 2, 3, 3, 10, 20],
                       "w": [1, 1, 1, 1, 3, 1]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = grouped_weighted_quantiles(
        ds, "g", "x", "w", qs=(0.25, 0.5, 0.9, 1.0)).to_pandas()
    got = {(r.g, r.q): r.x for r in out.itertuples()}
    # group a: x=[1,2,3] f=[1,1,2], W=4; thresholds 1.0/2.0/3.6/4.0
    assert got[("a", 0.25)] == 1
    assert got[("a", 0.5)] == 2
    assert got[("a", 0.9)] == 3
    assert got[("a", 1.0)] == 3
    # group b: x=[10,20] f=[3,1], W=4; 0.5→thr 2→10, 0.9→thr 3.6→20
    assert got[("b", 0.5)] == 10
    assert got[("b", 0.9)] == 20
    assert got[("b", 1.0)] == 20


def test_benford_firstdigit_counts_and_exclusions():
    from pyrdf2vec_ray.ops.validate import benford_firstdigit

    df = pd.DataFrame({"v": [1.0, 1.0, 2.0, 9.99, 0.0, -5.0]})
    out = benford_firstdigit(
        ray.data.from_pandas(df).repartition(2), "v").to_pandas()
    out = out.set_index("digit")
    assert list(out.index) == list(range(1, 10))
    assert out.loc[1, "observed"] == 2
    assert out.loc[2, "observed"] == 1
    assert out.loc[9, "observed"] == 1
    assert int(out["observed"].sum()) == 4  # 0 and negatives excluded
    import numpy as np
    assert out.loc[1, "expected"] == 4 * np.log10(1 + 1.0 / 1)
    e = out.loc[3, "expected"]
    assert out.loc[3, "term"] == (0 - e) * (0 - e) / e


def test_value_histogram_exact_bins():
    from pyrdf2vec_ray.ops.agg import value_histogram

    df = pd.DataFrame({"v": [0.0, 1.0, 2.0, 3.0, 4.0]})
    out = (value_histogram(ray.data.from_pandas(df).repartition(3),
                           "v", bins=2).to_pandas()
           .sort_values("bin").reset_index(drop=True))
    assert list(out["bin"]) == [0, 1]
    assert list(out["n"]) == [2, 3]      # max closed into last bin
    assert list(out["lo"]) == [0.0, 2.0]
    assert list(out["hi"]) == [2.0, 4.0]

    # degenerate: zero width -> single bin, lo == hi
    same = pd.DataFrame({"v": [7.0, 7.0, 7.0]})
    out = value_histogram(ray.data.from_pandas(same), "v", bins=4).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["bin"], out.iloc[0]["n"]) == (0, 3)
    assert out.iloc[0]["lo"] == out.iloc[0]["hi"] == 7.0


def test_cramers_v_hand_values():
    import numpy as np

    from pyrdf2vec_ray.ops.agg import cramers_v

    # perfect association: a determines b -> v = 1
    df = pd.DataFrame({"a": ["x"] * 4 + ["y"] * 4,
                       "b": ["p"] * 4 + ["q"] * 4})
    t = cramers_v(ray.data.from_pandas(df).repartition(3),
                  "a", "b").to_pandas().iloc[0]
    assert (t["n"], t["n_a"], t["n_b"]) == (8, 2, 2)
    assert abs(t["v"] - 1.0) < 1e-12
    assert abs(t["chi2"] - 8.0) < 1e-12  # chi2 = n for a 2x2 perfect

    # independence -> chi2 = 0, v = 0
    df = pd.DataFrame({"a": ["x", "x", "y", "y"],
                       "b": ["p", "q", "p", "q"]})
    t = cramers_v(ray.data.from_pandas(df), "a", "b").to_pandas().iloc[0]
    assert t["chi2"] == 0.0 and t["v"] == 0.0


def test_grouped_gini_matches_global_and_multigroup():
    from pyrdf2vec_ray.ops.agg import grouped_gini

    df = pd.DataFrame({"g": ["a"] * 2 + ["b"] * 4 + ["c"] * 2,
                       "x": [1, 3, 5, 5, 5, 5, 0, 10]})
    out = grouped_gini(
        ray.data.from_pandas(df).repartition(3), "g", "x"
    ).to_pandas()
    got = {r.g: (int(r.n), int(r.total), float(r.gini))
           for r in out.itertuples()}
    assert got["a"] == (2, 4, 0.25)      # same fixture as gini_int
    assert got["b"] == (4, 20, 0.0)      # all equal
    # c: [0, 10] -> G = 10*2/(2*4*2.5) per pair formula = 0.5
    assert got["c"] == (2, 10, 0.5)


def test_skyline_2d_dominance_and_ties():
    from pyrdf2vec_ray.ops.mining import skyline_2d

    df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                       "p": [5, 5, 4, 3, 5, 6],
                       "d": [3, 1, 0, 5, 1, 4]})
    out = skyline_2d(ray.data.from_pandas(df).repartition(3),
                     "p", "d").to_pandas()
    # front: (6,4); (5,1) twice (both-axis ties survive); (4,0).
    # (5,3) is dominated by (5,1); (3,5) by (4,0).
    assert sorted(out["id"]) == [2, 3, 5, 6]
    assert set(out.columns) == {"id", "p", "d"}


def test_verify_containment_orientation():
    from pyrdf2vec_ray.ops.dedup import verify_jaccard

    # doc 2's text is a strict prefix of doc 1's -> shingles(2) ⊂
    # shingles(1): containment(2 in 1) = 1.0, containment(1 in 2) < 1
    long = "a b c d e f g h i j k l"
    short = "a b c d e f g h"
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": [long, short]}))
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"doc_a": [2, 1], "doc_b": [1, 2]}))
    out = verify_jaccard(docs, pairs, k=5, threshold=0.0,
                         metric="containment").to_pandas()
    got = {(r.doc_a, r.doc_b): r.containment for r in out.itertuples()}
    assert got[(2, 1)] == 1.0
    # long doc: 8 shingles, short: 4, all shared -> 4/8
    assert got[(1, 2)] == 0.5
