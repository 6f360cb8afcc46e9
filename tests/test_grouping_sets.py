"""grouping_sets_agg: hand-computable ROLLUP/CUBE fixtures pinning the
GROUPING() bitmask, the 'ALL' fill, and one-pass totals."""
from __future__ import annotations

import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.agg import grouping_sets_agg

DF = pd.DataFrame(
    {"a": ["x", "x", "y", "y", "y"],
     "b": ["u", "v", "u", "u", "v"],
     "v": [1, 2, 4, 8, 16]})


def _run(sets):
    ds = ray.data.from_pandas(DF)
    out = grouping_sets_agg(ds, sets, "v").to_pandas()
    return {(r.a, r.b, r.grouping_id): (r.n, r.total)
            for r in out.itertuples()}


def test_rollup_levels_and_bitmask():
    got = _run([["a", "b"], ["a"], []])
    assert got[("x", "u", 0)] == (1, 1)
    assert got[("x", "v", 0)] == (1, 2)
    assert got[("y", "u", 0)] == (2, 12)
    assert got[("y", "v", 0)] == (1, 16)
    # level [a]: bit for b (index 1) set -> gid 2
    assert got[("x", "ALL", 2)] == (2, 3)
    assert got[("y", "ALL", 2)] == (3, 28)
    # grand total: both bits -> gid 3
    assert got[("ALL", "ALL", 3)] == (5, 31)
    assert len(got) == 7


def test_cube_includes_b_only_level():
    got = _run([["a", "b"], ["a"], ["b"], []])
    # level [b]: bit for a (index 0) set -> gid 1
    assert got[("ALL", "u", 1)] == (3, 13)
    assert got[("ALL", "v", 1)] == (2, 18)
    assert len(got) == 9


def test_multibatch_partials_reaggregate():
    ds = ray.data.from_pandas([DF.iloc[:2], DF.iloc[2:]])
    out = grouping_sets_agg(ds, [["a"], []], "v").to_pandas()
    got = {(r.a, r.grouping_id): (r.n, r.total) for r in out.itertuples()}
    assert got[("x", 0)] == (2, 3)
    assert got[("y", 0)] == (3, 28)
    assert got[("ALL", 1)] == (5, 31)


def test_categorical_mi_independent_and_determined():
    import numpy as np

    from pyrdf2vec_ray.ops.agg import categorical_mi

    # independent uniform: MI == 0 exactly (every term ln(1))
    ind = pd.DataFrame({"a": ["x", "x", "y", "y"],
                        "b": ["u", "v", "u", "v"]})
    out = categorical_mi(ray.data.from_pandas(ind), "a", "b").to_pandas()
    assert out["mi"].iloc[0] == 0.0 and out["n_pairs"].iloc[0] == 4

    # b fully determined by a: MI == H(a) == ln(2) for a 50/50 split
    det = pd.DataFrame({"a": ["x", "x", "y", "y"],
                        "b": ["u", "u", "v", "v"]})
    out = categorical_mi(ray.data.from_pandas(det), "a", "b").to_pandas()
    assert abs(out["mi"].iloc[0] - np.log(2)) < 1e-12


def test_grouped_entropy_extremes():
    import numpy as np

    from pyrdf2vec_ray.ops.agg import grouped_entropy

    df = pd.DataFrame(
        {"g": ["pure"] * 4 + ["even"] * 4 + ["skew"] * 4,
         "l": ["a"] * 4 + ["a", "b", "c", "d"] + ["a", "a", "a", "b"]})
    out = grouped_entropy(ray.data.from_pandas(df), "g", "l").to_pandas()
    got = {r.g: (r.n, r.n_labels, r.entropy) for r in out.itertuples()}
    assert got["pure"] == (4, 1, 0.0)
    n, k, h = got["even"]
    assert (n, k) == (4, 4) and abs(h - np.log(4)) < 1e-12
    n, k, h = got["skew"]
    expect = -(0.75 * np.log(0.75) + 0.25 * np.log(0.25))
    assert (n, k) == (4, 2) and abs(h - expect) < 1e-12
