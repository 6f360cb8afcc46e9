"""grouped_linreg: hand-computable OLS fixtures — exact closed form,
zero-variance group drop, multi-batch partial-sum exactness."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.agg import grouped_linreg


def _fit(df, n_batches=1):
    parts = np.array_split(df, n_batches)
    ds = ray.data.from_pandas([p.reset_index(drop=True) for p in parts])
    out = grouped_linreg(ds, "g", "x", "y").to_pandas()
    return {r.g: (r.n, r.slope, r.intercept) for r in out.itertuples()}


def test_exact_line_recovered():
    # g=a: y = 3x + 7 exactly; g=b: y = -2x + 100 exactly
    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"] * 3,
         "x": [1, 2, 3, 4, 10, 20, 30],
         "y": [10, 13, 16, 19, 80, 60, 40]})
    got = _fit(df)
    n, s, i = got["a"]
    assert n == 4 and s == 3.0 and i == 7.0
    n, s, i = got["b"]
    assert n == 3 and s == -2.0 and i == 100.0


def test_least_squares_not_interpolation():
    # points (0,0),(1,1),(2,4): slope = cov/var = 2, intercept = 1/3
    df = pd.DataFrame({"g": ["a"] * 3, "x": [0, 1, 2], "y": [0, 1, 4]})
    n, s, i = _fit(df)["a"]
    assert s == 2.0
    assert abs(i - (5 / 3 - 2.0)) < 1e-12


def test_zero_variance_group_dropped():
    df = pd.DataFrame({"g": ["a", "a", "c", "c"],
                       "x": [1, 2, 5, 5], "y": [1, 2, 9, 11]})
    got = _fit(df)
    assert set(got) == {"a"}


def test_multibatch_sums_exact():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b"], 400),
         "x": rng.integers(0, 50, 400),
         "y": rng.integers(0, 10_000, 400)})
    assert _fit(df, n_batches=7) == _fit(df, n_batches=1)


def test_grouped_corr_known_values():
    from pyrdf2vec_ray.ops.agg import grouped_corr

    df = pd.DataFrame(
        {"g": ["a"] * 3 + ["b"] * 3 + ["c"] * 2,
         "x": [1, 2, 3, 1, 2, 3, 5, 5],      # c: zero x-variance
         "y": [2, 4, 6, 9, 5, 1, 1, 2]})
    ds = ray.data.from_pandas(df)
    out = grouped_corr(ds, "g", "x", "y").to_pandas()
    got = {r.g: (r.n, r.r) for r in out.itertuples()}
    assert set(got) == {"a", "b"}
    assert got["a"][1] == 1.0        # perfect positive
    assert got["b"][1] == -1.0       # perfect negative


def test_rrf_fusion_hand_computed():
    from pyrdf2vec_ray.ops.agg import rrf_fuse

    a = ray.data.from_pandas(pd.DataFrame(
        {"g": ["q"] * 3, "id": [1, 2, 3], "rank": [1, 2, 3]}))
    b = ray.data.from_pandas(pd.DataFrame(
        {"g": ["q"] * 3, "id": [3, 1, 4], "rank": [1, 2, 3]}))
    out = (rrf_fuse([a, b], "g", "id", k=60).to_pandas()
           .sort_values("rrf_rank").reset_index(drop=True))
    scores = {r.id: r.rrf for r in out.itertuples()}
    assert abs(scores[1] - (1 / 61 + 1 / 62)) < 1e-15
    assert abs(scores[3] - (1 / 63 + 1 / 61)) < 1e-15
    assert abs(scores[2] - 1 / 62) < 1e-15
    assert abs(scores[4] - 1 / 63) < 1e-15
    # doc in both lists with good ranks fuses to the top
    assert out.loc[0, "id"] in (1, 3)
    assert out["rrf_rank"].tolist() == [1, 2, 3, 4]
