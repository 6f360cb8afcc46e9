"""Round-4 sixth-wave operators: grouped embedding centroids and the
label-centroid cosine matrix.

Hand-computable fixtures pin the exact contracts the SQL oracles also
encode (per-group mean algebra, a<b pair enumeration, float64 cosine
expression shape), plus string group keys and the multi-block combiner
path the sf tables are too small to exercise."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.similarity import (
    centroid_similarity,
    grouped_centroids,
)


def _emb(df: pd.DataFrame, blocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_grouped_centroids_exact_means():
    df = pd.DataFrame(
        {"label": [0, 0, 1, 1, 1],
         "embedding": [np.array(v, dtype=np.float32) for v in
                       [[1, 2], [3, 4], [0, 0], [6, 0], [0, 3]]]})
    out = (grouped_centroids(_emb(df), "label").to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    assert out["label"].tolist() == [0, 0, 1, 1, 1, 1][:4]
    got = {(int(r.label), int(r.dim)): r.val for r in out.itertuples()}
    assert got == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 2.0, (1, 1): 1.0}


def test_grouped_centroids_multiblock_combiner_matches_single():
    rng = np.random.RandomState(7)
    V = rng.randn(200, 8)
    df = pd.DataFrame({"src": np.repeat(["a", "b", "cc", "d"], 50),
                       "embedding": list(V)})
    one = (grouped_centroids(_emb(df), "src", vec_col="embedding")
           .to_pandas().sort_values(["src", "dim"]).reset_index(drop=True))
    many = (grouped_centroids(_emb(df, blocks=9), "src",
                              vec_col="embedding")
            .to_pandas().sort_values(["src", "dim"]).reset_index(drop=True))
    assert one["src"].tolist() == many["src"].tolist()
    assert np.allclose(one["val"], many["val"], atol=1e-12)
    # against plain pandas
    ref = (df.assign(**{f"d{i}": V[:, i] for i in range(8)})
           .groupby("src")[[f"d{i}" for i in range(8)]].mean())
    for src, grp in one.groupby("src"):
        assert np.allclose(grp.sort_values("dim")["val"].to_numpy(),
                           ref.loc[src].to_numpy(), atol=1e-12)


def test_centroid_similarity_pairs_and_values():
    # orthogonal, parallel and antiparallel centroids — known cosines
    df = pd.DataFrame(
        {"label": [0, 0, 1, 2, 3],
         "embedding": [np.array(v, dtype=np.float64) for v in
                       [[2, 0], [4, 0], [0, 5], [6, 0], [-1, 0]]]})
    t = centroid_similarity(_emb(df), "label").to_pandas()
    pairs = {(int(a), int(b)): c for a, b, c in
             zip(t["group_a"], t["group_b"], t["cos"])}
    # every unordered pair with a < b, exactly once
    assert set(pairs) == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert abs(pairs[(0, 1)]) < 1e-12          # orthogonal
    assert abs(pairs[(0, 2)] - 1.0) < 1e-12    # parallel
    assert abs(pairs[(0, 3)] + 1.0) < 1e-12    # antiparallel
    assert abs(pairs[(1, 2)]) < 1e-12
    assert abs(pairs[(2, 3)] + 1.0) < 1e-12


def test_centroid_similarity_string_groups_sorted():
    df = pd.DataFrame(
        {"lang": ["fr", "en", "en", "de"],
         "embedding": [np.array(v, dtype=np.float64) for v in
                       [[1, 1], [1, 0], [0, 1], [1, 1]]]})
    t = centroid_similarity(_emb(df), "lang").to_pandas()
    assert list(zip(t["group_a"], t["group_b"])) == [
        ("de", "en"), ("de", "fr"), ("en", "fr")]
    # en centroid = (.5, .5) ∥ de (1,1) ∥ fr (1,1)
    assert np.allclose(t["cos"], [1.0, 1.0, 1.0], atol=1e-12)
