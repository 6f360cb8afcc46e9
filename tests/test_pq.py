"""pq_encode: anchors must encode to themselves, codes cover subspaces,
ties take the lowest code id, numpy-reference parity."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.similarity import pq_encode


def _ds(V):
    return ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(V), dtype=np.int64),
         "embedding": [v.astype(np.float32) for v in V]}))


def test_anchor_self_encoding_and_reference_parity():
    rng = np.random.default_rng(3)
    C = rng.normal(size=(8, 16))
    V = np.concatenate([C, rng.normal(size=(40, 16))])
    out = pq_encode(_ds(V), C, n_subspaces=4).to_pandas()
    assert len(out) == 48 * 4
    # anchors: every subspace code equals the anchor's own id
    for a in range(8):
        sub = out[out["vec_id"] == a].sort_values("subspace")
        assert sub["code"].tolist() == [a, a, a, a]
    # reference argmin per subspace
    for s in range(4):
        Vs, Cs = V[:, s * 4:(s + 1) * 4], C[:, s * 4:(s + 1) * 4]
        ref = np.linalg.norm(Vs[:, None] - Cs[None], axis=2).argmin(1)
        got = (out[out["subspace"] == s].sort_values("vec_id")
               ["code"].to_numpy())
        assert (got == ref).all()


def test_tie_takes_lowest_code():
    C = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])  # 0 and 2 equal
    V = np.array([[1.0, 0.0]])
    out = pq_encode(_ds(V), C, n_subspaces=1).to_pandas()
    assert out["code"].tolist() == [0]


def test_dim_mismatch_raises():
    import pytest

    with pytest.raises(Exception):
        pq_encode(_ds(np.ones((3, 10))), np.ones((4, 8)),
                  n_subspaces=2).to_pandas()
