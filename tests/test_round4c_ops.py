"""Round-4 third-wave operators: per-user running totals, k-means
M-step (centroid_update), degree-oriented triangle counting.

Hand-computable invariants + oracle-shared definitions, same
discipline as the driver gate."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.util import to_table


# ---- running totals --------------------------------------------------------


def test_running_totals_hand_computed():
    from pyrdf2vec_ray.ops.events import running_totals

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {"event_id": np.arange(6, dtype=np.int64),
         "user_id": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
         "ts": [base + pd.Timedelta(minutes=m) for m in
                (10, 5, 20, 0, 0, 1)],
         "value": [1.0, 2.0, 4.0, 10.0, 20.0, 40.0]})
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (to_table(running_totals(ray.data.from_pandas(df).repartition(3)))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # user 1 order by ts: e1(5) -> e0(10) -> e2(20)
    assert got.set_index("event_id")["seq"].tolist() == [2, 1, 3, 1, 2, 3]
    # ts tie between e3 and e4 breaks on event_id
    assert got.set_index("event_id")["cum_value"].tolist() == [
        3.0, 2.0, 7.0, 10.0, 30.0, 70.0]


# ---- k-means M-step --------------------------------------------------------


def test_centroid_update_exact_means():
    from pyrdf2vec_ray.ops.similarity import centroid_update

    C = np.eye(2, 4)  # two orthogonal anchors in 4-d
    vecs = [np.array([1.0, 0, 0, 2]), np.array([3.0, 0, 0, 4]),
            np.array([0, 1.0, 5, 0]), np.array([0, 2.0, 6, 0])]
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": vecs})
    got = (to_table(centroid_update(
        ray.data.from_pandas(df).repartition(2), C))
        .to_pandas().sort_values(["cluster", "dim"])
        .reset_index(drop=True))
    assert len(got) == 8
    m0 = got[got["cluster"] == 0]["val"].to_numpy()
    m1 = got[got["cluster"] == 1]["val"].to_numpy()
    np.testing.assert_allclose(m0, [2.0, 0, 0, 3.0])
    np.testing.assert_allclose(m1, [0, 1.5, 5.5, 0])


def test_centroid_update_empty_cluster_absent():
    """A centroid attracting no vectors emits no rows (the caller
    reseeds dead centroids, the standard k-means treatment)."""
    from pyrdf2vec_ray.ops.similarity import centroid_update

    C = np.vstack([np.eye(1, 4), -np.eye(1, 4)])  # +x and -x anchors
    df = pd.DataFrame({"vec_id": np.arange(2, dtype=np.int64),
                       "embedding": [np.array([1.0, 0, 0, 0]),
                                     np.array([2.0, 0.1, 0, 0])]})
    got = to_table(centroid_update(ray.data.from_pandas(df), C)).to_pandas()
    assert set(got["cluster"]) == {0}


# ---- triangle counts -------------------------------------------------------


def _tri(edges):
    from pyrdf2vec_ray.ops.graph import triangle_counts

    df = pd.DataFrame({"a": np.array([e[0] for e in edges], np.int64),
                       "b": np.array([e[1] for e in edges], np.int64)})
    return (to_table(triangle_counts(
        ray.data.from_pandas(df).repartition(2)))
        .to_pandas().sort_values("v").reset_index(drop=True))


def test_triangle_counts_k4():
    """K4: every vertex has degree 3 and sits in C(3,2)=3 triangles."""
    got = _tri([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    assert got["v"].tolist() == [0, 1, 2, 3]
    assert got["degree"].tolist() == [3, 3, 3, 3]
    assert got["n_tri"].tolist() == [3, 3, 3, 3]


def test_triangle_counts_mixed_graph():
    """A triangle with a pendant vertex + a disconnected edge: dup
    edges, reversed orientation and a self-loop all collapse."""
    got = _tri([(0, 1), (1, 2), (2, 0), (0, 2),   # dup edge both ways
                (2, 3),                            # pendant
                (4, 5), (5, 5)])                   # lone edge + self-loop
    assert got["v"].tolist() == [0, 1, 2, 3, 4, 5]
    assert got["degree"].tolist() == [2, 2, 3, 1, 1, 1]
    assert got["n_tri"].tolist() == [1, 1, 1, 0, 0, 0]


def test_triangle_counts_two_triangles_shared_edge():
    """Bowtie on an edge: (0,1,2) and (0,1,3) share edge (0,1)."""
    got = _tri([(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)])
    assert got.set_index("v")["n_tri"].to_dict() == {0: 2, 1: 2, 2: 1, 3: 1}
