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


# ---- degree_assortativity ---------------------------------------------------


def _edges_ds(pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]}))


def test_assortativity_star_is_minus_one():
    from pyrdf2vec_ray.ops.graph import degree_assortativity

    t = degree_assortativity(
        _edges_ds([("c", "x"), ("c", "y"), ("c", "z")])).to_pandas()
    assert t["n_stubs"].tolist() == [6]
    assert abs(t["assortativity"][0] + 1.0) < 1e-12


def test_assortativity_path4_and_dedup_selfloops():
    from pyrdf2vec_ray.ops.graph import degree_assortativity

    # P4 = a-b-c-d has r = -0.5; duplicate/reversed edges and
    # self-loops must not change it
    t = degree_assortativity(_edges_ds(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("b", "a"), ("c", "c"), ("b", "c")])).to_pandas()
    assert t["n_stubs"].tolist() == [6]
    assert abs(t["assortativity"][0] + 0.5) < 1e-12


# ---- sequence_examples ------------------------------------------------------


def test_sequence_examples_padding_and_first_drop():
    from pyrdf2vec_ray.ops.events import sequence_examples

    ev = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4, 10, 20, 21],
        "user_id": [7, 7, 7, 7, 8, 9, 9],
        "ts": pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
             "2024-01-01 00:03", "2024-01-02 00:00", "2024-01-03 00:00",
             "2024-01-03 00:05"]),
        "event_type": ["A", "B", "C", "D", "solo", "X", "Y"]}))
    out = (sequence_examples(ev, k=3).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    # user 7: events 2,3,4 survive; user 8's single event drops;
    # user 9: event 21 survives with 2 pads
    assert out["event_id"].tolist() == [2, 3, 4, 21]
    assert out[["ctx_3", "ctx_2", "ctx_1", "target"]].values.tolist() == [
        ["", "", "A", "B"],
        ["", "A", "B", "C"],
        ["A", "B", "C", "D"],
        ["", "", "X", "Y"]]


def test_sequence_examples_ts_tie_breaks_on_event_id():
    from pyrdf2vec_ray.ops.events import sequence_examples

    ts = pd.to_datetime(["2024-01-01"] * 3)
    ev = ray.data.from_pandas(pd.DataFrame(
        {"event_id": [3, 1, 2], "user_id": [1, 1, 1], "ts": ts,
         "event_type": ["c", "a", "b"]}))
    out = (sequence_examples(ev, k=1).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out[["ctx_1", "target"]].values.tolist() == [
        ["a", "b"], ["b", "c"]]


# ---- check_expectations -----------------------------------------------------


def test_check_expectations_all_kinds():
    from pyrdf2vec_ray.ops.validate import check_expectations

    df = pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 4],
        "score": [0.5, 1.5, None, -2.0, 0.0, 1.0],
        "status": ["ok", "ok", "bad", None, "ok", "worse"],
        "code": ["A-1", "B-2", "zz", "A-9", None, "C-3"]})
    out = check_expectations(
        ray.data.from_pandas(df).repartition(3), [
            {"rule": "id_unique", "kind": "unique", "col": "id"},
            {"rule": "score_not_null", "kind": "not_null", "col": "score"},
            {"rule": "score_range", "kind": "range", "col": "score",
             "lo": 0, "hi": 1},
            {"rule": "status_set", "kind": "in_set", "col": "status",
             "values": ["ok"]},
            {"rule": "code_fmt", "kind": "regex", "col": "code",
             "pattern": "^[A-Z]-[0-9]$"},
        ]).to_pandas().set_index("rule")
    assert (out["n_checked"] == 6).all()
    got = out["n_violations"].to_dict()
    assert got == {"id_unique": 2,       # 2 and 4 duplicated once each
                   "score_not_null": 1,  # the None
                   "score_range": 2,     # 1.5 and -2.0 (null skipped)
                   "status_set": 2,      # bad, worse (null skipped)
                   "code_fmt": 1}        # zz (null skipped)


def test_check_expectations_rule_validation():
    import pytest

    from pyrdf2vec_ray.ops.validate import check_expectations

    ds = ray.data.from_pandas(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError):
        check_expectations(ds, [{"rule": "r", "kind": "nope", "col": "x"}])
    with pytest.raises(ValueError):
        check_expectations(ds, [
            {"rule": "r", "kind": "not_null", "col": "x"},
            {"rule": "r", "kind": "unique", "col": "x"}])
    with pytest.raises(ValueError):
        check_expectations(ds, [{"rule": "r", "kind": "range", "col": "x",
                                 "lo": 0}])
