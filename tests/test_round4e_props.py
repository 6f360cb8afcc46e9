"""Brute-force cross-checks for the round-4 graph/text/event operators:
each distributed result is compared against a pure-Python reference on
seeded random inputs — the property-level companion to the single
hand-computed cases in test_round4d_ops.py and the DuckDB oracles."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.util import to_table


def _random_graph(seed: int, n: int = 24, p: float = 0.18):
    rng = np.random.default_rng(seed)
    a, b = np.triu_indices(n, k=1)
    keep = rng.random(len(a)) < p
    return a[keep].astype(np.int64), b[keep].astype(np.int64)


def test_link_scores_matches_bruteforce():
    from pyrdf2vec_ray.ops.graph import link_scores

    for seed in (1, 2):
        a, b = _random_graph(seed)
        adj: dict[int, set] = {}
        for x, y in zip(a, b):
            adj.setdefault(int(x), set()).add(int(y))
            adj.setdefault(int(y), set()).add(int(x))
        edges = {(min(x, y), max(x, y)) for x, y in zip(a, b)}

        exp = {}
        nodes = sorted(adj)
        for i, u in enumerate(nodes):
            for w in nodes[i + 1:]:
                if (u, w) in edges:
                    continue
                common = adj[u] & adj[w]
                if not common:
                    continue
                aa = sum(1.0 / np.log(len(adj[z])) for z in common)
                jac = len(common) / (len(adj[u]) + len(adj[w]) - len(common))
                exp[(u, w)] = (len(common), aa, jac)

        ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
        got = to_table(link_scores(ds)).to_pandas()
        got_map = {(int(r.u), int(r.w)): (int(r.n_common), r.aa, r.jaccard)
                   for r in got.itertuples()}
        assert set(got_map) == set(exp)
        for k_, (nc, aa, jac) in exp.items():
            gnc, gaa, gjac = got_map[k_]
            assert gnc == nc
            assert abs(gaa - aa) < 1e-9
            assert abs(gjac - jac) < 1e-9


def test_kcore_bounded_matches_iterative_peel():
    from pyrdf2vec_ray.ops.graph import kcore_bounded

    # p=0.30 keeps a non-empty 3-core; p=0.12/k=3 peels to EMPTY —
    # Ray drops the schema of an all-empty result, which the bottom
    # branch accepts (same contract as er_match_pairs' empty case)
    for seed, k, p in ((3, 2, 0.12), (4, 3, 0.30), (5, 3, 0.12)):
        a, b = _random_graph(seed, n=30, p=p)
        edges = {(min(int(x), int(y)), max(int(x), int(y)))
                 for x, y in zip(a, b)}
        cur = set(edges)
        for _ in range(20):  # run the serial peel to the fixpoint
            deg: dict[int, int] = {}
            for x, y in cur:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            low = {v for v, d in deg.items() if d < k}
            if not low:
                break
            cur = {(x, y) for x, y in cur if x not in low and y not in low}
        exp: dict[int, int] = {}
        for x, y in cur:
            exp[x] = exp.get(x, 0) + 1
            exp[y] = exp.get(y, 0) + 1

        ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
        got = to_table(kcore_bounded(ds, k=k, rounds=20)).to_pandas()
        if "v" not in got.columns:
            assert len(got) == 0 and exp == {}
            continue
        got_map = dict(zip(got["v"].astype(int), got["d"].astype(int)))
        assert got_map == exp


def test_dedup_lines_matches_pandas_reference():
    from pyrdf2vec_ray.ops.text import dedup_lines

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = ["\n".join(rng.choice(vocab, rng.integers(1, 7)))
             for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})

    seen: set[str] = set()
    exp_rows = []
    for did, text in zip(df["doc_id"], df["text"]):
        lines = [ln.strip(" \t\r") for ln in text.split("\n")]
        kept = []
        dup = 0
        for ln in lines:
            if ln in seen:
                dup += 1
            else:
                seen.add(ln)
                kept.append(ln)
        exp_rows.append((did, len(lines), dup, "\n".join(kept)))
    exp = pd.DataFrame(exp_rows,
                       columns=["doc_id", "n_lines", "n_dup", "text"])

    got = (to_table(dedup_lines(ray.data.from_pandas(df).repartition(4)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_lines": "int64", "n_dup": "int64"}), exp)


def test_event_transitions_matches_pandas_reference():
    from pyrdf2vec_ray.ops.events import event_transitions

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64),
         "user_id": rng.integers(0, 12, n).astype(np.int64),
         "ts": pd.Timestamp("2024-01-01")
         + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
         "event_type": rng.choice(list("abcd"), n)})
    df["ts"] = df["ts"].astype("datetime64[us]")

    s = df.sort_values(["user_id", "ts", "event_id"])
    prev = s.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"prev_type": prev, "next_type": s["event_type"]})
    pairs = pairs[pairs["prev_type"].notna()]
    exp = (pairs.groupby(["prev_type", "next_type"]).size()
           .rename("c").reset_index())
    tot = exp.groupby("prev_type")["c"].transform("sum")
    exp["p"] = exp["c"] / tot

    got = (to_table(event_transitions(
        ray.data.from_pandas(df).repartition(5))).to_pandas()
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"c": "int64"}),
        exp.sort_values(["prev_type", "next_type"])
        .reset_index(drop=True).astype({"c": "int64"}))


def test_neighbor_mean_matches_numpy():
    from pyrdf2vec_ray.ops.graph import neighbor_mean_features

    rng = np.random.default_rng(17)
    nv, d = 20, 5
    V = rng.standard_normal((nv, d)).astype(np.float32)
    src = rng.integers(0, nv, 50).astype(np.int64)
    dst = rng.integers(0, nv, 50).astype(np.int64)
    feats = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(nv, dtype=np.int64), "embedding": list(V)}))
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))

    got = (to_table(neighbor_mean_features(edges, feats)).to_pandas()
           .sort_values(["v", "dim"]).reset_index(drop=True))
    for v in np.unique(src):
        nbrs = dst[src == v]
        exp_vec = V[nbrs].astype(np.float64).mean(axis=0)
        gv = got[got["v"] == v].sort_values("dim")["nbr_mean"].to_numpy()
        assert np.allclose(gv, exp_vec, atol=1e-12)


# ---- code-review regression pins ---------------------------------------------


def test_winsorize_numeric_group_column():
    from pyrdf2vec_ray.ops.agg import winsorize_by_group

    # numeric group keys whose STRING order differs from numeric order
    # ('10' < '2'): the cut lookup must still route each row to its own
    # group's cuts
    df = pd.DataFrame(
        {"g": np.array([2] * 10 + [10] * 10, dtype=np.int64),
         "i": np.arange(20, dtype=np.int64),
         "v": np.r_[np.arange(1, 11), np.arange(101, 111)].astype(np.int64)})
    got = (to_table(winsorize_by_group(
        ray.data.from_pandas(df).repartition(3), "g", "v", "i",
        q_lo=0.2, q_hi=0.8)).to_pandas()
        .sort_values("i").reset_index(drop=True))
    assert got[got["g"] == 2]["clipped"].tolist() == [
        2, 2, 3, 4, 5, 6, 7, 8, 8, 8]
    assert got[got["g"] == 10]["clipped"].tolist() == [
        102, 102, 103, 104, 105, 106, 107, 108, 108, 108]


def test_zscore_numeric_group_column():
    from pyrdf2vec_ray.ops.agg import zscore_by_group

    df = pd.DataFrame(
        {"g": np.array([2, 2, 2, 10, 10, 10], dtype=np.int64),
         "i": np.arange(6, dtype=np.int64),
         "v": np.array([1, 2, 3, 100, 200, 300], dtype=np.int64)})
    got = (to_table(zscore_by_group(
        ray.data.from_pandas(df).repartition(2), "g", "v", "i"))
        .to_pandas().sort_values("i").reset_index(drop=True))
    # each group standardizes against ITS OWN mean/std
    assert np.allclose(got[got["g"] == 2]["zscore"], [-1.0, 0.0, 1.0])
    assert np.allclose(got[got["g"] == 10]["zscore"], [-1.0, 0.0, 1.0])


def test_hot_keys_string_column():
    from pyrdf2vec_ray.ops.agg import hot_keys

    df = pd.DataFrame({"lang": ["en"] * 5 + ["de"] * 3 + ["fr"] * 2})
    got = (to_table(hot_keys(ray.data.from_pandas(df).repartition(2),
                             "lang", k=2)).to_pandas()
           .sort_values("n", ascending=False).reset_index(drop=True))
    assert got["lang"].tolist() == ["en", "de"]
    assert got["n"].tolist() == [5, 3]


def test_negative_edges_int_vertices():
    from pyrdf2vec_ray.ops.graph import negative_edges

    df = pd.DataFrame({"a": np.array([1, 2, 3], dtype=np.int64),
                       "b": np.array([2, 3, 4], dtype=np.int64)})
    got = to_table(negative_edges(
        ray.data.from_pandas(df).repartition(2), k=4, seed=1)).to_pandas()
    assert got["src"].dtype.kind == "i" and got["dst"].dtype.kind == "i"
    edges = {(1, 2), (2, 3), (3, 4)}
    assert not (set(zip(got["src"].astype(int),
                        got["dst"].astype(int))) & edges)
    assert (got["src"] != got["dst"]).all()


def test_broadcast_join_left_int_dtype_stability():
    from pyrdf2vec_ray.ops.join import broadcast_join

    big = 9223372036854775807 - 8  # near int64 max: float64 would corrupt
    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3], dtype=np.int64)})).repartition(3)
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 3], dtype=np.int64),
         "pay": np.array([big, big - 1], dtype=np.int64)}))
    got = (to_table(broadcast_join(left, right, on=["k"], how="left"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    # matched values survive EXACTLY (no float64 promotion), miss is NA
    assert got["pay"].iloc[0] == big
    assert got["pay"].iloc[2] == big - 1
    assert pd.isna(got["pay"].iloc[1])


def test_collocations_and_hot_keys_empty_input():
    from pyrdf2vec_ray.ops.agg import hot_keys
    from pyrdf2vec_ray.ops.text import collocations_pmi

    empty_docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.array([], dtype="int64"),
         "text": pd.array([], dtype=str)}))
    assert to_table(collocations_pmi(empty_docs)).num_rows == 0

    empty_keys = ray.data.from_pandas(pd.DataFrame(
        {"k": pd.array([], dtype="int64")}))
    assert to_table(hot_keys(empty_keys, "k")).num_rows == 0
