"""Round-4 second-wave operators: priority sampling, boilerplate line
removal, URL/domain extraction, BM25 retrieval.

Each test checks the Ray implementation against either its DuckDB
oracle (shared-definition parity, same as the driver gate) or a
hand-computable invariant."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from pyrdf2vec_ray.util import to_table


def _wdocs(n=500, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "n_chars": rng.integers(1, 1000, n).astype(np.int64)}
    )


# ---- priority_sample -------------------------------------------------------


def test_priority_sample_matches_duckdb_bit_exact():
    from pyrdf2vec_ray.ops.curate import priority_sample, priority_sample_sql

    df = _wdocs()
    ds = ray.data.from_pandas(df).repartition(7)
    got = (to_table(priority_sample(ds, 25, "n_chars", seed=11))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    exp = (con.execute(priority_sample_sql(25, seed=11)).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    exp = exp.astype({"doc_id": got["doc_id"].dtype,
                      "n_chars": got["n_chars"].dtype})
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "priority"]],
        exp[["doc_id", "n_chars", "priority"]],
    )


def test_priority_sample_partition_invariant_and_weight_biased():
    from pyrdf2vec_ray.ops.curate import priority_sample

    df = _wdocs(n=800, seed=9)
    a = (to_table(priority_sample(ray.data.from_pandas(df), 60,
                                  "n_chars", seed=2))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (to_table(priority_sample(ray.data.from_pandas(df).repartition(17),
                                  60, "n_chars", seed=2))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 60
    # heavier rows are proportionally likelier: sampled mean weight
    # exceeds the corpus mean by a clear margin at this size
    assert a["n_chars"].mean() > df["n_chars"].mean()


def test_priority_sample_rejects_nonpositive_weights():
    from pyrdf2vec_ray.ops.curate import priority_sample

    df = _wdocs(n=50)
    df.loc[3, "n_chars"] = 0
    with pytest.raises(Exception):
        to_table(priority_sample(ray.data.from_pandas(df), 5, "n_chars"))


# ---- global_topn -----------------------------------------------------------


def test_global_topn_matches_pandas_and_partition_invariant():
    from pyrdf2vec_ray.ops.agg import global_topn

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "score": rng.normal(size=300)})
    exp = (df.sort_values(["score", "doc_id"], ascending=[False, True])
           .head(12).reset_index(drop=True))
    for parts in (1, 9):
        got = (to_table(global_topn(
            ray.data.from_pandas(df).repartition(parts), 12, "score",
            "doc_id", rank_col="rank")).to_pandas())
        assert got["rank"].tolist() == list(range(1, 13))
        pd.testing.assert_frame_equal(
            got[["doc_id", "score"]].reset_index(drop=True), exp)


# ---- boilerplate removal ---------------------------------------------------


def test_remove_boilerplate_hand_computed():
    from pyrdf2vec_ray.ops.text import remove_boilerplate

    n = 20
    rows = []
    for i in range(n):
        body = f"unique body text {i}"
        lines = [body]
        if i < 10:
            lines.append("FOOTER LINE")          # df=10 -> boilerplate
        lines.append(f"only in doc {i}")          # df=1 -> kept
        rows.append({"doc_id": i, "text": "\n".join(lines)})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    got = (to_table(remove_boilerplate(ds, min_docs=5)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == n
    for i in range(n):
        r = got.iloc[i]
        has_footer = i < 10
        assert r["n_lines"] == (3 if has_footer else 2)
        assert r["n_boiler"] == (1 if has_footer else 0)
        kept = [f"unique body text {i}", f"only in doc {i}"]
        assert r["clean_n_chars"] == len("\n".join(kept))


def test_boilerplate_lines_threshold():
    from pyrdf2vec_ray.ops.text import boilerplate_lines

    rows = [{"doc_id": i, "text": "COMMON\nrare " + str(i)}
            for i in range(8)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = to_table(boilerplate_lines(ds, min_docs=8)).to_pandas()
    assert got["line"].tolist() == ["COMMON"]
    assert got["df"].tolist() == [8]


# ---- URL domain stats ------------------------------------------------------


def test_url_domain_stats_counts():
    from pyrdf2vec_ray.ops.text import url_domain_stats

    rows = [
        {"doc_id": 0, "text": "x https://a.com/p http://a.com/q y"},
        {"doc_id": 1, "text": "see https://b.org/r"},
        {"doc_id": 2, "text": "https://a.com/z no more"},
        {"doc_id": 3, "text": "no urls at all"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    got = (to_table(url_domain_stats(ds)).to_pandas()
           .sort_values("domain").reset_index(drop=True))
    assert got["domain"].tolist() == ["a.com", "b.org"]
    assert got["n_urls"].tolist() == [3, 1]
    assert got["n_docs"].tolist() == [2, 1]


# ---- BM25 ------------------------------------------------------------------


def _bm25_corpus(n=120, seed=13) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(n)]
    # make 'rareterm' appear in exactly 3 docs
    for i in (5, 50, 100):
        if i < n:
            texts[i] = texts[i] + " rareterm"
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_bm25_matches_duckdb():
    from pyrdf2vec_ray.ops.text import bm25_topk, bm25_topk_sql

    df = _bm25_corpus()
    terms = ["alpha", "rareterm"]
    got = (to_table(bm25_topk(ray.data.from_pandas(df).repartition(5),
                              terms, k=15)).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(bm25_topk_sql(terms, k=15)).fetchdf()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], exp["score"], rtol=0, atol=0)
    # rare-term docs dominate the ranking (idf contrast)
    assert set(got.head(3)["doc_id"]) == {5, 50, 100}


def test_bm25_rejects_bad_terms():
    from pyrdf2vec_ray.ops.text import bm25_topk

    ds = ray.data.from_pandas(_bm25_corpus(20))
    with pytest.raises(ValueError):
        bm25_topk(ds, [])
    with pytest.raises(ValueError):
        bm25_topk(ds, ["a", "a"])


# ---- co-mention graph ------------------------------------------------------


def test_comention_edges_hand_computed_and_capped():
    from pyrdf2vec_ray.pipelines.construct import comention_edges

    rows = [
        {"doc_id": 0, "ent": "a"}, {"doc_id": 0, "ent": "b"},
        {"doc_id": 0, "ent": "c"}, {"doc_id": 0, "ent": "a"},  # dup
        {"doc_id": 1, "ent": "a"}, {"doc_id": 1, "ent": "b"},
        {"doc_id": 2, "ent": "c"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    got = (to_table(comention_edges(ds)).to_pandas()
           .sort_values(["ent_a", "ent_b"]).reset_index(drop=True))
    exp = pd.DataFrame({"ent_a": ["a", "a", "b"],
                        "ent_b": ["b", "c", "c"],
                        "n_docs": np.array([2, 1, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, exp)
    # cap keeps the lexicographically first 2 ents per doc: doc0 -> a,b
    capped = (to_table(comention_edges(ds, max_per_doc=2)).to_pandas()
              .sort_values(["ent_a", "ent_b"]).reset_index(drop=True))
    assert capped[["ent_a", "ent_b"]].values.tolist() == [["a", "b"]]
    assert capped["n_docs"].tolist() == [2]


# ---- cluster assignment ----------------------------------------------------


def test_cluster_assign_matches_numpy_and_ties_to_lowest():
    from pyrdf2vec_ray.ops.similarity import cluster_assign

    rng = np.random.default_rng(7)
    V = rng.normal(size=(200, 16))
    C = rng.normal(size=(5, 16))
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": list(V)})
    got = (to_table(cluster_assign(
        ray.data.from_pandas(df).repartition(4), C)).to_pandas()
        .sort_values("vec_id").reset_index(drop=True))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    exp = (Vn @ Cn.T).argmax(axis=1)
    np.testing.assert_array_equal(got["cluster"].to_numpy(), exp)
    # duplicate centroid -> tie resolves to the lowest cluster index
    C2 = np.vstack([C[0], C[0], C[1]])
    one = pd.DataFrame({"vec_id": np.array([0], dtype=np.int64),
                        "embedding": [C[0]]})
    got2 = to_table(cluster_assign(ray.data.from_pandas(one), C2)).to_pandas()
    assert got2["cluster"].tolist() == [0]


def test_cluster_assign_rejects_empty_centroids():
    from pyrdf2vec_ray.ops.similarity import cluster_assign

    df = pd.DataFrame({"vec_id": [0], "embedding": [np.ones(4)]})
    with pytest.raises(ValueError):
        cluster_assign(ray.data.from_pandas(df), np.zeros((0, 4)))


# ---- windowed top-k --------------------------------------------------------


def test_windowed_topk_hand_computed():
    from pyrdf2vec_ray.ops.events import windowed_topk

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # hour 0: user 1 x3, user 2 x2, user 3 x1  -> top2 = [1, 2]
    for u, c in ((1, 3), (2, 2), (3, 1)):
        for j in range(c):
            rows.append({"user_id": u,
                         "ts": base + pd.Timedelta(minutes=5 * j)})
    # hour 1: users 4 and 5 tie at 2 -> tie breaks to lower id first
    for u in (4, 5):
        for j in range(2):
            rows.append({"user_id": u,
                         "ts": base + pd.Timedelta(hours=1, minutes=j)})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (to_table(windowed_topk(
        ray.data.from_pandas(df).repartition(3), k=2)).to_pandas()
        .sort_values(["window_start", "rank"]).reset_index(drop=True))
    assert got["user_id"].tolist() == [1, 2, 4, 5]
    assert got["n_events"].tolist() == [3, 2, 2, 2]
    assert got["rank"].tolist() == [1, 2, 1, 2]


# ---- SemDeDup --------------------------------------------------------------


def _semdedup_frame():
    """4 well-separated anchor directions + planted near-dups."""
    rng = np.random.default_rng(7)
    base = np.eye(4, 8)  # 4 orthogonal anchors in 8-d
    rows, ids = [], []
    nxt = 100
    for c in range(4):
        for j in range(5):
            v = base[c] + rng.normal(0, 0.05, 8)  # tight around anchor
            rows.append(v)
            ids.append(nxt)
            nxt += 1
    return pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                         "embedding": rows}), base


def test_semdedup_drops_higher_id_members():
    """All 5 members of a tight cluster are within 0.9 cosine of each
    other -> only the lowest id survives per cluster."""
    from pyrdf2vec_ray.ops.dedup import semdedup

    df, C = _semdedup_frame()
    got = (to_table(semdedup(ray.data.from_pandas(df).repartition(3), C,
                             threshold=0.9))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(got) == 20
    kept = got[got["kept"] == 1]["vec_id"].tolist()
    # lowest id of each 5-block survives
    assert kept == [100, 105, 110, 115]
    # every vector routed to its generating anchor
    assert got["cluster"].tolist() == sum([[c] * 5 for c in range(4)], [])


def test_semdedup_keeps_all_below_threshold():
    from pyrdf2vec_ray.ops.dedup import semdedup

    df, C = _semdedup_frame()
    got = to_table(semdedup(ray.data.from_pandas(df), C,
                            threshold=1.01)).to_pandas()
    assert (got["kept"] == 1).all()


def test_semdedup_exact_duplicate_pair():
    """An exact clone (same vector, higher id) is dropped; the original
    kept — the planted-duplicate contract of the driver query."""
    from pyrdf2vec_ray.ops.dedup import semdedup

    df, C = _semdedup_frame()
    clone = df.iloc[[0]].assign(vec_id=np.int64(10_000))
    got = (to_table(semdedup(
        ray.data.from_pandas(pd.concat([df, clone], ignore_index=True)),
        C, threshold=0.999))
        .to_pandas().set_index("vec_id"))
    assert got.loc[10_000, "kept"] == 0
    assert got.loc[100, "kept"] == 1
