"""Grouped top-k, exact grouped quantiles, Bloom filter, inverted
index: reference-checked against naive pandas/numpy implementations
and (for the quantile rank rule) DuckDB itself."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pyrdf2vec_ray.ops.agg import grouped_quantiles, topk_by_group
from pyrdf2vec_ray.ops.sketch import bloom_contains, bloom_words
from pyrdf2vec_ray.ops.text import posting_lists
from pyrdf2vec_ray.util import to_table


def _scored_ds(n=500, groups=7, seed=3):
    rng = np.random.RandomState(seed)
    return ray.data.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "grp": pa.array([f"g{i}" for i in rng.randint(0, groups, n)]),
        # small value domain forces ties -> exercises the tie-break
        "score": pa.array(rng.randint(0, 40, n), pa.int64()),
    })).repartition(8)


def test_topk_by_group_matches_pandas():
    ds = _scored_ds()
    got = (to_table(topk_by_group(ds, "grp", "score", 5, id_col="id"))
           .to_pandas().sort_values(["grp", "rank"]).reset_index(drop=True))
    ref = ds.to_pandas().sort_values(
        ["grp", "score", "id"], ascending=[True, False, True]
    ).groupby("grp").head(5).reset_index(drop=True)
    ref["rank"] = ref.groupby("grp").cumcount() + 1
    pd.testing.assert_frame_equal(
        got[["grp", "id", "score", "rank"]],
        ref[["grp", "id", "score", "rank"]],
    )


def test_topk_ascending_and_k1():
    ds = _scored_ds(n=100, groups=3)
    got = (to_table(topk_by_group(ds, "grp", "score", 1, id_col="id",
                                  ascending=True))
           .to_pandas().sort_values("grp").reset_index(drop=True))
    ref = (ds.to_pandas().sort_values(["grp", "score", "id"])
           .groupby("grp").head(1).reset_index(drop=True))
    assert got["id"].tolist() == ref["id"].tolist()
    assert (got["rank"] == 1).all()


@pytest.mark.parametrize("q", [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
def test_grouped_quantiles_match_duckdb(q):
    ds = _scored_ds(n=700, groups=5, seed=11)
    got = (to_table(grouped_quantiles(ds, "grp", "score", (q,)))
           .to_pandas().sort_values("grp").reset_index(drop=True))
    con = duckdb.connect()
    con.register("df", ds.to_pandas())
    ref = con.execute(
        f"SELECT grp, quantile_disc(score, {q}) AS score "
        "FROM df GROUP BY grp ORDER BY grp"
    ).df()
    assert got["score"].tolist() == ref["score"].tolist()
    assert (got["q"] == q).all()


def test_grouped_quantiles_single_element_groups():
    ds = ray.data.from_arrow(pa.table({
        "grp": pa.array(["a", "b"]), "v": pa.array([10, 20], pa.int64()),
    }))
    got = (to_table(grouped_quantiles(ds, "grp", "v", (0.0, 0.5, 1.0)))
           .to_pandas().sort_values(["grp", "q"]))
    assert got[got["grp"] == "a"]["v"].tolist() == [10, 10, 10]
    assert got[got["grp"] == "b"]["v"].tolist() == [20, 20, 20]


def _bloom_docs():
    texts = ["alpha beta gamma", "beta delta", "epsilon zeta eta theta",
             "alpha beta", ""]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)


def test_bloom_no_false_negatives_and_low_fp():
    words = to_table(bloom_words(_bloom_docs())).to_pandas()
    present = ["alpha", "beta", "gamma", "delta", "epsilon",
               "zeta", "eta", "theta"]
    assert bloom_contains(words, present).all()
    # 8 tokens in a 4096-bit filter: fp rate ~ (24/4096)^3 ~ 2e-7
    absent = [f"missing{i}" for i in range(2000)]
    assert bloom_contains(words, absent).sum() == 0


def test_bloom_partial_or_merge_matches_single_batch():
    ds1 = _bloom_docs().repartition(1)
    ds3 = _bloom_docs().repartition(3)
    a = (to_table(bloom_words(ds1)).to_pandas()
         .sort_values("word").reset_index(drop=True))
    b = (to_table(bloom_words(ds3)).to_pandas()
         .sort_values("word").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_posting_lists_matches_naive():
    ds = _bloom_docs()
    got = (to_table(posting_lists(ds, min_df=1)).to_pandas()
           .sort_values("token").reset_index(drop=True))
    naive = {}
    for i, t in enumerate(["alpha beta gamma", "beta delta",
                           "epsilon zeta eta theta", "alpha beta", ""]):
        for tok in set(t.split()):
            naive.setdefault(tok, set()).add(i)
    assert got["token"].tolist() == sorted(naive)
    for _, row in got.iterrows():
        ids = sorted(naive[row["token"]])
        assert row["df"] == len(ids)
        assert row["postings"] == ",".join(map(str, ids))


def test_posting_lists_min_df_prunes():
    got = to_table(posting_lists(_bloom_docs(), min_df=2)).to_pandas()
    assert set(got["token"]) == {"alpha", "beta"}


def test_bigram_lm_matches_naive():
    from pyrdf2vec_ray.ops.text import bigram_lm_scores

    texts = ["a b c a b", "a b x", "z z", "solo", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(2)

    def even(b):
        return b[b["doc_id"] % 2 == 0]

    lm = ds.map_batches(even, batch_format="pandas")
    got = (to_table(bigram_lm_scores(ds, lm_docs=lm)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # naive: fit on docs 0,2,4 -> bigrams from "a b c a b" and "z z"
    from collections import Counter
    lm_texts = [texts[0], texts[2], texts[4]]
    pairs = Counter()
    vocab = set()
    for t in lm_texts:
        w = t.split()
        vocab |= set(w)
        pairs.update(zip(w[:-1], w[1:]))
    ctx = Counter()
    for (w1, _), c in pairs.items():
        ctx[w1] += c
    v = len(vocab)
    exp = []
    for i, t in enumerate(texts):
        w = t.split()
        bgs = list(zip(w[:-1], w[1:]))
        if not bgs:
            continue
        lps = [np.log2((pairs.get(bg, 0) + 1.0)
                       / (ctx.get(bg[0], 0) + v)) for bg in bgs]
        exp.append((i, len(bgs), sum(pairs.get(bg, 0) == 0 for bg in bgs),
                    float(np.mean(lps))))
    ref = pd.DataFrame(exp, columns=["doc_id", "n_bigrams",
                                     "oov_bigrams", "logprob2"])
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_bigrams"].tolist() == ref["n_bigrams"].tolist()
    assert got["oov_bigrams"].tolist() == ref["oov_bigrams"].tolist()
    np.testing.assert_allclose(got["logprob2"], ref["logprob2"], rtol=1e-12)


def test_zscore_by_group_matches_naive():
    from pyrdf2vec_ray.ops.agg import zscore_by_group

    ds = _scored_ds(n=300, groups=4, seed=9)
    got = (to_table(zscore_by_group(ds, "grp", "score", id_col="id"))
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = ds.to_pandas().sort_values("id").reset_index(drop=True)
    mu = ref.groupby("grp")["score"].transform("mean")
    sd = ref.groupby("grp")["score"].transform("std")
    expect = ((ref["score"] - mu) / sd).where(sd > 0, 0.0)
    np.testing.assert_allclose(got["zscore"], expect, rtol=1e-10)


def test_zscore_degenerate_groups():
    from pyrdf2vec_ray.ops.agg import zscore_by_group

    ds = ray.data.from_arrow(pa.table({
        "grp": pa.array(["a", "b", "b", "c", "c"]),
        "id": pa.array(range(5), pa.int64()),
        "v": pa.array([7, 3, 3, 1, 9], pa.int64()),
    }))
    got = (to_table(zscore_by_group(ds, "grp", "v", id_col="id"))
           .to_pandas().sort_values("id").reset_index(drop=True))
    # singleton group and zero-variance group -> 0.0
    assert got.loc[0, "zscore"] == 0.0
    assert got.loc[1, "zscore"] == 0.0 and got.loc[2, "zscore"] == 0.0
    np.testing.assert_allclose(
        got.loc[[3, 4], "zscore"],
        [-0.7071067811865475, 0.7071067811865475],
    )


def _join_sides():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
        "shared": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })).repartition(2)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 2, 3, 4], pa.int64()),
        "rv": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
        "shared": pa.array([7, 8, 9, 6], pa.int64()),
    })).repartition(2)
    return left, right


def test_hash_join_inner_matches_pandas():
    from pyrdf2vec_ray.ops.join import hash_join

    left, right = _join_sides()
    got = (to_table(hash_join(left, right, on=["k"]))
           .to_pandas()
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    ref = (left.to_pandas()
           .merge(right.to_pandas().rename(
               columns={"shared": "shared_r"}), on="k", how="inner")
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)]
    )
    # 2x2 match on k=2 -> 4 rows, plus k=3 -> 5 total
    assert len(got) == 5


def test_hash_join_left_keeps_unmatched():
    from pyrdf2vec_ray.ops.join import hash_join

    left, right = _join_sides()
    got = to_table(
        hash_join(left, right.filter(lambda r: r["k"] == 3), on=["k"],
                  how="left")
    ).to_pandas()
    assert len(got) == 5
    assert got[got["k"] == 3]["rv"].notna().all()
    assert got[got["k"] != 3]["rv"].isna().all()


def test_hash_join_left_uniform_dtype_across_buckets():
    """Left-join blocks must share ONE dtype per right column whether a
    bucket had unmatched rows (nulls) or was fully matched — mixed
    int64/float64 blocks crash downstream dtype-strict consumers."""
    import numpy as np
    import pandas as pd
    import ray.data

    from pyrdf2vec_ray.ops.join import hash_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(64, dtype=np.int64),
                      "lv": np.arange(64, dtype=np.int64)})
    )
    # right side matches only even keys: some buckets all-match, some mix
    right = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(0, 64, 2, dtype=np.int64),
                      "rv": np.arange(32, dtype=np.int64)})
    )
    out = hash_join(left, right, on=["k"], how="left", num_buckets=8)
    frames = [b for b in out.iter_batches(batch_format="pandas")]
    dtypes = {str(f["rv"].dtype) for f in frames if len(f)}
    assert dtypes == {"Int64"}
    df = pd.concat(frames)
    assert len(df) == 64
    assert df[df["k"] % 2 == 0]["rv"].notna().all()
    assert df[df["k"] % 2 == 1]["rv"].isna().all()


def test_hash_semi_and_anti_join():
    from pyrdf2vec_ray.ops.join import hash_semi_join

    left, right = _join_sides()
    semi = to_table(hash_semi_join(left, right, on=["k"])).to_pandas()
    anti = to_table(
        hash_semi_join(left, right, on=["k"], anti=True)
    ).to_pandas()
    assert sorted(semi["k"].unique()) == [2, 3]
    assert len(semi) == 3          # k=2 twice, k=3 once; no multiplicity
    assert sorted(anti["k"]) == [1, 5]
    assert sorted(semi.columns) == sorted(anti.columns) == [
        "k", "lv", "shared"]


def test_sample_exact_per_group_deterministic_and_uniform():
    from pyrdf2vec_ray.ops.curate import sample_exact_per_group

    ds = _scored_ds(n=400, groups=4, seed=5).map_batches(
        lambda b: b.rename(columns={"id": "doc_id"}),
        batch_format="pandas",
    )
    a = (to_table(sample_exact_per_group(ds, 7, "grp", seed=3)).to_pandas()
         .sort_values(["grp", "rank"]).reset_index(drop=True))
    b = (to_table(sample_exact_per_group(ds.repartition(13), 7, "grp",
                                         seed=3)).to_pandas()
         .sort_values(["grp", "rank"]).reset_index(drop=True))
    # identical under any partitioning
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("grp").size() == 7).all()
    # different seed -> (almost surely) different selection
    c = to_table(sample_exact_per_group(ds, 7, "grp", seed=4)).to_pandas()
    assert set(map(tuple, a[["grp", "doc_id"]].to_numpy())) != set(
        map(tuple, c[["grp", "doc_id"]].to_numpy()))


def test_approx_quantiles_within_dkw_bound():
    from pyrdf2vec_ray.ops.agg import (
        approx_quantiles_by_sample,
        grouped_quantiles,
    )

    ds = _scored_ds(n=2000, groups=2, seed=17).map_batches(
        lambda b: b.rename(columns={"id": "doc_id"}),
        batch_format="pandas",
    )
    k = 256
    approx = (to_table(approx_quantiles_by_sample(
        ds, "grp", "score", id_col="doc_id", qs=(0.5,), k=k, seed=1))
        .to_pandas().set_index("grp")["score"])
    full = ds.to_pandas()
    # DKW at 95%: rank error <= sqrt(ln(2/0.05)/(2k)) ~ 0.085
    eps = np.sqrt(np.log(2 / 0.05) / (2 * k))
    for g, sub in full.groupby("grp"):
        vals = np.sort(sub["score"].to_numpy())
        lo = vals[max(0, int(np.ceil(len(vals) * (0.5 - eps))) - 1)]
        hi = vals[min(len(vals) - 1,
                      int(np.ceil(len(vals) * (0.5 + eps))) - 1)]
        assert lo <= approx[g] <= hi, (g, lo, approx[g], hi)


def test_interleave_sources_schedule_properties():
    from pyrdf2vec_ray.ops.curate import interleave_sources

    n = 600
    rng = np.random.RandomState(2)
    src = [f"s{i}" for i in rng.randint(0, 3, n)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(src),
    })).repartition(5)
    w = {"s0": 3, "s1": 2, "s2": 1}
    out = (to_table(interleave_sources(ds, w, seed=7)).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    # ranks are a permutation of 1..n
    assert out["rank"].tolist() == list(range(1, n + 1))
    # WFQ smoothness: in every prefix, each still-unexhausted source's
    # count stays within 1 of its weighted share of served virtual time
    c = {s: 6 // w[s] for s in w}
    for m in (30, 60, 120, 300):
        head = out.head(m)
        vmax = head["v"].max()
        for s in w:
            n_s = (out["source"] == s).sum()
            expect = min(n_s, vmax // c[s])
            got = (head["source"] == s).sum()
            assert abs(got - expect) <= 1, (m, s, got, expect)
    # repartition-stable
    out2 = (to_table(interleave_sources(ds.repartition(11), w, seed=7))
            .to_pandas().sort_values("rank").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_ecdf_by_group_matches_pandas():
    from pyrdf2vec_ray.ops.agg import ecdf_by_group

    ds = _scored_ds(n=400, groups=4, seed=23).map_batches(
        lambda b: b.rename(columns={"id": "doc_id"}),
        batch_format="pandas",
    )
    got = (to_table(ecdf_by_group(ds, "grp", "score", id_col="doc_id"))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    expect = (ref.groupby("grp")["score"]
              .rank(method="min").sub(1)
              / ref.groupby("grp")["score"].transform("size").sub(1)
              .clip(lower=1))
    np.testing.assert_allclose(got["pct_rank"], expect, rtol=1e-12)
    # single-row group convention
    one = ray.data.from_arrow(pa.table({
        "grp": pa.array(["x"]), "doc_id": pa.array([1], pa.int64()),
        "score": pa.array([5], pa.int64())}))
    o = to_table(ecdf_by_group(one, "grp", "score",
                               id_col="doc_id")).to_pandas()
    assert o["pct_rank"].tolist() == [0.0]


def test_funnel_strict_ordering():
    from pyrdf2vec_ray.ops.events import funnel

    rows = [
        # u1 completes all three in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE first view -> stalls at stage 1
        (2, "click", 5), (2, "view", 10),
        # u3: click at same instant as view (not strictly after) -> 1
        (3, "view", 10), (3, "click", 10),
        # u4: only purchase -> 0 (never saw step 1)
        (4, "purchase", 10),
        # u5: earliest view disqualifies an early click, later click ok
        (5, "click", 1), (5, "view", 2), (5, "click", 3),
        (5, "purchase", 2),  # purchase BEFORE the click -> stage 2
    ]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(
            pd.to_datetime([r[2] for r in rows], unit="s")),
    })).repartition(3)
    got = (to_table(funnel(ev, ["view", "click", "purchase"]))
           .to_pandas().sort_values("user_id"))
    assert dict(zip(got["user_id"], got["stage_reached"])) == {
        1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_retention_cohorts_matches_naive():
    from pyrdf2vec_ray.ops.events import retention_cohorts

    # u1 cohort 0 active periods {0,8,25}; u2 cohort 3 only; u3
    # cohort 9 active {9,17}
    rows = [(1, 0), (1, 8), (1, 25), (2, 3), (3, 9), (3, 17)]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime(
            [r[1] * 604800 + 42 for r in rows], unit="s")),
    })).repartition(2)
    got = (to_table(retention_cohorts(ev)).to_pandas()
           .sort_values(["cohort", "k"]).reset_index(drop=True))
    expect = pd.DataFrame(
        {"cohort": [0, 0, 0, 3, 9, 9], "k": [0, 8, 25, 0, 0, 8],
         "users": [1, 1, 1, 1, 1, 1]})
    pd.testing.assert_frame_equal(
        got.astype("int64"), expect.astype("int64"))


def test_normalize_text_edge_cases():
    from pyrdf2vec_ray.ops.text import normalize_text

    texts = ["  Foo\t\tBAR \n baz  ", "a\x00b\x1fc", "", "ALREADY ok"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts)}))
    got = (to_table(normalize_text(ds)).to_pandas()
           .sort_values("doc_id")["text"].tolist())
    assert got == ["foo bar baz", "abc", "", "already ok"]


def test_filter_by_group_quantile_sides():
    from pyrdf2vec_ray.ops.agg import filter_by_group_quantile

    ds = _scored_ds(n=200, groups=3, seed=31)
    above = to_table(filter_by_group_quantile(
        ds, "grp", "score", 0.5)).to_pandas()
    below = to_table(filter_by_group_quantile(
        ds, "grp", "score", 0.5, keep="below")).to_pandas()
    full = ds.to_pandas()
    assert len(above) + len(below) == len(full)
    for g, sub in full.groupby("grp"):
        v = np.sort(sub["score"].to_numpy())
        med = v[max(0, int(np.ceil(len(v) * 0.5)) - 1)]
        assert (above[above["grp"] == g]["score"] >= med).all()
        assert (below[below["grp"] == g]["score"] < med).all()


def test_budget_sample_matches_naive_and_separator_collision():
    """Covers the numpy/pandas NUL-separator trap directly: groups
    'g1' and 'g11' with hash-part ids that concatenate ambiguously
    must not share base offsets."""
    from pyrdf2vec_ray.ops.curate import budget_sample, splitmix64

    rng = np.random.RandomState(4)
    n = 400
    grp = np.where(rng.rand(n) < 0.5, "g1", "g11")
    w = rng.randint(1, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(grp),
        "n_tokens": pa.array(w),
    })).repartition(4)
    budget = 300
    got = (to_table(budget_sample(ds, budget, weight_col="n_tokens",
                                  seed=9)).to_pandas()
           .sort_values(["source", "cum"]).reset_index(drop=True))
    # naive reference
    h = splitmix64(np.arange(n, dtype=np.int64).view(np.uint64)
                   ^ np.uint64(9)) >> np.uint64(1)
    df = pd.DataFrame({"source": grp, "doc_id": range(n),
                       "n_tokens": w, "h": h})
    ref_rows = []
    for g, sub in df.groupby("source"):
        sub = sub.sort_values(["h", "doc_id"])
        cum = sub["n_tokens"].cumsum()
        keep = cum <= budget
        for (_, r), c in zip(sub[keep].iterrows(), cum[keep]):
            ref_rows.append((g, r["doc_id"], r["n_tokens"], c))
    ref = (pd.DataFrame(ref_rows, columns=["source", "doc_id",
                                           "n_tokens", "cum"])
           .sort_values(["source", "cum"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n_tokens": "int64",
                    "cum": "int64"}), ref.astype(
            {"doc_id": "int64", "n_tokens": "int64", "cum": "int64"}))
    assert (got.groupby("source")["cum"].max() <= budget).all()
