"""Curation operators: splitmix64 split assignment and benchmark
decontamination (exact + n-gram)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from pyrdf2vec_ray.ops.curate import (
    assign_splits,
    assign_splits_sql,
    decontaminate,
    decontaminate_ngram,
    sample_by_hash,
    splitmix64,
    splitmix64_py,
)


def _docs_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_splitmix64_matches_scalar_reference():
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 2**63 - 1, size=200, dtype=np.int64)
    xs = np.concatenate([xs, [0, 1, 2**62, 2**63 - 1]]).astype(np.int64)
    v = splitmix64(xs.view(np.uint64))
    for x, got in zip(xs, v):
        assert int(got) == splitmix64_py(int(x))


def test_splitmix64_sql_parity():
    """The DuckDB fragment reproduces numpy splitmix64 bit-for-bit,
    including the xor-with-seed pre-step."""
    ids = np.array([0, 1, 5, 12345, 2**62, 2**63 - 1], dtype=np.int64)
    h = splitmix64(ids.view(np.uint64) ^ np.uint64(7))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids}))
    out = con.sql(assign_splits_sql(seed=7)).df().sort_values("doc_id")
    want = (h % np.uint64(10000)).astype(np.int64)
    got = out.set_index("doc_id")["bucket"]
    for i, w in zip(ids, want):
        assert got[i] == w


def test_assign_splits_deterministic_and_proportional():
    ids = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    out = assign_splits(ray.data.from_pandas(ids), seed=0).to_pandas()
    assert len(out) == 5000
    assert set(out.columns) == {"doc_id", "bucket", "split"}
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # stable under re-run and re-partitioning
    again = (
        assign_splits(ray.data.from_pandas(ids).repartition(7), seed=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), again
    )
    # a different seed moves docs between splits
    other = assign_splits(ray.data.from_pandas(ids), seed=1).to_pandas()
    merged = out.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] != merged["split_b"]).any()


def test_assign_splits_rejects_bad_weights():
    with pytest.raises(ValueError):
        assign_splits(
            _docs_ds({"doc_id": [1]}), splits=(("a", 0.5), ("b", 0.2))
        )


def test_decontaminate_exact_removes_benchmark_content():
    docs = _docs_ds(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["aa bb", "cc dd", "aa bb", "ee ff", "gg hh"],
        }
    )
    bench = _docs_ds({"doc_id": [100], "text": ["aa bb"]})
    out = decontaminate(docs, bench).to_pandas()
    # both copies of the benchmark text are dropped, others survive
    assert sorted(out["doc_id"]) == [2, 4, 5]
    assert set(out.columns) == {"doc_id", "text_hash"}


def test_decontaminate_empty_benchmark_keeps_all():
    docs = _docs_ds({"doc_id": [1, 2], "text": ["a", "b"]})
    bench = _docs_ds({"doc_id": [9], "text": ["zz"]})
    out = decontaminate(docs, bench).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_decontaminate_ngram_catches_partial_overlap():
    bench_text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = _docs_ds(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                bench_text,  # exact copy -> removed
                "x " + " ".join(f"t{i}" for i in range(8)) + " y",  # embeds an 8-gram
                "u0 u1 u2 u3 u4 u5 u6 u7 u8",  # disjoint -> survives
                "t0 t1 t2",  # short, not a full shingle of bench -> survives
            ],
        }
    )
    bench = _docs_ds({"doc_id": [100], "text": [bench_text]})
    out = decontaminate_ngram(docs, bench, window=8).to_pandas()
    assert sorted(out["doc_id"]) == [3, 4]


def test_decontaminate_ngram_short_doc_whole_text_match():
    """Docs shorter than the window match on their whole text — a short
    benchmark doc removes its exact short copies only."""
    docs = _docs_ds(
        {"doc_id": [1, 2], "text": ["hello world", "hello there"]}
    )
    bench = _docs_ds({"doc_id": [100], "text": ["hello world"]})
    out = decontaminate_ngram(docs, bench, window=8).to_pandas()
    assert sorted(out["doc_id"]) == [2]


def test_sample_by_hash_flat_rate_matches_sql():
    ids = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    out = sample_by_hash(ray.data.from_pandas(ids), rate=0.3, seed=5).to_pandas()
    # deterministic: re-run identical
    again = sample_by_hash(ray.data.from_pandas(ids), rate=0.3, seed=5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    assert abs(len(out) / 2000 - 0.3) < 0.04
    from pyrdf2vec_ray.ops.curate import sample_by_hash_sql

    con = duckdb.connect()
    con.register("documents", ids)
    sql = sample_by_hash_sql(rate=0.3, seed=5)
    want = sorted(con.sql(sql).df()["doc_id"])
    assert sorted(out["doc_id"]) == want


def test_sample_by_hash_stratified_rates():
    n = 3000
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "xx"], size=n),
        }
    )
    out = sample_by_hash(
        ray.data.from_pandas(df),
        rates_by="lang",
        rates={"en": 0.8, "de": 0.2},
        default_rate=1.0,
        seed=3,
    ).to_pandas()
    kept = out.groupby("lang").size()
    tot = df.groupby("lang").size()
    assert abs(kept["en"] / tot["en"] - 0.8) < 0.06
    assert abs(kept["de"] / tot["de"] - 0.2) < 0.06
    assert kept["xx"] == tot["xx"]  # default rate 1.0 keeps all


def test_sample_by_hash_arg_validation():
    ds = _docs_ds({"doc_id": [1]})
    with pytest.raises(ValueError):
        sample_by_hash(ds)  # neither
    with pytest.raises(ValueError):
        sample_by_hash(ds, rate=0.5, rates={"en": 1.0}, rates_by="lang")
    with pytest.raises(ValueError):
        sample_by_hash(ds, rates={"en": 1.0})  # rates without column


def test_pack_sequences_matches_serial_cumsum():
    from pyrdf2vec_ray.ops.curate import pack_sequences

    rng = np.random.RandomState(1)
    n = 400
    texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 40))) for _ in range(n)]
    ids = rng.permutation(np.arange(0, 5 * n, 5, dtype=np.int64))  # sparse, shuffled
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})
    ).repartition(7)
    out = (
        pack_sequences(docs, budget=64, num_parts=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # serial reference: order by doc_id, exclusive cumsum
    ref = pd.DataFrame(
        {"doc_id": ids, "n_tokens": [len(t.split()) for t in texts]}
    ).sort_values("doc_id").reset_index(drop=True)
    cum = ref["n_tokens"].cumsum().shift(fill_value=0)
    ref["seq_id"] = cum // 64
    ref["seq_offset"] = cum % 64
    pd.testing.assert_frame_equal(out, ref.astype({"seq_id": "int64", "seq_offset": "int64"}))


def test_pack_sequences_rejects_bad_budget():
    from pyrdf2vec_ray.ops.curate import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_docs_ds({"doc_id": [1], "text": ["a"]}), budget=0)


def test_shuffle_order_matches_serial_and_sql():
    from pyrdf2vec_ray.ops.curate import shuffle_order, shuffle_order_sql

    rng = np.random.RandomState(4)
    ids = rng.permutation(np.arange(0, 3000, 3, dtype=np.int64))
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(5)
    out = (
        shuffle_order(docs, seed=13)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(ids)
    # ranks are a permutation of 0..n-1
    assert sorted(out["rank"]) == list(range(len(ids)))
    # serial reference: sort by (hash, id)
    h = splitmix64(np.sort(ids).view(np.uint64) ^ np.uint64(13))
    order = np.lexsort((np.sort(ids), h))
    ref = pd.DataFrame({"doc_id": np.sort(ids)[order]})
    ref["rank"] = np.arange(len(ids))
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    # SQL parity
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids}))
    sql_df = (
        con.sql(shuffle_order_sql(seed=13))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, sql_df.astype({"rank": "int64"}))


def test_sample_by_hash_rejects_rate_with_rates_by():
    with pytest.raises(ValueError):
        sample_by_hash(
            _docs_ds({"doc_id": [1], "lang": ["en"]}), rate=0.5, rates_by="lang"
        )


def test_pack_sequences_empty_and_negative_keys():
    from pyrdf2vec_ray.ops.curate import pack_sequences

    empty = _docs_ds({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype=str)})
    out = pack_sequences(empty, budget=64)
    # Ray 2.49 to_pandas() drops schema on zero-row datasets; the
    # Dataset-level schema is what downstream stages consume
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "n_tokens", "seq_id", "seq_offset"]

    bad = _docs_ds({"doc_id": [-1, 2], "text": ["a", "b"]})
    with pytest.raises(Exception, match="non-negative"):
        pack_sequences(bad, budget=64).to_pandas()
