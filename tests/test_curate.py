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
