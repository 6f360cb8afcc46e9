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
