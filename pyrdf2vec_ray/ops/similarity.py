"""Similarity search over an embedding column (task brief).

- ``knn_bruteforce``: exact top-k cosine — the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul against it, and
  per-query global top-k is a final small merge (map_batches partial
  top-k → driver heap merge).  This is the baseline and the oracle.
- ``knn_ivf``: IVF-style scale path — k-means-ish coarse centroids
  (seed-fixed), batches route vectors to their nearest centroid bucket,
  queries probe the ``nprobe`` closest buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1
    return v / n


def knn_bruteforce(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k: returns (query_id, neighbor_id, cos) rows,
    k per query, ordered by (query_id, -cos, neighbor_id)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = q @ v.T                                   # (nq, nb)
        kk = min(k, sims.shape[1])
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(q)):
            # argpartition alone keeps an ARBITRARY subset when cosine ties
            # straddle the k boundary (duplicate vectors); a full
            # (-cos, neighbor_id) lexsort is exact and matches the SQL
            # oracle's row_number tie-break
            order = np.lexsort((ids, -sims[qi]))[:kk]
            rows_q.extend([qi] * kk)
            rows_n.extend(ids[order])
            rows_s.extend(sims[qi, order])
        return pd.DataFrame(
            {"qi": rows_q, "neighbor_id": rows_n, "cos": rows_s}
        )

    partials = emb.map_batches(
        partial_topk, batch_format="pandas", batch_size=8192
    ).to_pandas()
    out_q, out_n, out_s = [], [], []
    for qi, group in partials.groupby("qi"):
        g = group.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        out_q.extend([int(query_ids[qi])] * len(g))
        out_n.extend(g["neighbor_id"].astype("int64"))
        out_s.extend(g["cos"])
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(np.asarray(out_s, dtype=np.float64)),
        }
    )


def knn_ivf(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    sample_size: int = 4096,
) -> pa.Table:
    """IVF approximate top-k: sample-fit centroids once (driver, on a
    corpus-wide sample), bucket vectors by nearest centroid (one
    shuffle), search only the nprobe closest buckets per query.

    The centroid sample is a deterministic hash-stride over the id
    column (every row whose Knuth-hashed id falls in the stride), NOT
    the first `sample_size` rows — `limit()` would bias the fit on
    corpora that are ordered/clustered on disk and silently degrade
    recall.  The exact `knn_bruteforce` is the oracle either way."""
    n_total = emb.count()
    stride = max(1, n_total // sample_size)
    if stride == 1:
        sample_src = emb.limit(sample_size).to_pandas()
    else:
        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].to_numpy().astype(np.uint64)
            keep = (ids * np.uint64(2654435761) & np.uint64(0xFFFFFFFF)) % stride == 0
            return batch[keep]

        sample_src = (
            emb.map_batches(pick, batch_format="pandas", batch_size=8192)
            .limit(sample_size)
            .to_pandas()
        )
    sample = np.stack(sample_src[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(5):  # a few Lloyd iterations on the sample
        d = _normalize(sample) @ _normalize(cents).T
        assign = d.argmax(1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(0)
    cn = _normalize(cents)
    c_ref = ray.put(cn)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        b = (v @ c.T).argmax(1)
        return pd.DataFrame(
            {id_col: batch[id_col], "bucket": b.astype("int64"),
             vec_col: list(np.stack(batch[vec_col].to_numpy()))}
        )

    bucketed = emb.map_batches(bucketize, batch_format="pandas", batch_size=8192)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]    # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    q_ref = ray.put((qn, probe_sets))

    def search(group: pd.DataFrame) -> pd.DataFrame:
        q, probes = ray.get(q_ref)
        bucket = int(group["bucket"].iloc[0])
        qi_list = [i for i, s in enumerate(probes) if bucket in s]
        if not qi_list:
            return pd.DataFrame({"qi": [], "neighbor_id": [], "cos": []})
        ids = group[id_col].to_numpy()
        v = _normalize(np.stack(group[vec_col].to_numpy()).astype(np.float64))
        sims = q[qi_list] @ v.T
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {"qi": [], "neighbor_id": [], "cos": []}
        for r, qi in enumerate(qi_list):
            rows["qi"].extend([qi] * kk)
            rows["neighbor_id"].extend(ids[top[r]])
            rows["cos"].extend(sims[r, top[r]])
        return pd.DataFrame(rows)

    partials = bucketed.groupby("bucket").map_groups(
        search, batch_format="pandas"
    ).to_pandas()
    out_q, out_n, out_s = [], [], []
    for qi, group in partials.groupby("qi"):
        g = group.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        out_q.extend([int(query_ids[int(qi)])] * len(g))
        out_n.extend(g["neighbor_id"].astype("int64"))
        out_s.extend(g["cos"])
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(np.asarray(out_s, dtype=np.float64)),
        }
    )
