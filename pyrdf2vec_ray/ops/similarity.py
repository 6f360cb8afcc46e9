"""Similarity search over an embedding column (task brief).

- ``knn_bruteforce``: exact top-k cosine — the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul against it, the
  per-block partial top-k rows are tree-merged in ONE hash-bucket
  shuffle on the query id, and the driver receives exactly nq·k rows
  (never nq·k·n_blocks).  This is the baseline and the oracle.
- ``knn_ivf``: IVF-style scale path — coarse centroids fitted on a
  deterministic bottom-k-by-hash sample (no ``count()`` pass; corpus
  size for the sqrt-N centroid heuristic comes from the sample's
  k-minimum-values estimator), vectors route to their nearest centroid
  in one ``bucket_apply`` shuffle whose parallelism is the bucket count
  (NOT the centroid count), and queries probe the ``nprobe`` closest
  centroids only.

Partitioning assumptions at scale: the distributed merges key on the
query index, so nq queries spread across min(nq, num_buckets) reduce
tasks — batch large query sets rather than looping per query.  IVF
buckets co-locate whole centroids; a pathologically hot centroid (one
cell holding most of the corpus) should be split by raising
``n_centroids`` (sqrt-N default) before resorting to salting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..shuffle import bucket_apply, default_num_buckets
from .curate import splitmix64


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1
    return v / n


def _merge_topk(partials: ray.data.Dataset, k: int, nq: int) -> pd.DataFrame:
    """Tree-merge per-block partial top-k rows: one bucket shuffle on qi,
    per-bucket vectorized (-cos, neighbor_id) rank, driver sees nq*k rows."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["qi", "cos", "neighbor_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("qi", sort=False).head(k)

    merged = bucket_apply(
        partials,
        ["qi"],
        per_bucket,
        num_buckets=max(1, min(default_num_buckets(), nq)),
        batch_format="pandas",
    )
    return merged.to_pandas()


def _finalize(merged: pd.DataFrame, query_ids: np.ndarray, k: int) -> pa.Table:
    merged = merged.sort_values(
        ["qi", "cos", "neighbor_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    merged = merged.groupby("qi", sort=False).head(k)
    qid = np.asarray(query_ids, dtype=np.int64)[
        merged["qi"].to_numpy().astype(np.int64)
    ]
    return pa.table(
        {
            "query_id": pa.array(qid, pa.int64()),
            "neighbor_id": pa.array(
                merged["neighbor_id"].to_numpy().astype(np.int64), pa.int64()
            ),
            "cos": pa.array(
                merged["cos"].to_numpy().astype(np.float64), pa.float64()
            ),
        }
    )


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
    )
    merged = _merge_topk(partials, k, nq=len(qn))
    return _finalize(merged, query_ids, k)


def _fit_centroids(
    emb: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    n_centroids: int | None,
    seed: int,
    sample_size: int,
) -> np.ndarray:
    """Deterministic centroid fit with NO corpus count pass.

    Sample = the EXACT global bottom-``sample_size`` rows by
    splitmix64(id): each batch keeps its local bottom
    min(sample_size, len) — always a superset of that batch's share of
    the global bottom, so the result is deterministic and independent
    of batch/block boundaries — and a distributed sort+limit picks the
    global bottom.  The sort input is ≤ sample_size rows per 64k-row
    batch (~6%); for corpora ≥ ~10^6 rows, pre-filtering with a static
    hash mask (h < 2^64/256 keeps the bottom-k intact whp) bounds it
    further — documented knob, not default.  Corpus size for the
    sqrt-N centroid default comes from the sample itself
    (k-minimum-values estimate: n ≈ (k-1)·2^64 / h_k), so no full pass
    is ever spent on counting.
    """

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        h = splitmix64(ids)
        order = np.argsort(h, kind="stable")[:sample_size]
        out = batch.iloc[order][[vec_col]].copy()
        # uint64 hash stored shifted into int64 (order-preserving) so
        # Arrow sort handles it natively
        out["_h"] = (h[order] >> np.uint64(1)).astype(np.int64)
        return out

    samp = (
        emb.map_batches(pick, batch_format="pandas", batch_size=65536)
        .sort("_h")
        .limit(sample_size)
        .to_pandas()
    )
    sample = np.stack(samp[vec_col].to_numpy()).astype(np.float64)
    if n_centroids is None:
        h_k = float(samp["_h"].max()) * 2.0 + 1.0   # undo the >>1
        n_est = max(
            len(sample),
            int((len(sample) - 1) * (2.0 ** 64) / max(h_k, 1.0)),
        )
        n_centroids = max(16, int(np.sqrt(n_est)))
    rng = np.random.RandomState(seed)
    cents = sample[
        rng.choice(
            len(sample), size=min(n_centroids, len(sample)), replace=False
        )
    ]
    for _ in range(5):  # a few Lloyd iterations on the sample
        d = _normalize(sample) @ _normalize(cents).T
        assign = d.argmax(1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(0)
    return cents


def knn_ivf(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    sample_size: int = 4096,
) -> pa.Table:
    """IVF approximate top-k.  ``n_centroids=None`` sizes the coarse
    index at sqrt(N) (KMV-estimated N — see ``_fit_centroids``);
    ``nprobe >= n_centroids`` degenerates to exact brute force, which is
    how the oracle value-checks this pipeline end to end.

    Shape at scale: routing + search is ONE ``bucket_apply`` shuffle
    whose task count is the bucket count (CPU/data sized), not the
    centroid count; each reduce task searches every probed centroid that
    hashed to it, vectorized.  Partial top-k per (query, bucket) then
    tree-merges on the query id, so the driver sees nq·k rows.
    """
    cents = _fit_centroids(emb, id_col, vec_col, n_centroids, seed, sample_size)
    cn = _normalize(cents)
    c_ref = ray.put(cn)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        vecs = np.stack(batch[vec_col].to_numpy())
        b = (_normalize(vecs.astype(np.float64)) @ c.T).argmax(1)
        return pd.DataFrame(
            {id_col: batch[id_col], "cent": b.astype("int64"),
             vec_col: list(vecs)}
        )

    bucketed = emb.map_batches(bucketize, batch_format="pandas", batch_size=8192)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe_eff = min(nprobe, len(cn))
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe_eff]  # (nq, nprobe)
    # centroid -> array of probing query indices, built once and broadcast
    cent_to_qi: dict[int, np.ndarray] = {}
    for qi in range(len(qn)):
        for c in probe[qi]:
            cent_to_qi.setdefault(int(c), []).append(qi)
    cent_to_qi = {c: np.asarray(v, dtype=np.int64) for c, v in cent_to_qi.items()}
    q_ref = ray.put((qn, cent_to_qi))

    def search(g: pd.DataFrame) -> pd.DataFrame:
        q, probing = ray.get(q_ref)
        frames = []
        for cent, sub in g.groupby("cent", sort=False):
            qi_list = probing.get(int(cent))
            if qi_list is None:
                continue
            ids = sub[id_col].to_numpy()
            v = _normalize(np.stack(sub[vec_col].to_numpy()).astype(np.float64))
            sims = q[qi_list] @ v.T
            kk = min(k, sims.shape[1])
            rows_q, rows_n, rows_s = [], [], []
            for r, qi in enumerate(qi_list):
                order = np.lexsort((ids, -sims[r]))[:kk]
                rows_q.extend([int(qi)] * kk)
                rows_n.extend(ids[order])
                rows_s.extend(sims[r, order])
            frames.append(
                pd.DataFrame({"qi": rows_q, "neighbor_id": rows_n, "cos": rows_s})
            )
        if not frames:
            return pd.DataFrame(
                {"qi": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    partials = bucket_apply(
        bucketed, ["cent"], search, batch_format="pandas",
    )
    merged = _merge_topk(partials, k, nq=len(qn))
    return _finalize(merged, query_ids, k)


def cluster_assign(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> ray.data.Dataset:
    """(id, cluster): nearest-centroid assignment under cosine — the
    routing step of IVF search and SemDeDup-style cluster-then-dedup
    (Abbas et al. 2023) exposed standalone, so callers can partition a
    corpus by semantic cluster with THEIR centroids (kmeans fit,
    taxonomy anchors, ...).

    The centroid matrix is small by definition: normalized once on the
    driver, ray.put ONCE, zero-copy numpy in every task; per batch the
    work is a single (B, d) @ (d, K) matmul + argmax.  Streaming map,
    NO shuffle — the output co-partitions with the input, which is
    what downstream per-cluster ops bucket on.  Ties (equal cosine)
    resolve to the LOWEST cluster index, matching the SQL oracle's
    row_number ORDER BY sim DESC, cluster ASC.  ``keep_vec`` carries
    the embedding through for consumers that need it next to the
    cluster id (e.g. :func:`pyrdf2vec_ray.ops.dedup.semdedup`)."""
    import ray as _ray

    C = _normalize(np.asarray(centroids, dtype=np.float64))
    if C.ndim != 2 or not len(C):
        raise ValueError("centroids must be a non-empty (K, d) matrix")
    ref = _ray.put(np.ascontiguousarray(C.T))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        Ct = _ray.get(ref)
        V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(
            np.float64))
        cl = (V @ Ct).argmax(axis=1)
        out = {id_col: batch[id_col].to_numpy(),
               "cluster": cl.astype(np.int64)}
        if keep_vec:
            out[vec_col] = batch[vec_col].reset_index(drop=True)
        return pd.DataFrame(out)

    return emb.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pandas"
    )


def centroid_update(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """One k-means M-step over the corpus: route every vector to its
    nearest centroid (cosine, ties to the lowest index — the
    :func:`cluster_assign` contract) and emit the new centroids as the
    per-cluster per-dimension mean, long-form ``(cluster, dim, val)``.
    Chained with :func:`cluster_assign` this is Lloyd's iteration; run
    it to fixpoint for distributed k-means, or once to refresh an IVF
    codebook.

    Scale shape: assignment is a broadcast matmul per batch; the mean
    is a per-batch COMBINER (per-cluster vector sum + count, so the
    exchange carries k·d floats per block, never the corpus) followed
    by one tiny cluster-bucket reduce.  No full-payload shuffle, no
    driver collect."""
    import ray as _ray

    from pyrdf2vec_ray.shuffle import bucket_apply

    C = _normalize(np.asarray(centroids, dtype=np.float64))
    if C.size == 0:
        raise ValueError("centroids must be non-empty")
    c_ref = _ray.put(C.T)
    d = C.shape[1]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        Ct = _ray.get(c_ref)
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(V, axis=1, keepdims=True)
        norm[norm == 0] = 1
        cl = ((V / norm) @ Ct).argmax(axis=1)
        uniq, inv = np.unique(cl, return_inverse=True)
        sums = np.zeros((len(uniq), V.shape[1]))
        np.add.at(sums, inv, V)
        counts = np.bincount(inv).astype(np.int64)
        return pd.DataFrame(
            {"cluster": uniq.astype(np.int64),
             "n": counts, "s": list(sums)})

    parts = emb.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pandas")

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cl, grp in g.groupby("cluster"):
            s = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
            n = int(grp["n"].sum())
            outs.append(pd.DataFrame(
                {"cluster": np.int64(cl),
                 "dim": np.arange(d, dtype=np.int64),
                 "val": s / n}))
        if not outs:
            return pd.DataFrame(
                {"cluster": pd.array([], dtype="int64"),
                 "dim": pd.array([], dtype="int64"),
                 "val": pd.array([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return bucket_apply(parts, ["cluster"], reduce_bucket,
                        batch_format="pandas")


def quantize_fit(
    emb: ray.data.Dataset, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus — the fit half of
    scalar quantization.  Per-batch combiner emits ONE row of two
    d-vectors per block; the driver merges n_blocks tiny partials
    (d·2 floats each), never the corpus.  Exact, deterministic: min
    and max pick existing float32 values, so both engines agree
    bit-for-bit."""
    def part(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({"lo": [V.min(axis=0)],
                             "hi": [V.max(axis=0)]})

    rows = emb.select_columns([vec_col]).map_batches(
        part, batch_format="pandas").take_all()
    lo = np.min(np.stack([np.asarray(r["lo"]) for r in rows]), axis=0)
    hi = np.max(np.stack([np.asarray(r["hi"]) for r in rows]), axis=0)
    return lo, hi


def scalar_quantize(
    emb: ray.data.Dataset,
    lo: np.ndarray,
    hi: np.ndarray,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Scalar (per-dimension min-max) quantization of an embedding
    column to ``bits``-bit codes — the standard 4× memory cut before
    ANN indexing (IVF codebooks store uint8 codes, not float32).
    ``code = clip(floor((v - lo) / (hi - lo) * (2^bits - 1)))``; a
    degenerate dimension (hi == lo) maps to code 0.

    Pure map — no shuffle, zero-copy friendly; (lo, hi) come from
    :func:`quantize_fit` (or a training split) and travel by closure
    (d floats, not a broadcast table).  All arithmetic is float64 with
    one expression shape, so an SQL engine evaluating the same
    expression reproduces every code exactly."""
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    levels = float((1 << bits) - 1)
    span = hi - lo
    safe = np.where(span == 0, 1.0, span)
    dead = span == 0

    def tx(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        q = np.floor((V - lo) / safe * levels)
        np.clip(q, 0, levels, out=q)
        q[:, dead] = 0
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "q": list(q.astype(np.int64))})

    return emb.select_columns([id_col, vec_col]).map_batches(
        tx, batch_format="pandas")


def kmeans_fit(
    emb: ray.data.Dataset,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    init: np.ndarray | None = None,
    sample_size: int = 4096,
) -> np.ndarray:
    """Full distributed k-means (Lloyd): deterministic init (the
    :func:`_fit_centroids` hash-bottom sample, or an explicit ``init``)
    followed by ``iters`` rounds of :func:`centroid_update`, stopping
    early at a fixpoint.  Returns the final ``(k, d)`` centroid matrix
    — the iterative ML-training loop (assign → mean → repeat) that
    :func:`cluster_assign` / :func:`knn_ivf` / semdedup consume as a
    codebook.

    Driver state per round is the k·d centroid table ONLY (the M-step
    reduce emits per-cluster means, combiner-bounded — see
    centroid_update); the corpus never leaves the cluster.  The input
    projection is materialized ONCE up front — deliberate: every Lloyd
    round re-reads it, and re-executing a lazy upstream chain per round
    would multiply the scan cost by ``iters`` (the iterative-reuse
    regime; same rationale as transitive_closure's per-round pins).

    Empty clusters keep their previous centroid (the standard
    keep-old convention, deterministic).  Assignment is cosine with
    ties to the lowest index; means are over RAW vectors (spherical
    assignment, Euclidean mean — the IVF-codebook convention used by
    cluster_assign)."""
    if init is None:
        C = _fit_centroids(emb, id_col, vec_col, k, seed, sample_size)
    else:
        C = np.asarray(init, dtype=np.float64)
    work = emb.select_columns([id_col, vec_col]).materialize()
    d = C.shape[1]
    for _ in range(int(iters)):
        upd = centroid_update(work, C, id_col, vec_col).to_pandas()
        newC = C.copy()
        cl = upd["cluster"].to_numpy().astype(np.int64)
        dim = upd["dim"].to_numpy().astype(np.int64)
        newC[cl, dim] = upd["val"].to_numpy(np.float64)
        if np.array_equal(newC, C):
            break
        C = newC
    return C


def pca_fit(
    emb: ray.data.Dataset,
    n_components: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA fit: ``(mean, components, explained_var)`` from
    one corpus pass — the whitening / dimensionality-reduction step an
    embedding pipeline runs before IVF bucketing or scalar
    quantization.  Sufficient statistics only: each batch emits
    ``(n, Σx, ΣxᵀX)`` — d + d² floats, combiner-bounded like
    :func:`centroid_update`'s M-step — the driver sums the per-block
    partials IN BLOCK ORDER (deterministic for a fixed input) and
    eigendecomposes the d×d covariance.  The corpus never collects;
    driver state is O(blocks·d²) partials then d².

    Eigenvector sign is fixed (largest-|component| coordinate made
    positive), so the basis is reproducible.  Covariance uses the
    population convention (divide by n).  Components are rows, sorted
    by descending eigenvalue."""
    from pyrdf2vec_ray.util import to_table

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"n": [len(V)], "s": [V.sum(axis=0)],
             "ss": [(V.T @ V).ravel()]})

    parts = to_table(
        emb.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pandas")).to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("empty input")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    d = s.shape[0]
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T
    # deterministic sign: the largest-|x| coordinate of each component
    # is made positive (ties broken by lowest index via argmax)
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def pca_transform(
    emb: ray.data.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Project every vector onto a fitted PCA basis: ``(id, proj)``
    with ``proj = components @ (x - mean)``.  Stateless broadcast
    matmul per batch (mean + components ride ``ray.put`` once), zero
    shuffles — the transform half of :func:`pca_fit`."""
    import ray as _ray

    ref = _ray.put((np.asarray(mean, np.float64),
                    np.asarray(components, np.float64).T))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m, ct = _ray.get(ref)
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        P = (V - m) @ ct
        return pd.DataFrame({id_col: batch[id_col], "proj": list(P)})

    return emb.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pandas")


def grouped_centroids(
    emb: ray.data.Dataset,
    group_col: str,
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-group per-dimension mean of an embedding column, long-form
    ``(group, dim, val)`` — the grouped vector aggregate behind class
    prototypes (prototypical networks), per-source/domain embedding
    drift monitors, and label-centroid seeding for
    :func:`cluster_assign` / SemDeDup-style cluster-then-dedup.

    Scale shape: a per-batch COMBINER (per-group float64 vector sum +
    count — each block contributes at most ``groups_in_block`` rows of
    k·d floats, never its row count) followed by ONE group-bucket
    reduce.  The exchange is bounded by ``n_blocks × n_groups × d``
    floats; no full-payload shuffle, no driver collect.  Group keys may
    be any hashable dtype (ints, strings) — the bucket shuffle hashes
    the key column directly."""
    from pyrdf2vec_ray.shuffle import bucket_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        codes, uniq = pd.factorize(batch[group_col], sort=True)
        sums = np.zeros((len(uniq), V.shape[1]))
        np.add.at(sums, codes, V)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {group_col: np.asarray(uniq), "n": counts, "s": list(sums)})

    parts = emb.select_columns([group_col, vec_col]).map_batches(
        partial, batch_format="pandas")

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, grp in g.groupby(group_col, sort=True):
            S = np.stack(grp["s"].to_numpy())
            s = S.sum(axis=0)
            n = int(grp["n"].sum())
            outs.append(pd.DataFrame(
                {group_col: key,
                 "dim": np.arange(S.shape[1], dtype=np.int64),
                 "val": s / n}))
        if not outs:
            return pd.DataFrame(
                {group_col: pd.array([], dtype=g[group_col].dtype),
                 "dim": pd.array([], dtype="int64"),
                 "val": pd.array([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return bucket_apply(parts, [group_col], reduce_bucket,
                        batch_format="pandas")


def centroid_similarity(
    emb: ray.data.Dataset,
    group_col: str,
    vec_col: str = "embedding",
) -> pa.Table:
    """Pairwise cosine between per-group centroids: ``(group_a,
    group_b, cos)`` for every unordered pair ``group_a < group_b`` —
    the K×K similarity matrix used to audit semantic overlap between
    labels/sources/domains (merge candidates, taxonomy confusion)
    before spending on per-document near-dup passes.

    Centroids come from :func:`grouped_centroids` (combiner + one
    bucket reduce); only the K·d centroid table — bounded by GROUP
    cardinality, never by corpus rows — is collected for the final
    K×K float64 matmul, which is driver-trivial by definition (a
    group census small enough to read is the product's whole point).
    Cosine is the one shared expression shape on both engines:
    ``sum(a·b) / (sqrt(sum(a²)) · sqrt(sum(b²)))`` in float64."""
    cent = grouped_centroids(emb, group_col, vec_col=vec_col).to_pandas()
    keys = np.asarray(sorted(cent[group_col].unique().tolist()))
    d = int(cent["dim"].max()) + 1 if len(cent) else 0
    M = np.zeros((len(keys), d))
    pos = {k: i for i, k in enumerate(keys)}
    M[cent[group_col].map(pos).to_numpy(),
      cent["dim"].to_numpy()] = cent["val"].to_numpy()
    dots = M @ M.T
    nrm = np.sqrt((M * M).sum(axis=1))
    ia, ib = np.triu_indices(len(keys), k=1)
    cos = dots[ia, ib] / (nrm[ia] * nrm[ib])
    return pa.table(
        {"group_a": keys[ia], "group_b": keys[ib], "cos": cos})


def pq_encode(
    emb: ray.data.Dataset,
    codebooks: np.ndarray,
    n_subspaces: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Product-quantization encoding (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each d-dim vector
    into ``n_subspaces`` contiguous sub-vectors and replace each with
    the id of its nearest codeword (Euclidean) from that subspace's
    slice of the shared ``codebooks`` matrix — the memory-compression
    step that turns a float corpus into ``n_subspaces`` bytes/vector
    for billion-scale ANN.  Output long-form ``(id, subspace, code)``;
    ties (equal distance) take the LOWEST code id, matching the SQL
    oracle's ``ORDER BY dist ASC, aid ASC`` row_number.

    ``codebooks`` is a (K, d) matrix of full-width anchor vectors —
    each subspace uses its own column slice (fit them with
    :func:`kmeans_fit` per subspace, or pass taxonomy anchors).  Small
    by definition: ``ray.put`` once, zero-copy in every task; per batch
    the work is ``n_subspaces`` (B, d/m) @ (d/m, K) matmuls + argmin.
    Streaming map, NO shuffle; the output co-partitions with the
    input."""
    import ray as _ray

    C = np.asarray(codebooks, dtype=np.float64)
    if C.ndim != 2 or not len(C):
        raise ValueError("codebooks must be a non-empty (K, d) matrix")
    d = C.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by {n_subspaces}")
    w = d // n_subspaces
    ref = _ray.put(np.ascontiguousarray(C))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        Cb = _ray.get(ref)
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        if V.shape[1] != d:
            raise ValueError(
                f"vector dim {V.shape[1]} != codebook dim {d}")
        ids = batch[id_col].to_numpy().astype(np.int64)
        out_id, out_s, out_c = [], [], []
        for s in range(n_subspaces):
            Vs = V[:, s * w:(s + 1) * w]
            Cs = Cb[:, s * w:(s + 1) * w]
            # squared L2 — argmin-equivalent to the oracle's distance
            d2 = ((Vs * Vs).sum(1)[:, None] - 2.0 * (Vs @ Cs.T)
                  + (Cs * Cs).sum(1)[None, :])
            out_id.append(ids)
            out_s.append(np.full(len(ids), s, dtype=np.int64))
            out_c.append(d2.argmin(axis=1).astype(np.int64))
        return pd.DataFrame(
            {id_col: np.concatenate(out_id),
             "subspace": np.concatenate(out_s),
             "code": np.concatenate(out_c)})

    return emb.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pandas")


def procrustes_align(
    src: ray.data.Dataset,
    dst: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int | None = None,
):
    """Orthogonal Procrustes alignment between two embedding SPACES:
    the rotation ``R = argmin_{RᵀR=I} ‖src·R − dst‖`` over the ids
    the two tables share — the standard fix when a retrained /
    incrementally-updated embedder (`embedders_dist` ``is_update``)
    lands in a rotated basis and downstream ANN / centroid state must
    keep working.  Returns ``(R, aligned)``: the d×d rotation and a
    Dataset of ALL src rows mapped through it.

    Schönemann 1966: ``R = U Vᵀ`` from the SVD of the d×d
    cross-covariance ``M = Σ srcᵢᵀ dstᵢ``.  Distributed shape: ONE
    co-partitioning id-bucket join of the two vector tables, per-batch
    d×d partial cross-products (combiner-bounded, the `pca_fit`
    sufficient-statistics discipline), driver-side SVD of the d×d sum
    (d², never corpus-scale), then a stateless broadcast matmul over
    the src stream.  No reflection guard is applied (proper SVD
    orthogonal map, determinant ±1) — Schönemann's exact optimum."""
    from pyrdf2vec_ray.ops.join import hash_join
    from pyrdf2vec_ray.util import to_table

    def side(ds, name):
        # vectors ship as float64 BYTES through the exchange (the
        # ops/dedup tobytes/frombuffer discipline) — binary columns
        # shuffle uniformly where per-block tensor/list inference
        # would not
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {id_col: batch[id_col].to_numpy(),
                 name: [row.tobytes() for row in V]})
        return ds.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pandas")

    o = np.dtype("O")
    i8 = np.dtype("int64")
    joined = hash_join(
        side(src, "xs"), side(dst, "ys"), on=[id_col],
        num_buckets=num_buckets,
        lschema={id_col: i8, "xs": o}, rschema={id_col: i8, "ys": o})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in batch["xs"]])
        Y = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in batch["ys"]])
        return pd.DataFrame({"m": [(X.T @ Y).ravel()],
                             "n": [len(X)]})

    parts = to_table(joined.map_batches(
        partial, batch_format="pandas")).to_pandas()
    if not len(parts) or int(parts["n"].sum()) == 0:
        raise ValueError("no shared ids between src and dst")
    m = np.sum(np.stack(parts["m"].to_numpy()), axis=0)
    d = int(round(np.sqrt(m.shape[0])))
    M = m.reshape(d, d)
    U, _sv, Vt = np.linalg.svd(M)
    R = U @ Vt

    import ray

    r_ref = ray.put(R)

    def apply_r(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        Rm = _ray.get(r_ref)
        X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        A = X @ Rm
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             vec_col: list(A)})

    aligned = src.select_columns([id_col, vec_col]).map_batches(
        apply_r, batch_format="pandas")
    return R, aligned


def isotropy_stats(
    emb: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-space isotropy diagnostic — anisotropic spaces (all
    vectors sharing a dominant direction, the classic contextual-
    embedding pathology) degrade cosine retrieval; the cheap signal is
    ``mean_cos ≈ ‖μ‖² / E‖x‖²`` (the expected cosine between random
    vectors equals the squared mean norm over the mean squared norm
    when vectors are near-unit; 0 = isotropic, →1 = collapsed).
    Output ONE row ``(n, mean_norm_sq, mu_norm_sq, anisotropy)``.

    ONE sufficient-statistics pass (n, Σx, Σ‖x‖² — d+2 floats per
    block, the `pca_fit` discipline), driver fold of block partials;
    the corpus never collects."""
    from pyrdf2vec_ray.util import to_table

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"n": [len(V)], "s": [V.sum(axis=0)],
             "ss": [float((V * V).sum())]})

    parts = to_table(
        emb.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pandas")).to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("empty input")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    ss = float(parts["ss"].sum())
    mu = s / n
    mu_norm_sq = float(mu @ mu)
    mean_norm_sq = ss / n
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "mean_norm_sq": pa.array([mean_norm_sq], pa.float64()),
        "mu_norm_sq": pa.array([mu_norm_sq], pa.float64()),
        "anisotropy": pa.array(
            [mu_norm_sq / mean_norm_sq if mean_norm_sq else
             float("nan")], pa.float64()),
    }))
