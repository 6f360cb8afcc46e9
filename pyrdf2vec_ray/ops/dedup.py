"""Deduplication operators over the `documents` table (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard verification.

Shapes (ray_guide.md "Aggregation at scale"): hash in a vectorized
map_batches → hash-partitioned groupby for the exact path; shingle →
minhash → band rows → groupby(band) buckets → pairwise verify for the
near-dup path.  All hashes are seed-fixed and deterministic.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# ---- exact ---------------------------------------------------------------


def add_text_hash(docs: ray.data.Dataset) -> ray.data.Dataset:
    def h(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["doc_id", "text"]].copy()
        batch["text_hash"] = [
            hashlib.md5(t.encode()).hexdigest() for t in batch["text"].astype(str)
        ]
        return batch[["doc_id", "text_hash"]]

    return docs.map_batches(h, batch_format="pandas", batch_size=8192)


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the smallest doc_id per identical text: content hash → ONE
    int-bucket shuffle → vectorized per-bucket min (shuffle.bucket_apply;
    avoids the sort-based string groupby)."""
    from pyrdf2vec_ray.shuffle import bucket_apply

    hashed = add_text_hash(docs)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text_hash", as_index=False)["doc_id"].min()
        return out[["doc_id", "text_hash"]]

    return bucket_apply(
        hashed, ["text_hash"], per_bucket, num_buckets=16, batch_format="pandas"
    )


# ---- shingles + minhash --------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    toks = text.split()
    if len(toks) <= k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)


# 64 permutations: (a*x + b) mod p, seed-fixed
_P = np.uint64((1 << 61) - 1)


def _perm_coeffs(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: ray.data.Dataset, num_perm: int = 64, k: int = 5, seed: int = 7
) -> ray.data.Dataset:
    a, b = _perm_coeffs(num_perm, seed)

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in batch["text"].astype(str):
            sh = _shingle_hashes(t, k)
            # (num_perm, n_shingles) min over shingles
            vals = (sh[None, :] * a[:, None] + b[:, None]) % _P
            out.append(vals.min(axis=1).astype(np.uint64))
        return pd.DataFrame({"doc_id": batch["doc_id"], "sig": out})

    return docs.map_batches(sig, batch_format="pandas", batch_size=2048)


def minhash_lsh_candidates(
    sigs: ray.data.Dataset, bands: int = 16, rows: int = 4
) -> ray.data.Dataset:
    """Explode signatures to (band, band_hash, doc_id) rows, bucket by
    groupby — docs sharing any band bucket are candidate near-dups.
    Returns (doc_a, doc_b) candidate pairs (doc_a < doc_b)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        band_hashes, doc_ids = [], []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                chunk = sig[bi * rows : (bi + 1) * rows]
                # band index baked into the hash → ONE int64 shuffle key
                h = hashlib.md5(bytes([bi]) + chunk.tobytes()).digest()[:8]
                band_hashes.append(int.from_bytes(h, "little", signed=True))
                doc_ids.append(doc_id)
        return pd.DataFrame({"band_hash": band_hashes, "doc_id": doc_ids})

    from pyrdf2vec_ray.shuffle import bucket_apply

    rows_ds = sigs.map_batches(explode, batch_format="pandas", batch_size=1024)

    # one int-bucket shuffle co-locates every row of a band_hash; pairs are
    # expanded vectorized within each bucket (self-merge of the duplicated
    # hashes only) — no per-group tasks, no broadcast
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated("band_hash", keep=False)]
        if len(dup) == 0:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64")})
        m = dup.merge(dup, on="band_hash")
        m = m[m["doc_id_x"] < m["doc_id_y"]][["doc_id_x", "doc_id_y"]]
        m = m.drop_duplicates()
        return m.rename(
            columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}
        ).reset_index(drop=True)

    cand = bucket_apply(
        rows_ds, ["band_hash"], per_bucket, num_buckets=16,
        batch_format="pandas",
    ).to_pandas()
    # a doc pair can collide via several band hashes in different buckets
    pairs = cand.drop_duplicates().reset_index(drop=True)
    return ray.data.from_pandas(pairs)


def verify_jaccard(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    k: int = 5,
    threshold: float = 0.8,
) -> pa.Table:
    """n-gram Jaccard verification of candidate pairs.  The candidate set
    is small (LSH output); texts for it are fetched via a broadcast of the
    candidate id set, then verified vectorized on the driver."""
    import ray

    pair_t = pairs.to_pandas()
    if len(pair_t) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    wanted = set(pair_t["doc_a"]) | set(pair_t["doc_b"])
    wanted_ref = ray.put(wanted)

    def grab(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wanted_ref)
        return batch[batch["doc_id"].isin(w)][["doc_id", "text"]]

    texts = docs.map_batches(grab, batch_format="pandas").to_pandas()
    by_id = dict(zip(texts["doc_id"], texts["text"]))
    out_a, out_b, jac = [], [], []
    for a_id, b_id in zip(pair_t["doc_a"], pair_t["doc_b"]):
        sa = set(_shingle_hashes(str(by_id.get(a_id, "")), k).tolist())
        sb = set(_shingle_hashes(str(by_id.get(b_id, "")), k).tolist())
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            out_a.append(a_id)
            out_b.append(b_id)
            jac.append(j)
    return pa.table(
        {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(jac, pa.float64())}
    )


def minhash_dedup_pairs(
    docs: ray.data.Dataset, threshold: float = 0.8,
    num_perm: int = 64, bands: int = 16, rows: int = 4, k: int = 5,
) -> pa.Table:
    """Full near-dup pipeline: shingle → minhash → LSH buckets → verified
    (doc_a, doc_b, jaccard) pairs."""
    docs = docs.materialize()   # consumed twice (signatures + verification)
    sigs = minhash_signatures(docs, num_perm=num_perm, k=k)
    cand = minhash_lsh_candidates(sigs, bands=bands, rows=rows)
    return verify_jaccard(docs, cand, k=k, threshold=threshold)


# ---- simhash -------------------------------------------------------------


def simhash(docs: ray.data.Dataset, bits: int = 64) -> ray.data.Dataset:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes)."""

    shifts = np.arange(bits, dtype=np.uint64)

    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in batch["text"].astype(str):
            acc = np.zeros(bits, dtype=np.int64)
            for tok in t.split():
                h = np.uint64(int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "little"
                ))
                bitsv = (h >> shifts) & np.uint64(1)
                acc += np.where(bitsv == 1, 1, -1)
            val = int((acc > 0).astype(np.uint64) @ (np.uint64(1) << shifts))
            out.append(val - (1 << 63))   # shift into signed int64 range
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": pd.array(out, dtype="int64")})

    return docs.map_batches(sh, batch_format="pandas", batch_size=2048)


# ---- embedding-cosine near-dup -------------------------------------------


def embedding_neardup_pairs(
    emb: ray.data.Dataset, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Near-duplicate detection on an embedding column: LSH-style random
    hyperplane bucketing (map_batches) → within-bucket exact cosine.
    Returns (id_a, id_b, cos) pairs above threshold."""
    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy())
        # seed-fixed hyperplanes: identical in every task, no broadcast needed
        planes = np.random.RandomState(11).randn(vecs.shape[1], 12)
        signs = (vecs @ planes) > 0
        keys = (signs.astype(np.uint32) @ (1 << np.arange(12, dtype=np.uint32))).astype("int64")
        return pd.DataFrame({id_col: batch[id_col], "bucket": keys,
                             vec_col: list(vecs)})

    bucketed = emb.map_batches(bucket, batch_format="pandas", batch_size=4096)

    def within(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        v = np.stack(group[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0] = 1
        vn = v / norm
        sims = vn @ vn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": np.minimum(ids[ia[mask]], ids[ib[mask]]),
             "id_b": np.maximum(ids[ia[mask]], ids[ib[mask]]),
             "cos": sims[ia, ib][mask]}
        )

    pairs = bucketed.groupby("bucket").map_groups(within, batch_format="pandas")
    t = pairs.to_pandas()
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "cos": pa.array([], pa.float64())}
    )
    if len(t) == 0 or "id_a" not in t.columns:
        return empty
    t = t.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(t.reset_index(drop=True), preserve_index=False)
