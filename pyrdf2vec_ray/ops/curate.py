"""Training-data curation operators over the `documents` table:
benchmark decontamination (exact-hash and n-gram overlap) and
deterministic hash-based split assignment.

These are the steps a 100-TB LLM data pipeline runs after dedup and
quality filtering: drop every training document that leaks evaluation
content, then carve reproducible train/val/test splits.

Scale shapes:

* Decontamination is a BROADCAST anti-join: the benchmark side is small
  by definition (eval suites are thousands of documents, the corpus is
  billions), so its hash set is collected once, ``ray.put`` once, and
  read zero-copy by every task — never re-shipped per batch and never a
  shuffle of the big side.  If a benchmark side ever outgrew broadcast,
  the fallback is the `shuffle.bucket_apply` hash-join used by
  `ops/dedup.py:verify_jaccard`; not needed at real benchmark sizes.
* Split assignment is a pure per-row hash (splitmix64 over the int64
  key) — NO shuffle, no state, and any worker can recompute any row's
  split independently, which is what makes the split reproducible
  across reruns, resumes, and repartitions of a 100-TB corpus.

Everything is bit-reproducible in ANSI SQL (DuckDB): splitmix64 via
xor/shift/HUGEINT-mod-multiply (`splitmix64_sql`), the hashes via the
md5-hex-prefix trick shared with `ops/text.fingerprint`.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

# ---- splitmix64 (Steele et al., "Fast Splittable Pseudorandom Number
# Generators", OOPSLA 2014) — public constants ------------------------------

_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_MASK64 = (1 << 64) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wrapping
    64-bit arithmetic; numpy unsigned ops wrap natively)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(_SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_M1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_M2)
        return z ^ (z >> np.uint64(31))


def splitmix64_py(x: int) -> int:
    """Reference scalar implementation (plain Python ints)."""
    z = (x + _SM_GAMMA) & _MASK64
    z = ((z ^ (z >> 30)) * _SM_M1) & _MASK64
    z = ((z ^ (z >> 27)) * _SM_M2) & _MASK64
    return z ^ (z >> 31)


def _mulmod_sql(expr: str, c: int) -> str:
    """SQL for (expr * c) mod 2**64 over a UBIGINT column: split the
    constant into 32-bit halves so every HUGEINT product stays < 2**96
    (DuckDB integer arithmetic errors on overflow instead of wrapping)."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"CAST((("
        f"CAST(({expr}) & 4294967295 AS HUGEINT) * {lo} + "
        f"(((CAST(({expr}) & 4294967295 AS HUGEINT) * {hi} + "
        f"CAST(({expr}) >> 32 AS HUGEINT) * {lo}) % 4294967296) "
        f"* 4294967296)"
        f") % 18446744073709551616) AS UBIGINT)"
    )


def splitmix64_sql(
    key_expr: str, seed: int, suffix: str = "", src: str = "_sm_in"
) -> str:
    """DuckDB SELECT-fragment pipeline reproducing
    ``splitmix64(key ^ seed)`` bit-for-bit.  Returns a CTE chain body
    ending in ``s3{suffix}`` (column ``h``); callers wrap it as
    ``WITH {src} AS (SELECT <keys> ...), ...``.  ``suffix``/``src`` let
    one query instantiate several chains (e.g. Count-Min depths).
    Exposed so the pytest parity suite and the driver oracles share one
    definition."""
    add = (
        f"CAST((CAST(xor(CAST({key_expr} AS UBIGINT), "
        f"CAST({seed} AS UBIGINT)) AS HUGEINT) + {_SM_GAMMA}) "
        f"% 18446744073709551616 AS UBIGINT)"
    )
    x = suffix
    return (
        f"s0{x} AS (SELECT *, {add} AS z0 FROM {src}),\n"
        f"s1{x} AS (SELECT *, {_mulmod_sql('xor(z0, z0 >> 30)', _SM_M1)} AS z1 FROM s0{x}),\n"
        f"s2{x} AS (SELECT *, {_mulmod_sql('xor(z1, z1 >> 27)', _SM_M2)} AS z2 FROM s1{x}),\n"
        f"s3{x} AS (SELECT *, xor(z2, z2 >> 31) AS h FROM s2{x})"
    )


# ---- split assignment ------------------------------------------------------

DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_N_BUCKETS = 10_000


def assign_splits(
    docs: ray.data.Dataset,
    splits=DEFAULT_SPLITS,
    seed: int = 0,
    key: str = "doc_id",
) -> ray.data.Dataset:
    """(key, bucket, split): deterministic train/val/test assignment by
    ``splitmix64(key ^ seed) % 10000`` against cumulative weight edges.
    Stateless vectorized map_batches — no shuffle, no RNG stream, so
    the assignment is stable under any re-partitioning or resume.
    Reference analog: the train/test carving a reference user does
    ad hoc with sklearn train_test_split; here it is a first-class
    shuffle-free operator."""
    names = [n for n, _ in splits]
    weights = np.array([w for _, w in splits], dtype=np.float64)
    if not np.isclose(weights.sum(), 1.0):
        raise ValueError(f"split weights must sum to 1, got {weights.sum()}")
    # right-open bucket edges: train [0,8000), val [8000,9000), ...
    edges = np.floor(np.cumsum(weights) * _N_BUCKETS + 0.5).astype(np.int64)
    edges[-1] = _N_BUCKETS
    labels = np.array(names, dtype=object)

    def ab(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = splitmix64(ids ^ np.uint64(seed))
        bucket = (h % np.uint64(_N_BUCKETS)).astype(np.int64)
        which = np.searchsorted(edges, bucket, side="right")
        return pd.DataFrame(
            {
                key: batch[key].reset_index(drop=True),
                "bucket": bucket,
                "split": pd.Series(labels[which], dtype=str),
            }
        )

    return docs.map_batches(ab, batch_format="pandas", batch_size=8192)


def assign_splits_sql(
    table: str = "documents",
    splits=DEFAULT_SPLITS,
    seed: int = 0,
    key: str = "doc_id",
) -> str:
    """The DuckDB oracle for :func:`assign_splits` — same edges, same
    hash, built from the shared :func:`splitmix64_sql` fragment."""
    weights = np.array([w for _, w in splits], dtype=np.float64)
    edges = np.floor(np.cumsum(weights) * _N_BUCKETS + 0.5).astype(np.int64)
    edges[-1] = _N_BUCKETS
    case = "CASE "
    for (name, _), hi in zip(splits, edges):
        case += f"WHEN b < {hi} THEN '{name}' "
    case += "END"
    return (
        f"WITH _sm_in AS (SELECT {key} FROM {table}),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"b AS (SELECT {key}, CAST(h % {_N_BUCKETS} AS BIGINT) AS b FROM s3)\n"
        f"SELECT {key}, b AS bucket, {case} AS split FROM b"
    )


# ---- deterministic sampling / mixture weighting ----------------------------


def sample_by_hash(
    docs: ray.data.Dataset,
    rate: float | None = None,
    rates_by: str | None = None,
    rates: dict | None = None,
    default_rate: float = 1.0,
    seed: int = 0,
    key: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic Bernoulli / stratified sampling: keep a row iff
    ``splitmix64(key ^ seed) % 10000 < rate * 10000``.  With ``rates_by``
    + ``rates`` the rate is looked up per row from a column (mixture
    weighting: e.g. downsample each language to a target share) —
    still a pure per-row hash, so the sample is reproducible under any
    partitioning/resume and needs NO shuffle and no RNG stream.  This is
    the scale-safe substitute for ``Dataset.random_sample`` when the
    sample must be stable across reruns of a 100-TB job.

    Returns the surviving rows (key + rates_by columns)."""
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate= or rates=/rates_by=")
    if rate is not None and rates_by is not None:
        raise ValueError(
            "rate= is a flat rate; stratified sampling needs rates= "
            "(rates_by would be silently ignored)"
        )
    if rates is not None and rates_by is None:
        raise ValueError("rates= requires rates_by=<column>")

    def thresh(r: float) -> int:
        return int(round(float(r) * _N_BUCKETS))

    def samp(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = (splitmix64(ids ^ np.uint64(seed)) % np.uint64(_N_BUCKETS)).astype(
            np.int64
        )
        if rate is not None:
            keep = h < thresh(rate)
            out = pd.DataFrame({key: batch[key].reset_index(drop=True)})
        else:
            t = (
                batch[rates_by]
                .map(lambda v: thresh(rates.get(v, default_rate)))
                .to_numpy(dtype=np.int64)
            )
            keep = h < t
            out = pd.DataFrame(
                {
                    key: batch[key].reset_index(drop=True),
                    rates_by: batch[rates_by].reset_index(drop=True),
                }
            )
        return out[keep]

    return docs.map_batches(samp, batch_format="pandas", batch_size=8192)


def sample_by_hash_sql(
    table: str = "documents",
    rate: float | None = None,
    rates_by: str | None = None,
    rates: dict | None = None,
    default_rate: float = 1.0,
    seed: int = 0,
    key: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`sample_by_hash` (shared splitmix64
    fragment; same rounded thresholds)."""

    def thresh(r: float) -> int:
        return int(round(float(r) * _N_BUCKETS))

    if rate is not None:
        cols, cond = key, f"b < {thresh(rate)}"
    else:
        case = "CASE " + " ".join(
            f"WHEN {rates_by} = '{v}' THEN {thresh(r)}"
            for v, r in sorted(rates.items())
        ) + f" ELSE {thresh(default_rate)} END"
        cols, cond = f"{key}, {rates_by}", f"b < ({case})"
    return (
        f"WITH _sm_in AS (SELECT {cols} FROM {table}),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"b AS (SELECT *, CAST(h % {_N_BUCKETS} AS BIGINT) AS b FROM s3)\n"
        f"SELECT {cols} FROM b WHERE {cond}"
    )


# ---- sequence packing (distributed prefix sum) -----------------------------


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int,
    key: str = "doc_id",
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Token-offset sequence packing: concatenate every document's
    whitespace tokens in `key` order and cut the stream into
    `budget`-token training sequences.  Emits per doc
    ``(key, n_tokens, seq_id, seq_offset)`` where seq_id/seq_offset
    locate the doc's FIRST token in the packed stream (docs may span a
    sequence boundary — standard concat-then-chunk packing).

    Distributed as a two-level prefix sum, the scan-primitive shape:
      1. per-doc token counts (vectorized map_batches);
      2. range-partition by ``key // W`` (W sized off the key max, one
         tiny aggregate) → per-partition token sums are a SMALL
         groupby (num_parts rows) collected to the driver, whose
         exclusive cumsum gives each partition's global base offset;
      3. one bucket shuffle by partition: within each partition sort
         by key, local exclusive cumsum + broadcast base.
    Nothing corpus-scale ever reaches the driver; the per-partition
    rows-fit-in-a-worker assumption is the same one `sessionize`
    documents (pick num_parts so a partition's DOCS, not tokens, fit)."""
    from pyrdf2vec_ray.ops.text import TOKEN_RE
    from pyrdf2vec_ray.shuffle import (
        bucket_apply,
        part_prefix_bases,
        segment_spans,
    )

    if budget <= 0:
        raise ValueError("budget must be positive")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError(
                f"pack_sequences requires non-negative {key} values "
                "(the key range-partitions the scan)"
            )
        text = batch["text"].astype(str)
        return pd.DataFrame(
            {
                key: batch[key].reset_index(drop=True),
                "n_tokens": text.reset_index(drop=True)
                .str.split(TOKEN_RE, regex=True)
                .map(len)
                .astype("int64"),
            }
        )

    # materialized once: consumed by max(), the part-sums aggregate and
    # the final shuffle — without this the corpus tokenizes three times
    cnt = docs.map_batches(
        counts, batch_format="pandas", batch_size=8192
    ).materialize()
    hi = cnt.max(key)
    if hi is None:  # empty input: schema-preserving empty result
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {c: pa.array([], pa.int64())
                 for c in (key, "n_tokens", "seq_id", "seq_offset")}
            )
        )
    w = max(1, (int(hi) + num_parts) // num_parts)

    def with_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = (batch[key] // w).astype("int64")
        return batch

    parted = cnt.map_batches(with_part, batch_format="pandas")
    base_ref = part_prefix_bases(parted, "part", "n_tokens", num_parts)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = g.sort_values(["part", key]).reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        # exclusive cumsum restarting per part, plus the global base
        cs = np.cumsum(n) - n
        part = g["part"].to_numpy(dtype=np.int64)
        starts, lens = segment_spans(part)
        cs = cs - np.repeat(cs[starts], lens)
        cum = cs + bases[part]
        return pd.DataFrame(
            {
                key: g[key],
                "n_tokens": g["n_tokens"],
                "seq_id": cum // budget,
                "seq_offset": cum % budget,
            }
        )

    return bucket_apply(parted, ["part"], per_bucket, batch_format="pandas")


def shuffle_order(
    docs: ray.data.Dataset,
    seed: int = 0,
    key: str = "doc_id",
    parts_pow2: int = 6,
) -> ray.data.Dataset:
    """(key, rank): deterministic GLOBAL shuffle order for training —
    rank = position of the row when sorted by
    ``(splitmix64(key ^ seed), key)``.  Changing the seed reshuffles;
    the order is identical across reruns/partitionings, unlike
    ``Dataset.random_shuffle`` whose order depends on block layout.

    Distributed rank assignment without a global sort barrier: the hash
    is uniform, so its top ``parts_pow2`` bits range-partition the rows
    into equal parts whose sizes are a tiny shuffle (2**parts_pow2
    rows) -> driver cumsum gives each part's base rank -> one bucket
    shuffle; each part sorts locally and adds its base."""
    n_parts = 1 << parts_pow2
    shift = np.uint64(64 - parts_pow2)

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = splitmix64(ids ^ np.uint64(seed))
        return pd.DataFrame(
            {
                key: batch[key].reset_index(drop=True),
                # int64 view keeps Arrow-friendly dtype; order of the
                # uint64 values is preserved after the >> shift
                "h": h.view(np.int64),
                "part": (h >> shift).astype(np.int64),
            }
        )

    from pyrdf2vec_ray.shuffle import (
        bucket_apply,
        part_prefix_bases,
        segment_spans,
    )

    # materialized once: consumed by the part-counts aggregate and the
    # final shuffle — without this the corpus hashes (and reads) twice
    hs = docs.map_batches(
        hashed, batch_format="pandas", batch_size=8192
    ).materialize()
    base_ref = part_prefix_bases(hs, "part", None, n_parts)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        # sort by (part, h-as-uint, key); h sorts identically as uint64
        hu = g["h"].to_numpy(dtype=np.int64).view(np.uint64)
        order = np.lexsort((g[key].to_numpy(), hu, g["part"].to_numpy()))
        g = g.iloc[order].reset_index(drop=True)
        part = g["part"].to_numpy(dtype=np.int64)
        starts, lens = segment_spans(part)
        within = np.arange(len(g)) - np.repeat(starts, lens)
        return pd.DataFrame(
            {key: g[key], "rank": bases[part] + within}
        )

    return bucket_apply(hs, ["part"], per_bucket, batch_format="pandas")


def shuffle_order_sql(
    table: str = "documents", seed: int = 0, key: str = "doc_id"
) -> str:
    """DuckDB oracle for :func:`shuffle_order`: ROW_NUMBER over the
    shared splitmix64 hash."""
    return (
        f"WITH _sm_in AS (SELECT {key} FROM {table}),\n"
        f"{splitmix64_sql(key, seed)}\n"
        f"SELECT {key}, CAST(ROW_NUMBER() OVER (ORDER BY h, {key}) - 1 "
        f"AS BIGINT) AS rank FROM s3"
    )


# ---- decontamination -------------------------------------------------------


def _bench_text_hash_ref(benchmark: ray.data.Dataset):
    """Collect the benchmark's distinct md5(text) set to the driver and
    broadcast it as a SORTED fixed-width U32 array (zero-copy through
    the object store; see state/graph_index.py for the U-dtype
    rationale).  Driver collect is benchmark-scale, not corpus-scale."""
    from pyrdf2vec_ray.ops.dedup import add_text_hash

    hashed = add_text_hash(benchmark)
    vals = np.array(
        [r["text_hash"] for r in hashed.take_all()], dtype="U32"
    )
    return ray.put(np.unique(vals))


def decontaminate(
    docs: ray.data.Dataset, benchmark: ray.data.Dataset
) -> ray.data.Dataset:
    """Exact decontamination: drop every doc whose full text (by md5)
    appears in `benchmark`.  Survivors as (doc_id, text_hash).

    Broadcast anti-join: benchmark hash set via ray.put once, membership
    per batch via np.searchsorted on the sorted U32 array."""
    ref = _bench_text_hash_ref(benchmark)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)
        hashes = np.array(
            [hashlib.md5(t.encode()).hexdigest()
             for t in batch["text"].astype(str)],
            dtype="U32",
        )
        if len(bench):
            pos = np.minimum(np.searchsorted(bench, hashes), len(bench) - 1)
            hit = bench[pos] == hashes
        else:
            hit = np.zeros(len(hashes), dtype=bool)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].reset_index(drop=True),
                "text_hash": hashes,
            }
        )
        return out[~hit]

    return docs.map_batches(keep, batch_format="pandas", batch_size=8192)


def _bench_shingle_hash_ref(benchmark: ray.data.Dataset, window: int):
    """Distinct int64 shingle hashes of the benchmark, sorted, broadcast
    once.  Shingle extraction/hashing is the vectorized _ShingleBatch
    kernel shared with ops/text.fingerprint."""
    from pyrdf2vec_ray.ops.text import _ShingleBatch

    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str).reset_index(drop=True)
        hv = _ShingleBatch(text, window).md5_hashes()
        return pd.DataFrame({"h": np.unique(hv)})

    parts = benchmark.map_batches(sh, batch_format="pandas", batch_size=4096)
    arr = np.unique(
        np.array([r["h"] for r in parts.take_all()], dtype=np.int64)
    )
    return ray.put(arr)


def decontaminate_ngram(
    docs: ray.data.Dataset, benchmark: ray.data.Dataset, window: int = 8
) -> ray.data.Dataset:
    """N-gram decontamination: drop every doc sharing ANY `window`-token
    shingle with a benchmark doc (docs shorter than `window` tokens
    match on their whole text) — the standard guard against partial
    eval-set leakage that exact-hash decontamination misses.
    Survivors as (doc_id,).

    Hashes are the md5-15-hex-prefix int64 shared with `fingerprint`,
    so the whole operator is reproducible in SQL (absent 60-bit md5
    collisions, which the 500-doc oracle scale cannot manufacture)."""
    from pyrdf2vec_ray.ops.text import _ShingleBatch

    ref = _bench_shingle_hash_ref(benchmark, window)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)
        text = batch["text"].astype(str).reset_index(drop=True)
        sb = _ShingleBatch(text, window)
        hv = sb.md5_hashes()
        if len(bench) and len(hv):
            pos = np.minimum(np.searchsorted(bench, hv), len(bench) - 1)
            hit = bench[pos] == hv
        else:
            hit = np.zeros(len(hv), dtype=bool)
        contaminated = np.zeros(len(sb.lens), dtype=bool)
        if hit.any():
            contaminated[np.unique(sb.doc_of()[hit])] = True
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].reset_index(drop=True)}
        )
        return out[~contaminated]

    return docs.map_batches(keep, batch_format="pandas", batch_size=4096)


def sample_exact_per_group(
    docs: ray.data.Dataset,
    n: int,
    group_col: str,
    key: str = "doc_id",
    seed: int = 0,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(group, key, hkey, rank): EXACTLY n rows per group, chosen as
    the n smallest splitmix64 hashes of the key — a deterministic
    group-wise uniform sample (rate-free counterpart to
    :func:`sample_by_hash`, for "exactly 500 eval docs per language"
    style carve-outs).  Stable under repartition/resume like every
    hash-keyed op here, and mergeable: the n smallest of a union are
    the n smallest of per-part n-smallest, which is exactly
    ops/agg.topk_by_group's combiner.  ``hkey`` is the hash shifted
    right one bit so it fits BIGINT on both engines (ordering is
    preserved; ties break by key)."""
    from pyrdf2vec_ray.ops.agg import topk_by_group

    def with_hash(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = (splitmix64(ids ^ np.uint64(seed)) >> np.uint64(1)).astype(
            np.int64
        )
        return batch[[group_col, key]].assign(hkey=h)

    hashed = docs.map_batches(with_hash, batch_format="pandas")
    return topk_by_group(hashed, group_col, "hkey", n, id_col=key,
                         ascending=True, num_buckets=num_buckets)


def sample_exact_per_group_sql(
    n: int,
    group_col: str = "lang",
    key: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`sample_exact_per_group` — the shared
    splitmix64 chain + ROW_NUMBER per group."""
    return (
        f"WITH _sm_in AS (\n"
        f"  SELECT {group_col}, {key} FROM {table}\n"
        f"),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"ranked AS (\n"
        f"  SELECT {group_col}, {key},\n"
        f"         CAST(h >> 1 AS BIGINT) AS hkey,\n"
        f"         ROW_NUMBER() OVER (\n"
        f"           PARTITION BY {group_col}\n"
        f"           ORDER BY h >> 1, {key}\n"
        f"         ) AS rank\n"
        f"  FROM s3\n"
        f")\n"
        f"SELECT {group_col}, {key}, hkey, rank\n"
        f"FROM ranked WHERE rank <= {n}"
    )


def interleave_sources(
    docs: ray.data.Dataset,
    weights: dict[str, int],
    source_col: str = "source",
    key: str = "doc_id",
    seed: int = 0,
    parts_pow2: int = 6,
) -> ray.data.Dataset:
    """(source, key, v, rank): a deterministic WEIGHTED data-mixture
    order — the schedule that feeds a trainer "3 parts web : 1 part
    code" without materializing or shuffling either side.  Rows of
    source s appear with long-run frequency proportional to integer
    ``weights[s]``, smoothly interleaved (weighted round-robin by
    virtual time, the WFQ schedule), per-source order = the
    deterministic splitmix64 shuffle, all stable under repartition /
    resume.

    Two-phase, NO global sort: (1) per-source ranks r via hash-range
    partitioning + per-(source, part) base offsets (the shuffle_order
    machinery, cumsum reset per source); (2) virtual time
    ``v = r * (lcm(w) // w_s)`` and the global rank in CLOSED FORM —
    for each row, the number of schedule slots of every other source
    strictly before v (plus source-order tie-breaks), a vectorized
    O(#sources) map using only the tiny per-source count table.  The
    SQL oracle computes the same order the obvious way
    (ROW_NUMBER OVER (ORDER BY v, source, key)), so the driver gate
    value-checks the closed form against the definition.  All integer
    arithmetic — bit-exact on both engines."""
    import math

    sources = sorted(weights)
    for s, w in weights.items():
        if not (isinstance(w, int) and w >= 1):
            raise ValueError(f"weight for {s!r} must be an int >= 1")
    L = math.lcm(*weights.values())
    c = np.array([L // weights[s] for s in sources], dtype=np.int64)
    n_parts = 1 << parts_pow2
    shift = np.uint64(64 - parts_pow2)
    src_idx = {s: i for i, s in enumerate(sources)}

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = splitmix64(ids ^ np.uint64(seed))
        sc = batch[source_col].map(src_idx)
        if sc.isna().any():
            missing = sorted(set(batch[source_col][sc.isna()]))
            raise ValueError(f"sources without a weight: {missing}")
        sc = sc.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": sc,
             key: batch[key].reset_index(drop=True),
             "h": h.view(np.int64),
             "part": sc * n_parts + (h >> shift).astype(np.int64)}
        )

    from pyrdf2vec_ray.shuffle import bucket_apply, segment_spans

    hs = docs.select_columns([source_col, key]).map_batches(
        hashed, batch_format="pandas", batch_size=8192
    ).materialize()

    # per-(source, hash-part) counts -> per-source cumsum bases + n_s
    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("part", as_index=False).size()
        return g.rename(columns={"size": "_v"})

    sums = (hs.map_batches(counts, batch_format="pandas")
            .groupby("part").sum("_v").to_pandas())
    col = "sum(_v)" if "sum(_v)" in sums.columns else "_v"
    cnt = np.zeros(len(sources) * n_parts, dtype=np.int64)
    cnt[sums["part"].to_numpy(dtype=np.int64)] = (
        sums[col].to_numpy(dtype=np.int64))
    grid = cnt.reshape(len(sources), n_parts)
    n_s = grid.sum(1)
    bases = np.zeros_like(grid)
    bases[:, 1:] = np.cumsum(grid, axis=1)[:, :-1]
    import ray

    state_ref = ray.put((bases.reshape(-1), n_s, c))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_flat, ns, cs = ray.get(state_ref)
        hu = g["h"].to_numpy(dtype=np.int64).view(np.uint64)
        # the family-wide tie-break contract is (h >> 1, key) — the
        # oracle's ORDER BY h >> 1, key; sorting by the full 64-bit h
        # would swap keys whose hashes differ only in bit 0
        order = np.lexsort((g[key].to_numpy(), hu >> np.uint64(1),
                            g["part"].to_numpy()))
        g = g.iloc[order].reset_index(drop=True)
        part = g["part"].to_numpy(dtype=np.int64)
        starts, lens = segment_spans(part)
        within = np.arange(len(g)) - np.repeat(starts, lens)
        r = base_flat[part] + within + 1            # per-source rank, 1-based
        s = g["s"].to_numpy(dtype=np.int64)
        v = r * cs[s]
        # closed-form global rank: own earlier rows (r - 1) plus, per
        # other source s2, min(n_s2, slots strictly before v, +1 on a
        # tie when s2 orders first)
        rank = r.copy()                              # 1 + (r - 1)
        for s2 in range(len(ns)):
            before = np.minimum(ns[s2], (v - 1) // cs[s2])
            tie = ((v % cs[s2]) == 0) & (s2 < s) & (v // cs[s2] <= ns[s2])
            rank += np.where(s == s2, 0, before + tie)
        names = np.array(sources)
        return pd.DataFrame(
            {source_col: names[s], key: g[key],
             "v": v, "rank": rank}
        )

    return bucket_apply(hs, ["part"], per_bucket, batch_format="pandas")


def interleave_sources_sql(
    weights: dict[str, int],
    source_col: str = "source",
    key: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`interleave_sources` — the definitional
    form: per-source ROW_NUMBER over the splitmix64 order, integer
    virtual time, global ROW_NUMBER over (v, source, key)."""
    import math

    L = math.lcm(*weights.values())
    case = " ".join(
        f"WHEN '{s}' THEN {L // w}" for s, w in sorted(weights.items())
    )
    return (
        f"WITH _sm_in AS (SELECT {source_col}, {key} FROM {table}),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"r AS (\n"
        f"  SELECT {source_col}, {key},\n"
        f"         ROW_NUMBER() OVER (\n"
        f"           PARTITION BY {source_col} ORDER BY h >> 1, {key}\n"
        f"         ) AS r\n"
        f"  FROM s3\n"
        f"),\n"
        f"v AS (\n"
        f"  SELECT {source_col}, {key},\n"
        f"         r * (CASE {source_col} {case} END) AS v\n"
        f"  FROM r\n"
        f")\n"
        f"SELECT {source_col}, {key}, CAST(v AS BIGINT) AS v,\n"
        f"       ROW_NUMBER() OVER (ORDER BY v, {source_col}, {key})\n"
        f"         AS rank\n"
        f"FROM v"
    )


def budget_sample(
    docs: ray.data.Dataset,
    budget: int,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    key: str = "doc_id",
    seed: int = 0,
    parts_pow2: int = 6,
) -> ray.data.Dataset:
    """(group, key, weight, cum): rows taken per group, in the
    deterministic splitmix64 order, while the group's cumulative
    ``weight_col`` stays within ``budget`` — "2B tokens per domain"
    mixture building as an operator.  ``cum`` is the inclusive prefix
    sum, so the output is self-auditing (max cum per group <= budget).

    NO per-group collect and no assumption that a group fits a task:
    the hash's top bits range-partition each group's rows; per-(group,
    part) WEIGHT sums (a tiny aggregate) give exact base offsets, and
    each bucket finishes its parts with a local sort + cumsum.  All
    integer arithmetic — reproducible in SQL as a windowed SUM."""
    n_parts = 1 << parts_pow2
    shift = np.uint64(64 - parts_pow2)

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = splitmix64(ids ^ np.uint64(seed))
        return pd.DataFrame(
            {group_col: batch[group_col].to_numpy(),
             key: batch[key].to_numpy(),
             weight_col: batch[weight_col].to_numpy(np.int64),
             "h": h.view(np.int64),
             "hpart": (h >> shift).astype(np.int64)}
        )

    from pyrdf2vec_ray.shuffle import bucket_agg, bucket_apply, segment_spans

    hs = docs.select_columns([group_col, key, weight_col]).map_batches(
        hashed, batch_format="pandas", batch_size=8192
    ).materialize()

    sums = bucket_agg(
        hs, [group_col, "hpart"], {"w": (weight_col, "sum")},
        num_buckets=4,
    ).to_pandas()
    # per-(group, part) base offsets: cumsum over parts WITHIN group
    sums = sums.sort_values([group_col, "hpart"]).reset_index(drop=True)
    grp_codes, _ = pd.factorize(sums[group_col].to_numpy())
    w = sums["w"].to_numpy(dtype=np.int64)
    cum = np.cumsum(w)
    starts = np.flatnonzero(np.r_[True, np.diff(grp_codes) != 0])
    base_of_group = np.where(starts > 0, cum[starts - 1], 0)
    sums["base"] = cum - w - base_of_group[grp_codes]
    import ray

    # \x01 separator, NOT \x00: numpy U-strings treat trailing NULs
    # as padding and pandas str-concat drops embedded NULs outright, so
    # a NUL "separator" silently vanishes and ("src1", 14) collides
    # with ("src11", 4) — measured as a wrong-base bug here
    base_keys = np.char.add(np.char.add(
        sums[group_col].to_numpy().astype(np.str_), "\x01"),
        sums["hpart"].to_numpy().astype(np.str_))
    border = np.argsort(base_keys)
    base_ref = ray.put((base_keys[border],
                        sums["base"].to_numpy(np.int64)[border]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bkeys, bvals = ray.get(base_ref)
        # the hash order MUST be (h >> 1, key) — the oracle compares
        # the shifted hash, so ties after the shift break by key on
        # both engines
        hu = (g["h"].to_numpy(dtype=np.int64).view(np.uint64)
              >> np.uint64(1))
        codes, _ = pd.factorize(g[group_col].to_numpy())
        order = np.lexsort((g[key].to_numpy(), hu,
                            g["hpart"].to_numpy(), codes))
        g = g.iloc[order].reset_index(drop=True)
        gk = np.char.add(np.char.add(
            g[group_col].to_numpy().astype(np.str_), "\x01"),
            g["hpart"].to_numpy().astype(np.str_))
        cell = pd.factorize(gk)[0]
        starts, lens = segment_spans(cell)
        wv = g[weight_col].to_numpy(dtype=np.int64)
        cw = np.cumsum(wv)
        base_within = np.repeat(
            np.where(starts > 0, cw[starts - 1], 0), lens)
        within = cw - base_within
        base = bvals[np.searchsorted(bkeys, gk)]
        total = base + within
        keep = total <= budget
        out = g[[group_col, key, weight_col]][keep].copy()
        out["cum"] = total[keep]
        return out

    return bucket_apply(hs, [group_col, "hpart"], per_bucket,
                        batch_format="pandas")


def budget_sample_sql(
    budget: int,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    key: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
    weight_expr: str | None = None,
) -> str:
    """DuckDB oracle for :func:`budget_sample` — windowed SUM over the
    splitmix64 order per group."""
    wexpr = weight_expr or weight_col
    return (
        f"WITH _sm_in AS (\n"
        f"  SELECT {group_col}, {key}, {wexpr} AS {weight_col}\n"
        f"  FROM {table}\n"
        f"),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"c AS (\n"
        f"  SELECT {group_col}, {key}, {weight_col},\n"
        f"         SUM({weight_col}) OVER (\n"
        f"           PARTITION BY {group_col}\n"
        f"           ORDER BY h >> 1, {key}\n"
        f"           ROWS UNBOUNDED PRECEDING\n"
        f"         ) AS cum\n"
        f"  FROM s3\n"
        f")\n"
        f"SELECT {group_col}, {key}, {weight_col},\n"
        f"       CAST(cum AS BIGINT) AS cum\n"
        f"FROM c WHERE cum <= {budget}"
    )


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_tokens: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, chunk_id, n_tokens, chunk_text): split each document's
    whitespace tokens into training chunks — chunk ``c`` covers token
    positions ``[c*stride, c*stride + chunk_tokens)``, emitted while
    ``c*stride < n_tokens`` (the final chunk may be short).
    ``stride < chunk_tokens`` overlaps consecutive chunks (context
    preservation at cut points, the standard LLM pre-tokenization
    shape); ``stride == chunk_tokens`` (default) gives disjoint chunks.
    The in-document sibling of :func:`pack_sequences` (which
    concatenates ACROSS documents).

    Stateless vectorized map, NO shuffle: per batch, tokens explode
    with their in-doc position and replicate into their ≤
    ceil(chunk/stride) covering chunks via one offset-grid mask (the
    sliding_window replication shape), then reassemble per (doc, chunk)
    with an ordered in-batch groupby — documents never split across
    batches, so chunk assembly is local by construction."""
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1 or stride > chunk_tokens:
        raise ValueError("need 1 <= stride <= chunk_tokens")
    kmax = -(-chunk_tokens // stride)

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {id_col: pd.Series(dtype=batch[id_col].dtype if len(batch)
                               else "int64"),
             "chunk_id": pd.Series(dtype="int64"),
             "n_tokens": pd.Series(dtype="int64"),
             "chunk_text": pd.Series(dtype="object")}
        )
        text = batch[text_col].astype(str).reset_index(drop=True)
        ids = batch[id_col].reset_index(drop=True)
        toks = text.str.split().explode().dropna()
        if not len(toks):
            return empty
        arr = toks.to_numpy()
        d = toks.index.to_numpy()
        idx = np.arange(len(d))
        starts = np.r_[True, d[1:] != d[:-1]]
        doc_start = idx[starts]
        lens = np.diff(np.r_[doc_start, len(d)])
        p = idx - np.repeat(doc_start, lens)
        J = np.arange(kmax, dtype=np.int64)
        c = (p // stride)[:, None] - J[None, :]
        valid = (c >= 0) & ((p[:, None] - c * stride) < chunk_tokens)
        rep = valid.sum(1)
        g = pd.DataFrame(
            {"d": np.repeat(d, rep), "c": c[valid],
             "p": np.repeat(p, rep), "tok": np.repeat(arr, rep)}
        )
        g = g.sort_values(["d", "c", "p"], kind="mergesort")
        agg = g.groupby(["d", "c"], as_index=False, sort=False).agg(
            n_tokens=("tok", "size"), chunk_text=("tok", " ".join)
        )
        return pd.DataFrame(
            {id_col: ids.iloc[agg["d"]].to_numpy(),
             "chunk_id": agg["c"].to_numpy(dtype=np.int64),
             "n_tokens": agg["n_tokens"].to_numpy(dtype=np.int64),
             "chunk_text": agg["chunk_text"].to_numpy()}
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pandas", batch_size=4096
    )


def chunk_documents_sql(
    chunk_tokens: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`chunk_documents` — the definitional
    form: 1-based list slice per generated chunk index."""
    if stride is None:
        stride = chunk_tokens
    return (
        f"WITH t AS (\n"
        f"  SELECT {id_col},\n"
        f"         regexp_split_to_array({text_col}, '\\s+') AS toks\n"
        f"  FROM {table}\n"
        f"),\n"
        f"c AS (\n"
        f"  SELECT {id_col}, toks, g.c\n"
        f"  FROM t, UNNEST(generate_series(\n"
        f"         0, CAST(len(toks) / {stride} AS BIGINT))) AS g(c)\n"
        f"  WHERE g.c * {stride} < len(toks)\n"
        f")\n"
        f"SELECT {id_col}, CAST(c AS BIGINT) AS chunk_id,\n"
        f"       CAST(least(len(toks) - c*{stride}, {chunk_tokens})\n"
        f"            AS BIGINT) AS n_tokens,\n"
        f"       array_to_string(\n"
        f"         toks[CAST(c*{stride}+1 AS BIGINT)\n"
        f"              :CAST(c*{stride}+{chunk_tokens} AS BIGINT)], ' ')\n"
        f"         AS chunk_text\n"
        f"FROM c"
    )


def priority_sample(
    docs: ray.data.Dataset,
    n: int,
    weight_col: str,
    key: str = "doc_id",
    seed: int = 0,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(key, weight, priority): weight-sensitive sample of n rows via
    priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    estimation of arbitrary subset sums", JACM 2007): each row draws a
    deterministic uniform u = ((splitmix64(key ^ seed) >> 11) + 1) /
    2^53 in (0, 1] and gets priority w / u; the sample is the n largest
    priorities (ties by key).  Heavier rows are proportionally more
    likely to be kept, and subset sums are estimable from the kept
    (weight, priority) pairs — the standard weighted carve-out for
    "sample training docs proportional to length".

    Every float op is a single IEEE rounding on exactly-representable
    inputs ((h >> 11) + 1 < 2^53, the 2^53 divisor is a power of two,
    integer weights are exact doubles), so numpy and DuckDB produce
    bit-identical priorities — the oracle match is exact, not
    approximate.

    Merge shape: ops/agg.global_topn — per-batch partial top-n
    combiner, key-salted bucket round, one bounded final task; the
    driver never sees more than the n result rows and the final fan-in
    is independent of the input block count."""
    from pyrdf2vec_ray.ops.agg import global_topn

    if n < 1:
        raise ValueError("n must be >= 1")
    two53 = float(2.0 ** 53)

    def with_priority(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64)
        w = batch[weight_col].to_numpy(dtype=np.float64)
        if len(w) and w.min() <= 0:
            raise ValueError(f"{weight_col} must be > 0 for priority "
                             "sampling")
        h = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        u = ((h >> np.uint64(11)) + np.uint64(1)).astype(np.float64) / two53
        return pd.DataFrame(
            {key: ids, weight_col: batch[weight_col].to_numpy(),
             "priority": w / u}
        )

    scored = docs.select_columns([key, weight_col]).map_batches(
        with_priority, batch_format="pandas"
    )
    return global_topn(scored, n, "priority", key, num_salt=num_buckets)


def priority_sample_sql(
    n: int,
    weight_col: str = "n_chars",
    key: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`priority_sample` — the shared
    splitmix64 chain, then the identical two-rounding float pipeline
    (u = exact-int / 2^53, priority = w / u)."""
    return (
        f"WITH _sm_in AS (\n"
        f"  SELECT {key}, {weight_col} FROM {table}\n"
        f"),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"pri AS (\n"
        f"  SELECT {key}, {weight_col},\n"
        f"         CAST({weight_col} AS DOUBLE)\n"
        f"           / (CAST((h >> 11) + 1 AS DOUBLE)\n"
        f"              / 9007199254740992.0) AS priority\n"
        f"  FROM s3\n"
        f")\n"
        f"SELECT {key}, {weight_col}, priority FROM pri\n"
        f"ORDER BY priority DESC, {key} LIMIT {n}"
    )


def temperature_sample(
    docs: ray.data.Dataset,
    group_col: str,
    target: int,
    seed: int = 0,
    key: str = "doc_id",
) -> ray.data.Dataset:
    """sqrt-temperature multilingual resampling (the alpha = 0.5 point
    of the mBERT/XLM-R temperature family): sample so the EXPECTED kept
    count per group is ``target * sqrt(n_g) / sum_m sqrt(n_m)`` — rare
    groups are upweighted relative to their corpus share, capped at
    keeping every row (rate <= 1).  Alpha is fixed at 0.5 deliberately:
    IEEE-754 specifies sqrt exactly (bit-identical on every engine)
    while pow() is libm-dependent, so this is the one temperature whose
    thresholds are bit-reproducible in SQL.

    Determinism contract of the sample_by_hash family: keep a row iff
    ``splitmix64(key ^ seed) % 10000 < t_g`` with
    ``t_g = min(10000, (10000 * target * isqrt(n_g)) // (n_g * D))``,
    ``D = sum isqrt(n)`` — ALL-INTEGER arithmetic (Python bigints here,
    HUGEINT in the oracle), so no float sum-order hazard anywhere.

    Scale shape: ONE group-count shuffle (groups-scale table to the
    driver — languages, not rows), then a stateless per-row hash filter;
    no corpus shuffle, stable under repartition/resume."""
    from pyrdf2vec_ray.shuffle import bucket_count
    from pyrdf2vec_ray.util import to_table

    counts = to_table(bucket_count(
        docs.select_columns([group_col]), [group_col], "n")).to_pandas()
    n_by = {g: int(n) for g, n in zip(counts[group_col], counts["n"])}
    s_by = {g: int(np.floor(np.sqrt(float(n)))) for g, n in n_by.items()}
    den = sum(s_by.values())
    thr = {
        g: min(_N_BUCKETS,
               (_N_BUCKETS * int(target) * s_by[g]) // (n_by[g] * den))
        for g in n_by
    }

    def samp(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy(dtype=np.int64).view(np.uint64)
        h = (splitmix64(ids ^ np.uint64(seed))
             % np.uint64(_N_BUCKETS)).astype(np.int64)
        t = batch[group_col].map(lambda v: thr.get(v, 0)).to_numpy(
            dtype=np.int64)
        out = pd.DataFrame({key: batch[key].reset_index(drop=True),
                            group_col: batch[group_col].reset_index(
                                drop=True)})
        return out[h < t].reset_index(drop=True)

    return docs.select_columns([key, group_col]).map_batches(
        samp, batch_format="pandas")


def temperature_sample_sql(
    table: str = "documents",
    group_col: str = "lang",
    target: int = 300,
    seed: int = 0,
    key: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`temperature_sample` — counts, isqrt and
    the integer-division thresholds computed IN SQL (HUGEINT), shared
    splitmix64 fragment."""
    return (
        f"WITH _sm_in AS (SELECT {key}, {group_col} FROM {table}),\n"
        f"{splitmix64_sql(key, seed)},\n"
        f"b AS (SELECT {key}, {group_col}, "
        f"CAST(h % {_N_BUCKETS} AS BIGINT) AS b FROM s3),\n"
        f"cnt AS (SELECT {group_col}, count(*) AS n FROM {table} "
        f"GROUP BY {group_col}),\n"
        f"sq AS (SELECT {group_col}, n, "
        f"CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s FROM cnt),\n"
        f"dd AS (SELECT CAST(sum(s) AS HUGEINT) AS d FROM sq),\n"
        f"thr AS (SELECT {group_col}, least(CAST({_N_BUCKETS} AS HUGEINT), "
        f"(CAST({_N_BUCKETS} AS HUGEINT) * {int(target)} * s) "
        f"// (CAST(n AS HUGEINT) * dd.d)) AS t FROM sq, dd)\n"
        f"SELECT b.{key}, b.{group_col} FROM b "
        f"JOIN thr USING ({group_col}) WHERE b.b < thr.t"
    )


# ---- DSIR-style importance weighting ---------------------------------------

_WORD_RE = re.compile(r"[a-z']+")


def _binned_token_counts(
    docs: ray.data.Dataset, n_bins: int, text_col: str,
) -> "pd.DataFrame":
    """Corpus → hashed-unigram bin histogram: per-batch vectorized
    tokenize + md5-bin + bincount (combiner output ≤ n_bins rows per
    batch), one tiny bucket reduce, driver-side table of ≤ n_bins rows
    (a FIXED-size broadcast — bounded by the feature space, not the
    corpus, so the collect is scale-sound)."""
    from pyrdf2vec_ray.shuffle import bucket_agg

    def pre(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(_WORD_RE.findall(str(t).lower()))
        if toks:
            codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
            uh = np.fromiter(
                (int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                 for u in uniq), dtype=np.int64, count=len(uniq))
            bins = np.bincount(uh[codes] % n_bins, minlength=n_bins)
        else:
            bins = np.zeros(n_bins, dtype=np.int64)
        nz = np.nonzero(bins)[0]
        return pa.table({"bin": nz.astype(np.int64),
                         "n": bins[nz].astype(np.int64)})

    hist = bucket_agg(
        docs.map_batches(pre, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum")}, pre=False).to_pandas()
    return hist


def importance_weights(
    raw: ray.data.Dataset,
    target: ray.data.Dataset,
    n_bins: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every raw document by how target-like it is under hashed
    bag-of-words language models.  Tokens (the ``[a-z']+`` lowercase
    contract shared with the lang-id oracle) hash into ``n_bins``
    buckets via the md5-prefix hash (SQL-replayable); the target and
    raw corpora each reduce to a ``n_bins``-bucket unigram histogram;
    a document's log importance weight is

        logw(d) = Σ_tokens [ ln p̂_target(bin) − ln p̂_raw(bin) ]

    with add-one smoothing ``p̂(b) = (count_b + 1)/(total + n_bins)``.
    Resample by logw (top-k or Gumbel top-k) to select target-like
    training data.

    Output: ``(doc_id, n_tokens, logw)`` for every raw document
    (empty docs score 0).

    Scale shape: two histogram passes (per-batch bincount combiner →
    one ≤ n_bins-row reduce each) + one stateless scoring pass with the
    2 × n_bins float table captured by value (a fixed-size broadcast);
    no shuffle touches full rows, and the driver never holds more than
    2 × n_bins counters.  The scoring pass streams — at 100 TB it is
    the only pass over the raw corpus."""
    t_hist = _binned_token_counts(target, n_bins, text_col)
    r_hist = _binned_token_counts(raw, n_bins, text_col)

    ct = np.zeros(n_bins, dtype=np.float64)
    ct[t_hist["bin"].to_numpy()] = t_hist["n"].to_numpy(np.float64)
    cr = np.zeros(n_bins, dtype=np.float64)
    cr[r_hist["bin"].to_numpy()] = r_hist["n"].to_numpy(np.float64)
    lam = (np.log((ct + 1.0) / (ct.sum() + float(n_bins)))
           - np.log((cr + 1.0) / (cr.sum() + float(n_bins))))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].astype(str).tolist()
        toks: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tt = _WORD_RE.findall(t.lower())
            counts[i] = len(tt)
            toks.extend(tt)
        logw = np.zeros(len(texts), dtype=np.float64)
        if toks:
            codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
            uh = np.fromiter(
                (int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                 for u in uniq), dtype=np.int64, count=len(uniq))
            vals = lam[uh[codes] % n_bins]
            np.add.at(logw, np.repeat(np.arange(len(texts)), counts),
                      vals)
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "n_tokens": counts, "logw": logw})

    return raw.map_batches(score, batch_format="pandas",
                           batch_size=1024)


def source_kl(
    docs: ray.data.Dataset,
    group_col: str = "source",
    text_col: str = "text",
    n_bins: int = 256,
) -> "pd.DataFrame":
    """Distribution-drift diagnostic: KL(source ‖ corpus) over hashed
    unigram bins — which slice of the mixture is most unlike the
    blend (the health check run before re-weighting a source or
    debugging a scraper regression).  Same hashed-feature machinery as
    :func:`importance_weights` (md5 bins, add-one smoothing):

        kl_s = Σ_b p̂_s(b) · ln( p̂_s(b) / p̂_corpus(b) )

    Output (pandas, group-cardinality-sized): ``(group, n_tokens,
    kl)``.

    Scale shape: ONE combiner-bounded (group, bin) reduce — the table
    is groups × n_bins, never corpus-sized — then the KL folds on the
    driver over that bounded table (the fitted-stats residue class)."""
    from pyrdf2vec_ray.shuffle import bucket_agg

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        out_g: list = []
        out_b: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for g, t in zip(batch[group_col].tolist(),
                        batch[text_col].astype(str).tolist()):
            toks = _WORD_RE.findall(t.lower())
            if not toks:
                continue
            codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
            uh = np.fromiter(
                (int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                 for u in uniq), dtype=np.int64, count=len(uniq))
            bins = np.bincount(uh[codes] % n_bins, minlength=n_bins)
            nz = np.nonzero(bins)[0]
            out_g.append(np.full(len(nz), g, dtype=object))
            out_b.append(nz.astype(np.int64))
            out_n.append(bins[nz].astype(np.int64))
        if not out_g:
            return pd.DataFrame({group_col: [], "bin": [], "n": []})
        df = pd.DataFrame({group_col: np.concatenate(out_g),
                           "bin": np.concatenate(out_b),
                           "n": np.concatenate(out_n)})
        return df.groupby([group_col, "bin"], as_index=False).sum()

    hist = bucket_agg(
        docs.select_columns([group_col, text_col])
            .map_batches(pre, batch_format="pandas"),
        [group_col, "bin"], {"n": ("n", "sum")}, pre=False).to_pandas()

    groups = sorted(hist[group_col].unique().tolist())
    corpus = np.zeros(n_bins, dtype=np.float64)
    per: dict = {}
    for g in groups:
        h = np.zeros(n_bins, dtype=np.float64)
        sub = hist[hist[group_col] == g]
        h[sub["bin"].to_numpy()] = sub["n"].to_numpy(np.float64)
        per[g] = h
        corpus += h
    pc_all = (corpus + 1.0) / (corpus.sum() + float(n_bins))
    rows = []
    for g in groups:
        h = per[g]
        ps = (h + 1.0) / (h.sum() + float(n_bins))
        kl = float((ps * np.log(ps / pc_all)).sum())
        rows.append((g, int(h.sum()), kl))
    return pd.DataFrame(rows, columns=[group_col, "n_tokens", "kl"])
