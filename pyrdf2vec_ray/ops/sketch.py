"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) over a
grouped string column — the mergeable "novel sketch" of the task brief,
here: approximate distinct tokens per language.

Why a sketch at 100 TB: exact distinct counting shuffles every distinct
value; HLL shuffles at most ``groups × m`` tiny integer registers
(p=10 → 1024 per group, ±3.3% standard error) and registers merge by
max, so partial sketches combine per batch BEFORE the shuffle — the
canonical pre-aggregation pattern.

Determinism/oracle: the hash is the first 16 md5 hex digits as uint64
(same derivation the TF-IDF/fingerprint oracles use), bucket = top p
bits, rho = leading-zero rank of the remaining 64-p bits — all integer
logic DuckDB reproduces bit-for-bit (``length(bin(w))``), so the
REGISTER TABLE itself is value-checked by SQL; the float estimate is
checked against exact distinct counts in pytest (within the published
error bound).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

P_DEFAULT = 10


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0): branchless
    shift ladder — float log2 is NOT exact near power-of-two
    boundaries for 64-bit ints."""
    w = w.astype(np.uint64, copy=True)
    out = np.zeros(w.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(s))
        out += np.where(big, s, 0)
        w = np.where(big, w >> np.uint64(s), w)
    out += (w > 0).astype(np.int64)
    return out


def hll_registers(
    docs: ray.data.Dataset,
    group_col: str = "lang",
    text_col: str = "text",
    p: int = P_DEFAULT,
) -> ray.data.Dataset:
    """(group, reg, rho_max): HLL registers per group over the
    whitespace tokens of ``text_col``.  Per batch: explode + dedupe
    tokens, md5 once per distinct (factorize), bucket/rho in integer
    math, partial max per (group, bucket); then ONE small grouped-max
    shuffle over at most groups x 2**p rows."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    shift = np.uint64(64 - p)
    mask = np.uint64((1 << (64 - p)) - 1)
    wbits = 64 - p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].astype(str).reset_index(drop=True)
        grp = batch[group_col].reset_index(drop=True)
        toks = text.str.split()
        exploded = toks.explode().dropna()
        if not len(exploded):
            return pd.DataFrame(
                {group_col: pd.Series(dtype=grp.dtype),
                 "reg": pd.Series(dtype="int64"),
                 "rho_max": pd.Series(dtype="int64")}
            )
        pairs = pd.DataFrame(
            {group_col: grp.iloc[exploded.index].to_numpy(),
             "tok": exploded.to_numpy()}
        ).drop_duplicates()
        codes, uniq = pd.factorize(pairs["tok"].to_numpy())
        uh = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:16], 16)
             for u in uniq),
            dtype=np.uint64, count=len(uniq),
        )
        h = uh[codes]
        reg = (h >> shift).astype(np.int64)
        w = h & mask
        rho = wbits + 1 - _bitlen_u64(w)
        g = pd.DataFrame(
            {group_col: pairs[group_col].to_numpy(),
             "reg": reg, "rho_max": rho}
        )
        return g.groupby([group_col, "reg"], as_index=False).max()

    from pyrdf2vec_ray.shuffle import bucket_agg

    parts = docs.map_batches(partial, batch_format="pandas",
                             batch_size=4096)
    return bucket_agg(
        parts, [group_col, "reg"], {"rho_max": ("rho_max", "max")},
        pre=False,
    )


def hll_estimate(registers: pd.DataFrame, group_col: str = "lang",
                 p: int = P_DEFAULT) -> pd.DataFrame:
    """(group, est_distinct): the HLL estimator with the standard
    small-range (linear counting) correction, from a collected register
    table (groups x m rows — driver-scale by construction)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for g, rows in registers.groupby(group_col):
        regs = np.zeros(m, dtype=np.int64)
        regs[rows["reg"].to_numpy(dtype=np.int64)] = (
            rows["rho_max"].to_numpy(dtype=np.int64)
        )
        e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)
        out.append((g, float(e)))
    return pd.DataFrame(out, columns=[group_col, "est_distinct"])


# ---- Count-Min (Cormode & Muthukrishnan 2005) ------------------------------

CMS_SEEDS = (1000003, 2000029, 3000073, 4000037)
CMS_WIDTH = 1024


def cms_counters(
    docs: ray.data.Dataset,
    text_col: str = "text",
    width: int = CMS_WIDTH,
    seeds: tuple = CMS_SEEDS,
) -> ray.data.Dataset:
    """(d, j, cnt): Count-Min counter table over token OCCURRENCES —
    counters merge by sum, so per-batch partials pre-aggregate before
    ONE tiny shuffle of depth x width integer rows.  Point queries
    (``cms_query``) give overestimates bounded by ||f||_1 * e / width
    with prob 1 - e^-depth: the frequency companion to the HLL
    cardinality sketch.  Hash_d = splitmix64(md5_64(token) ^ seed_d)
    % width — bit-exact in SQL via the shared splitmix64_sql chains."""
    from pyrdf2vec_ray.ops.curate import splitmix64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].astype(str).reset_index(drop=True)
        exploded = text.str.split().explode().dropna()
        if not len(exploded):
            return pd.DataFrame(
                {"d": pd.Series(dtype="int64"),
                 "j": pd.Series(dtype="int64"),
                 "cnt": pd.Series(dtype="int64")}
            )
        codes, uniq = pd.factorize(exploded.to_numpy())
        occ = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        uh = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:16], 16)
             for u in uniq),
            dtype=np.uint64, count=len(uniq),
        )
        frames = []
        for d, seed in enumerate(seeds):
            j = (splitmix64(uh ^ np.uint64(seed))
                 % np.uint64(width)).astype(np.int64)
            cnt = np.zeros(width, dtype=np.int64)
            np.add.at(cnt, j, occ)
            nz = np.nonzero(cnt)[0]
            frames.append(pd.DataFrame(
                {"d": np.int64(d), "j": nz, "cnt": cnt[nz]}
            ))
        return pd.concat(frames, ignore_index=True)

    from pyrdf2vec_ray.shuffle import bucket_agg

    parts = docs.map_batches(partial, batch_format="pandas",
                             batch_size=4096)
    return bucket_agg(parts, ["d", "j"], {"cnt": ("cnt", "sum")},
                      pre=False)


def cms_query(
    counters: pd.DataFrame,
    tokens,
    width: int = CMS_WIDTH,
    seeds: tuple = CMS_SEEDS,
) -> pd.DataFrame:
    """(token, est): Count-Min point estimates (min over depths) from a
    collected counter table — depth x width rows, driver-scale."""
    from pyrdf2vec_ray.ops.curate import splitmix64

    tab = np.zeros((len(seeds), width), dtype=np.int64)
    tab[counters["d"].to_numpy(dtype=np.int64),
        counters["j"].to_numpy(dtype=np.int64)] = (
        counters["cnt"].to_numpy(dtype=np.int64)
    )
    uh = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in tokens),
        dtype=np.uint64, count=len(tokens),
    )
    ests = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    for d, seed in enumerate(seeds):
        j = (splitmix64(uh ^ np.uint64(seed))
             % np.uint64(width)).astype(np.int64)
        ests = np.minimum(ests, tab[d, j])
    return pd.DataFrame({"token": list(tokens), "est": ests})


def cms_sql(
    table: str = "documents",
    text_col: str = "text",
    width: int = CMS_WIDTH,
    seeds: tuple = CMS_SEEDS,
) -> str:
    """DuckDB oracle for :func:`cms_counters`: one splitmix64 chain per
    depth over the md5-64 token hashes, unioned, grouped count."""
    from pyrdf2vec_ray.ops.curate import splitmix64_sql

    chains = ",\n".join(
        splitmix64_sql("v", seed, suffix=f"_{d}", src="_cms_in")
        for d, seed in enumerate(seeds)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, CAST(h % {width} AS BIGINT) AS j FROM s3_{d}"
        for d in range(len(seeds))
    )
    return (
        f"WITH tok AS (\n"
        f"  SELECT unnest(list_filter(regexp_split_to_array({text_col}, "
        f"'\\s+'), x -> x != '')) AS tk FROM {table}\n"
        f"),\n"
        f"_cms_in AS (\n"
        f"  SELECT CAST(concat('0x', substr(md5(tk), 1, 16)) AS UBIGINT)"
        f" AS v FROM tok\n"
        f"),\n"
        f"{chains},\n"
        f"u AS (\n{union}\n)\n"
        f"SELECT d, j, CAST(count(*) AS BIGINT) AS cnt\n"
        f"FROM u GROUP BY d, j"
    )


# ---- Bloom filter (Bloom 1970) ---------------------------------------------

BLOOM_M = 4096
BLOOM_K = 3
BLOOM_SEED = 7000003


def bloom_words(
    docs: ray.data.Dataset,
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> ray.data.Dataset:
    """(word, bits): a Bloom filter over the corpus's whitespace tokens,
    laid out as ``m / 32`` 32-bit words (int64-safe, no sign traps on
    either the pandas or the DuckDB side).  The membership companion to
    HLL (how many distinct) and Count-Min (how often): "is this token /
    URL / benchmark id present at all" with zero false negatives —
    e.g. a decontamination pre-filter that runs BEFORE any shuffle.

    Mergeable by bitwise OR, so per-batch partials pre-combine and the
    single shuffle carries at most ``m / 32`` rows per batch.  Position
    d = splitmix64(md5_64(token) ^ (seed + d)) % m, the same hash
    derivations the CMS/HLL oracles reproduce bit-for-bit in SQL."""
    if m % 32:
        raise ValueError("m must be a multiple of 32")
    from pyrdf2vec_ray.ops.curate import splitmix64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].astype(str).reset_index(drop=True)
        toks = text.str.split().explode().dropna().unique()
        if not len(toks):
            return pd.DataFrame(
                {"word": pd.Series(dtype="int64"),
                 "bits": pd.Series(dtype="int64")}
            )
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
             for t in toks),
            dtype=np.uint64, count=len(toks),
        )
        words = np.zeros(m // 32, dtype=np.int64)
        for d in range(k):
            pos = (splitmix64(uh ^ np.uint64(seed + d))
                   % np.uint64(m)).astype(np.int64)
            np.bitwise_or.at(words, pos >> 5,
                             np.int64(1) << (pos & 31))
        nz = np.nonzero(words)[0]
        return pd.DataFrame({"word": nz, "bits": words[nz]})

    from pyrdf2vec_ray.shuffle import bucket_apply

    parts = docs.map_batches(partial, batch_format="pandas",
                             batch_size=4096)

    def or_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("word")
        codes, uniq = pd.factorize(g["word"].to_numpy())
        out = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(out, codes, g["bits"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"word": uniq.astype(np.int64), "bits": out})

    return bucket_apply(parts, ["word"], or_merge, batch_format="pandas")


def bloom_contains(
    words: pd.DataFrame,
    tokens,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> np.ndarray:
    """Boolean membership probe against a collected word table — true
    iff every one of the k bits is set (never a false negative)."""
    from pyrdf2vec_ray.ops.curate import splitmix64

    full = np.zeros(m // 32, dtype=np.int64)
    full[words["word"].to_numpy(dtype=np.int64)] = (
        words["bits"].to_numpy(dtype=np.int64)
    )
    uh = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in tokens),
        dtype=np.uint64, count=len(tokens),
    )
    hit = np.ones(len(uh), dtype=bool)
    for d in range(k):
        pos = (splitmix64(uh ^ np.uint64(seed + d))
               % np.uint64(m)).astype(np.int64)
        hit &= (full[pos >> 5] >> (pos & 31)) & 1 == 1
    return hit


def bloom_sql(
    table: str = "documents",
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB oracle for :func:`bloom_words`: one splitmix64 chain per
    hash function over the md5-64 token hashes, bit positions OR-folded
    per 32-bit word (OR is idempotent, so no DISTINCT needed)."""
    from pyrdf2vec_ray.ops.curate import splitmix64_sql

    chains = ",\n".join(
        splitmix64_sql("v", seed + d, suffix=f"_{d}", src="_bf_in")
        for d in range(k)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(h % {m} AS BIGINT) AS pos FROM s3_{d}"
        for d in range(k)
    )
    return (
        f"WITH tok AS (\n"
        f"  SELECT unnest(list_filter(regexp_split_to_array({text_col}, "
        f"'\\s+'), x -> x != '')) AS tk FROM {table}\n"
        f"),\n"
        f"_bf_in AS (\n"
        f"  SELECT CAST(concat('0x', substr(md5(tk), 1, 16)) AS UBIGINT)"
        f" AS v FROM tok\n"
        f"),\n"
        f"{chains},\n"
        f"u AS (\n{union}\n)\n"
        f"SELECT CAST(pos // 32 AS BIGINT) AS word,\n"
        f"       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits\n"
        f"FROM u GROUP BY pos // 32"
    )


def hll_registers_values(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    p: int = P_DEFAULT,
) -> ray.data.Dataset:
    """(group, reg, rho_max): HLL registers per group over a VALUE
    column — the event-stream form of :func:`hll_registers` (which
    tokenizes text), e.g. approximate distinct users per day over a
    corpus-scale event log.  Per batch: dedupe (group, value) pairs,
    md5 once per distinct value, partial max per (group, register);
    then ONE grouped-max shuffle over at most groups x 2**p rows —
    corpus-size-independent exchange, the whole point of the sketch."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    shift = np.uint64(64 - p)
    mask = np.uint64((1 << (64 - p)) - 1)
    wbits = 64 - p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {group_col: pd.Series(dtype="object"),
                 "reg": pd.Series(dtype="int64"),
                 "rho_max": pd.Series(dtype="int64")}
            )
        pairs = batch[[group_col, value_col]].drop_duplicates()
        vals = pairs[value_col].astype(str).to_numpy()
        codes, uniq = pd.factorize(vals)
        uh = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:16], 16)
             for u in uniq),
            dtype=np.uint64, count=len(uniq),
        )
        h = uh[codes]
        g = pd.DataFrame(
            {group_col: pairs[group_col].to_numpy(),
             "reg": (h >> shift).astype(np.int64),
             "rho_max": wbits + 1 - _bitlen_u64(h & mask)}
        )
        return g.groupby([group_col, "reg"], as_index=False).max()

    from pyrdf2vec_ray.shuffle import bucket_agg

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536)
    return bucket_agg(
        parts, [group_col, "reg"], {"rho_max": ("rho_max", "max")},
        pre=False,
    )


def hll_sliding_estimate(
    ds: ray.data.Dataset,
    day_col: str,
    value_col: str,
    window: int = 7,
    p: int = P_DEFAULT,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sliding-window approximate distinct count — e.g. trailing-7-day
    distinct users per day — by OR-merging (max) DAILY HLL registers
    across each window: the mergeability that justifies sketches in
    the first place, composed with the `ops/events.sliding_window`
    discipline (k-fold replication of PRE-AGGREGATED rows — register
    rows here, never events).  ``day_col`` must be an integer day
    (e.g. epoch days).  Output ``(day, est_distinct)`` for every day
    PRESENT in the input; day d covers ``[d - window + 1, d]``.

    Exchange budget: daily registers are days × 2^p rows
    (event-volume-independent); replication multiplies by ``window``;
    the merge is ONE (day, reg)-bucket max-reduce and the estimate is
    a day-bucket vectorized fold.  The estimator (alpha·m²/Σ2^-reg
    with linear-counting small-range correction) is exactly
    :func:`hll_estimate`'s."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from pyrdf2vec_ray.ops.join import hash_semi_join
    from pyrdf2vec_ray.shuffle import bucket_agg, bucket_apply, distinct

    regs = hll_registers_values(ds, day_col, value_col, p=p)

    def repl(batch: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for off in range(window):
            b = batch.copy()
            b[day_col] = b[day_col].to_numpy(np.int64) + off
            reps.append(b)
        return pd.concat(reps, ignore_index=True)

    win = regs.map_batches(repl, batch_format="pandas")
    merged = bucket_agg(win, [day_col, "reg"],
                        {"rho_max": ("rho_max", "max")},
                        num_buckets=num_buckets)
    i8 = np.dtype("int64")
    days = distinct(regs.select_columns([day_col]), [day_col],
                    num_buckets=num_buckets)
    merged = hash_semi_join(
        merged, days, on=[day_col], num_buckets=num_buckets,
        lschema={day_col: i8, "reg": i8, "rho_max": i8},
        rschema={day_col: i8})

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def est(g: pd.DataFrame) -> pd.DataFrame:
        out_day, out_est = [], []
        for day, rows in g.groupby(day_col):
            rho = rows["rho_max"].to_numpy(np.int64)
            present = len(rho)
            denom = float(m - present) + np.exp2(
                -rho.astype(np.float64)).sum()
            e = alpha * m * m / denom
            zeros = m - present
            if e <= 2.5 * m and zeros:
                e = m * np.log(m / zeros)
            out_day.append(day)
            out_est.append(float(e))
        return pd.DataFrame({day_col: np.array(out_day, dtype=np.int64),
                             "est_distinct": out_est})

    return bucket_apply(merged, [day_col], est,
                        num_buckets=num_buckets, batch_format="pandas")
