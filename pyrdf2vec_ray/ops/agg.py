"""Grouped order-statistics operators: top-k per group and exact
distributed quantiles.

Both are training-data curation staples — "keep the k highest-quality
documents per language" and "what is the p50/p90 document length per
source" — and both are shuffle-shaped wrong if done naively (a global
sort, or collecting every row of a group).  The designs here move only
what the statistic needs:

* ``topk_by_group`` pre-combines per batch (each batch keeps at most k
  rows per group it has seen), so the single bucket shuffle carries
  ≤ k × groups × num_batches rows, never the corpus.
* ``grouped_quantiles`` reduces the corpus to a (group, value, count)
  HISTOGRAM first — one tiny pre-aggregated shuffle — then reads the
  order statistic off cumulative counts per group.  For discrete-ish
  value domains (lengths, token counts, scores in fixed precision) this
  is EXACT, not an approximation: at 100 TB the histogram is bounded by
  the domain size, not the row count (cf. the t-digest family, which
  trades exactness for unbounded domains).

Determinism: top-k ties break by ``id_col`` ascending; the quantile is
DuckDB's ``quantile_disc`` element — sorted value at 1-based rank
``ceil(n * q)`` — so both are bit-reproducible in ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from pyrdf2vec_ray.shuffle import bucket_agg, bucket_apply


def topk_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    k: int,
    id_col: str,
    ascending: bool = False,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(group, id, score, rank): the k extreme rows per group by
    ``score_col`` (desc by default), ties broken by ``id_col`` asc,
    ``rank`` 1-based.  Per-batch partial top-k first (the combiner —
    top-k of a union is top-k of per-part top-ks), then ONE bucket
    shuffle of the shrunken candidate set and the same kernel per
    group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = [group_col, id_col, score_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[cols].sort_values(
            [group_col, score_col, id_col],
            ascending=[True, ascending, True],
        )
        return b.groupby(group_col, as_index=False, sort=False).head(k)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [group_col, score_col, id_col],
            ascending=[True, ascending, True],
        )
        top = g.groupby(group_col, as_index=False, sort=False).head(k).copy()
        top["rank"] = top.groupby(group_col, sort=False).cumcount() + 1
        return top.reset_index(drop=True)

    parts = ds.map_batches(partial, batch_format="pandas")
    return bucket_apply(parts, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas")


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.9),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(group, q, value): EXACT discrete quantiles per group — the
    sorted element at 1-based rank ``ceil(n * q)`` (probed against
    DuckDB ``quantile_disc`` across group sizes; both sides compute
    ``n * q`` in IEEE double, so the ranks agree bit-for-bit).
    Histogram
    pre-aggregation: the only shuffle is (group, value) → count, so the
    exchange is bounded by the value domain, not the row count."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    qs = list(qs)

    hist = bucket_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"n": (value_col, "size")},
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col]).reset_index(drop=True)
        n = g["n"].to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(g[group_col].to_numpy())
        starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
        ends = np.r_[starts[1:], len(g)]
        cum = np.cumsum(n)
        base = np.where(starts > 0, cum[starts - 1], 0)
        totals = cum[ends - 1] - base
        vals = g[value_col].to_numpy()
        out_g, out_q, out_v = [], [], []
        # loop over GROUPS (not rows): groups-per-bucket is small by
        # construction; each searchsorted is vectorized over the
        # group's histogram slice
        for gi in range(len(uniq)):
            within = cum[starts[gi]:ends[gi]] - base[gi]
            for q in qs:
                r = max(0, int(np.ceil(totals[gi] * q)) - 1)
                j = int(np.searchsorted(within, r, side="right"))
                out_g.append(uniq[gi])
                out_q.append(q)
                out_v.append(vals[starts[gi] + j])
        return pd.DataFrame(
            {group_col: out_g, "q": np.asarray(out_q, dtype=np.float64),
             value_col: out_v}
        )

    return bucket_apply(hist, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas")


def grouped_quantiles_sql(
    qs: Sequence[float] = (0.25, 0.5, 0.9),
    table: str = "documents",
    group_col: str = "lang",
    value_col: str = "n_chars",
) -> str:
    """DuckDB oracle for :func:`grouped_quantiles` — one
    ``quantile_disc`` per requested q, unioned."""
    legs = "\nUNION ALL\n".join(
        f"SELECT {group_col}, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc({value_col}, {q}) AS {value_col} "
        f"FROM {table} GROUP BY {group_col}"
        for q in qs
    )
    return legs


def zscore_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """(group, id, value, zscore): per-group standardization — the
    feature-normalization staple (z = (x - mean) / sample_std).  Two
    phases, no per-group collect: (1) one pre-aggregated shuffle of
    integer sufficient statistics (n, sum, sum of squares) — ints sum
    EXACTLY, so mean/std derive identically on every engine, making the
    float output bit-reproducible in SQL (stddev_samp's streaming
    accumulation would not be); (2) broadcast the tiny group-stats
    table and map.  Groups with n == 1 or zero variance emit
    zscore = 0.0 (the convention that keeps downstream filters
    total).

    Scale bound: the int64 sum-of-squares overflows when
    n * v^2 approaches 2^63 (~9.2e18) — e.g. 1e12 rows of 4-digit
    values are fine (1e12 * 1e8 = 1e20 is NOT; 1e12 * 1e6 = 1e18 is).
    Past that, pre-shift values by an approximate group mean (the
    sums stay exact and small) or accept float accumulation."""
    import ray

    from pyrdf2vec_ray.util import to_table

    def suffstats(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.int64)
        g = pd.DataFrame({group_col: batch[group_col].to_numpy(),
                          "n": 1, "s": v, "ss": v * v})
        return g.groupby(group_col, as_index=False).sum()

    stats = to_table(bucket_agg(
        ds.select_columns([group_col, value_col]).map_batches(
            suffstats, batch_format="pandas"
        ),
        [group_col],
        {"n": ("n", "sum"), "s": ("s", "sum"), "ss": ("ss", "sum")},
        pre=False,
    )).to_pandas()
    # sort under STRING order to match the str-cast searchsorted lookup
    # (numeric group columns sort differently: '10' < '2')
    stats = stats.assign(
        _k=stats[group_col].astype(str)).sort_values("_k")

    keys = stats["_k"].to_numpy().astype(np.str_)
    n = stats["n"].to_numpy(dtype=np.int64)
    s = stats["s"].to_numpy(dtype=np.int64)
    ss = stats["ss"].to_numpy(dtype=np.int64)
    # mirror the oracle's DOUBLE arithmetic op-for-op (cast before
    # multiply): the sums are exact ints, so both engines derive
    # identical doubles — and s*s in float avoids int64 overflow at
    # scale
    sf = s.astype(np.float64)
    ssf = ss.astype(np.float64)
    mean = sf / n
    var = np.where(n > 1, (ssf - sf * sf / n) / np.maximum(n - 1, 1), 0.0)
    std = np.sqrt(np.maximum(var, 0.0))
    ref = ray.put((keys, mean, std))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        k, mu, sd = ray.get(ref)
        gk = batch[group_col].to_numpy().astype(np.str_)
        idx = np.searchsorted(k, gk)
        v = batch[value_col].to_numpy(dtype=np.float64)
        sdv = sd[idx]
        z = np.where(sdv > 0, (v - mu[idx]) / np.where(sdv > 0, sdv, 1.0),
                     0.0)
        return pd.DataFrame(
            {group_col: batch[group_col].to_numpy(),
             id_col: batch[id_col].to_numpy(),
             value_col: batch[value_col].to_numpy(),
             "zscore": z}
        )

    return ds.select_columns([group_col, id_col, value_col]).map_batches(
        score, batch_format="pandas"
    )


def zscore_by_group_sql(
    table: str = "documents",
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`zscore_by_group` — the SAME closed-form
    derivation from exact integer sums (NOT stddev_samp, whose
    streaming accumulation differs in float order)."""
    return f"""
        WITH st AS (
          SELECT {group_col},
                 count(*) AS n,
                 sum(CAST({value_col} AS BIGINT)) AS s,
                 sum(CAST({value_col} AS BIGINT)
                     * CAST({value_col} AS BIGINT)) AS ss
          FROM {table} GROUP BY {group_col}
        ),
        ms AS (
          SELECT {group_col},
                 CAST(s AS DOUBLE) / n AS mu,
                 CASE WHEN n > 1 THEN
                   sqrt(GREATEST(
                     (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
                        * CAST(s AS DOUBLE) / n) / (n - 1), 0.0))
                 ELSE 0.0 END AS sd
          FROM st
        )
        SELECT t.{group_col}, t.{id_col}, t.{value_col},
               CASE WHEN ms.sd > 0
                    THEN (CAST(t.{value_col} AS DOUBLE) - ms.mu) / ms.sd
                    ELSE 0.0 END AS zscore
        FROM {table} t JOIN ms USING ({group_col})
    """


def approx_quantiles_by_sample(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.9),
    k: int = 256,
    seed: int = 0,
) -> ray.data.Dataset:
    """(group, q, value): approximate quantiles from a DETERMINISTIC
    bottom-k-by-hash sample — the unbounded-domain companion to
    :func:`grouped_quantiles` (whose histogram shuffle needs a bounded
    value domain).  The k rows with the smallest splitmix64 key hashes
    per group are a uniform sample without replacement (mergeable: the
    global bottom-k is the bottom-k of per-part bottom-ks — the grouped
    top-k combiner), so the whole sketch is reproducible in SQL and the
    shuffle carries at most k x groups x batches rows regardless of
    value domain.  DKW bound: rank error <= sqrt(ln(2/d)/(2k)) with
    prob 1-d — k=256 gives ~8% rank error at 95% confidence
    (pytest-pinned against exact quantiles)."""
    from pyrdf2vec_ray.ops.curate import sample_exact_per_group

    sampled_ids = sample_exact_per_group(
        ds.select_columns([group_col, id_col]), k, group_col,
        key=id_col, seed=seed,
    )
    # the sampled side and the final quantile stage are k x groups
    # rows — a handful of buckets beats the CPU-count default's
    # per-task fixed overhead (see shuffle.default_num_buckets)
    from pyrdf2vec_ray.ops.join import _dtypes_of, hash_semi_join

    left = ds.select_columns([group_col, id_col, value_col])
    # rschema hint: sampled_ids is a lazy shuffle chain whose schema is
    # known from the input — don't execute it twice just to read it
    sample_rows = hash_semi_join(
        left,
        sampled_ids.select_columns([id_col]),
        on=[id_col],
        rschema={id_col: _dtypes_of(left, None)[id_col]},
    )
    return grouped_quantiles(sample_rows.select_columns(
        [group_col, value_col]), group_col, value_col, qs,
        num_buckets=4)


def ecdf_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """(group, id, value, pct_rank): each row's percentile rank within
    its group — ``(rank - 1) / (n - 1)`` with ties sharing the minimum
    rank, exactly SQL's ``PERCENT_RANK()``.  The primitive behind
    "drop the bottom 10% quality per language" filters.

    Shuffle shape: ONE pre-aggregated (group, value) -> count histogram
    shuffle (bounded by the value domain, like grouped_quantiles), the
    cumulative table broadcasts, and ranking is a stateless vectorized
    map — corpus rows never shuffle.  Integer counts divide identically
    on both engines, so the float output is bit-reproducible in SQL.
    Single-row groups emit 0.0 (PERCENT_RANK's convention)."""
    import ray

    from pyrdf2vec_ray.util import to_table

    hist = to_table(bucket_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"n": (value_col, "size")},
    )).to_pandas().sort_values([group_col, value_col]).reset_index(drop=True)

    codes, uniq = pd.factorize(hist[group_col].to_numpy())
    n = hist["n"].to_numpy(dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
    cum = np.cumsum(n)
    base = np.where(starts > 0, cum[starts - 1], 0)
    # rank of a row with value v = #(v' < v in group) + 1 = exclusive
    # cumulative count at v
    excl = cum - n - base[codes]
    ends = np.r_[starts[1:], len(hist)]
    totals = (cum[ends - 1] - base)[codes]
    # \x01 separator: numpy strips trailing NUL "padding", which would
    # merge ("src1", 14) with ("src11", 4) — see curate.budget_sample
    gk = np.char.add(np.char.add(
        hist[group_col].to_numpy().astype(np.str_), "\x01"),
        hist[value_col].to_numpy().astype(np.str_))
    order = np.argsort(gk)
    ref = ray.put((gk[order], excl[order].astype(np.int64),
                   totals[order].astype(np.int64)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        keys, ex, tot = ray.get(ref)
        bk = np.char.add(np.char.add(
            batch[group_col].to_numpy().astype(np.str_), "\x01"),
            batch[value_col].to_numpy().astype(np.str_))
        idx = np.searchsorted(keys, bk)
        pct = np.where(tot[idx] > 1,
                       ex[idx] / np.maximum(tot[idx] - 1, 1), 0.0)
        return pd.DataFrame(
            {group_col: batch[group_col].to_numpy(),
             id_col: batch[id_col].to_numpy(),
             value_col: batch[value_col].to_numpy(),
             "pct_rank": pct.astype(np.float64)}
        )

    return ds.select_columns([group_col, id_col, value_col]).map_batches(
        score, batch_format="pandas"
    )


def filter_by_group_quantile(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    q: float,
    keep: str = "above",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Rows whose ``value_col`` is on the requested side of their
    group's q-quantile (``keep='above'``: value >= quantile;
    ``'below'``: value < quantile) — the distributed form of "drop
    each language's bottom-half quality".  The quantile table is
    groups x 1 rows (driver-scale by construction), broadcast once;
    the corpus filters in a stateless map with no shuffle of its
    own."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    import ray

    from pyrdf2vec_ray.util import to_table

    qt = to_table(grouped_quantiles(
        ds, group_col, value_col, (q,), num_buckets=num_buckets,
    )).to_pandas()
    # sort under STRING order — the lookup keys are str-cast, and
    # numeric group columns sort differently ('10' < '2')
    qt = qt.assign(_k=qt[group_col].astype(str)).sort_values("_k")
    keys = qt["_k"].to_numpy().astype(np.str_)
    cuts = qt[value_col].to_numpy()
    ref = ray.put((keys, cuts))

    def keep_fn(batch: pd.DataFrame) -> pd.DataFrame:
        k, c = ray.get(ref)
        idx = np.searchsorted(k, batch[group_col].to_numpy().astype(np.str_))
        cut = c[idx]
        v = batch[value_col].to_numpy()
        mask = v >= cut if keep == "above" else v < cut
        return batch[mask]

    return ds.map_batches(keep_fn, batch_format="pandas")


def global_topn(
    ds: ray.data.Dataset,
    n: int,
    score_col: str,
    id_col: str,
    ascending: bool = False,
    num_salt: int = 32,
    rank_col: str | None = None,
) -> ray.data.Dataset:
    """The n extreme rows of the WHOLE dataset by ``score_col`` (desc by
    default; ties by ``id_col`` asc), all input columns preserved,
    optional 1-based ``rank_col``.

    Three-level merge with BOUNDED fan-in at every level: per-batch
    partial top-n (the combiner), a salted bucket round (each of
    ``num_salt`` tasks sees only the candidates hashing to it), then
    one final task over <= num_salt * n rows — the final fan-in is
    independent of the input block count, the shape the knn merges use
    (VERDICT round-3 item 4)."""
    from pyrdf2vec_ray.shuffle import bucket_apply

    if n < 1:
        raise ValueError("n must be >= 1")
    asc = [ascending, True]
    by = [score_col, id_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(by, ascending=asc).head(n).copy()
        ids = b[id_col]
        if ids.dtype.kind in "iu":
            salt = ids.to_numpy(dtype=np.int64) % np.int64(num_salt)
        else:
            # string/other ids: deterministic pandas hash (fixed key),
            # so the salted round works for ANY id dtype — salting only
            # needs spread, not order
            salt = (pd.util.hash_pandas_object(ids, index=False)
                    .to_numpy() % np.uint64(num_salt)).astype(np.int64)
        b["_salt"] = salt
        return b

    def per_salt(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(by, ascending=asc).head(n)
                .reset_index(drop=True))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc).head(n)
        g = g.drop(columns=["_salt"]).reset_index(drop=True)
        if rank_col is not None:
            g[rank_col] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    merged = bucket_apply(parts, ["_salt"], per_salt,
                          num_buckets=num_salt, batch_format="pandas")
    return merged.repartition(1).map_batches(final, batch_format="pandas")


def winsorize_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(group, id, value, clipped): per-group winsorization — values
    clipped into the group's exact discrete [q_lo, q_hi] quantile range
    (``quantile_disc`` rank rule, same as :func:`grouped_quantiles`),
    the standard outlier-capping transform before length/quality
    features feed a model.  On an integer value domain the output is
    bit-reproducible in SQL.

    Scale shape: the quantile fit is the histogram shuffle of
    :func:`grouped_quantiles` (bounded by the value domain); the cut
    table is groups x 2 (driver-scale by construction), broadcast once
    via ``ray.put``; the corpus itself clips in a stateless map with no
    shuffle — the :func:`filter_by_group_quantile` shape with a clamp
    instead of a filter."""
    import ray

    from pyrdf2vec_ray.util import to_table

    qt = to_table(grouped_quantiles(
        ds.select_columns([group_col, value_col]), group_col, value_col,
        (q_lo, q_hi), num_buckets=num_buckets,
    )).to_pandas()
    # the lookup searchsorted runs on STRING keys, so the cut arrays
    # must be sorted under string order too (numeric group columns
    # sort differently: '10' < '2')
    qt = qt.assign(_k=qt[group_col].astype(str)).sort_values("_k")
    lo_t = qt[qt["q"] == q_lo]
    hi_t = qt[qt["q"] == q_hi]
    keys = lo_t["_k"].to_numpy().astype(np.str_)
    lo = lo_t[value_col].to_numpy()
    hi = hi_t[value_col].to_numpy()
    ref = ray.put((keys, lo, hi))

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        k, lo_a, hi_a = ray.get(ref)
        idx = np.searchsorted(k, batch[group_col].to_numpy().astype(np.str_))
        v = batch[value_col].to_numpy()
        return pd.DataFrame(
            {group_col: batch[group_col].to_numpy(),
             id_col: batch[id_col].to_numpy(),
             value_col: v,
             "clipped": np.minimum(np.maximum(v, lo_a[idx]), hi_a[idx])})

    return ds.select_columns([group_col, id_col, value_col]).map_batches(
        clip, batch_format="pandas")


def hot_keys(
    ds: ray.data.Dataset,
    key_col: str,
    k: int = 10,
) -> ray.data.Dataset:
    """(key, n, share): the k heaviest keys of a column with their row
    counts and corpus share — the skew DIAGNOSTIC the shuffle operators'
    partitioning contracts assume you run first ("a hot key's rows all
    land in one bucket; callers salt hot keys").  Surfacing the top
    offenders and their mass is how a 100-TB job decides between plain
    bucket shuffles, salting, and broadcast before launching the
    expensive stage.

    Scale shape: per-batch partial counts → one key-bucket reduce (the
    count table is key-cardinality-sized, already aggregated) → the
    bounded-fan-in :func:`global_topn` merge; the total for `share` sums
    the count table, never re-scanning rows.  Ties on n break by key
    ascending (cast to string for cross-type determinism)."""
    from pyrdf2vec_ray.shuffle import bucket_agg

    counts = bucket_agg(ds.select_columns([key_col]), [key_col],
                        {"n": (key_col, "size")}).materialize()
    # Dataset.sum on an EMPTY dataset returns None — or-0 keeps the
    # empty-stream diagnostic returning an empty result
    total = int(counts.sum("n") or 0)

    top = global_topn(counts, k, score_col="n", id_col=key_col)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key_col: batch[key_col],
             "n": batch["n"].to_numpy().astype(np.int64),
             "share": batch["n"].to_numpy(np.float64) / float(total)})

    return top.map_batches(finish, batch_format="pandas")


def pivot_counts(
    ds: ray.data.Dataset,
    row_col: str,
    pivot_col: str,
    values: Sequence[str],
    prefix: str = "n_",
) -> ray.data.Dataset:
    """Long → wide count matrix: one row per ``row_col`` key, one int64
    column per entry of ``values`` holding the number of input rows with
    that ``pivot_col`` value (absent combinations are 0).  This is the
    feature-matrix pivot behind "events per user by type" / "documents
    per source by language" tables that feed classifiers and dashboards.

    ``values`` is the EXPLICIT closed column list — the caller names the
    pivot domain up front (run :func:`hot_keys` / a distinct first if it
    is unknown), so the output schema is fixed and no driver pass is
    spent discovering it.  Rows whose pivot value is not in ``values``
    are dropped (they would have no column).

    Scale shape: per-batch partial (row, pivot) counts — the combiner
    bounds shuffle volume by keys-per-batch, not rows — then ONE
    row-key bucket shuffle whose per-bucket kernel is a vectorized
    pandas pivot_table.  The wide output is row-key-cardinality-sized.
    """
    from pyrdf2vec_ray.shuffle import bucket_apply

    vals = list(values)
    keep = set(vals)

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.select([row_col, pivot_col]).to_pandas()
        df = df[df[pivot_col].isin(keep)]
        g = df.groupby([row_col, pivot_col], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([row_col, pivot_col], as_index=False).agg(
            n=("n", "sum"))
        wide = g.pivot_table(index=row_col, columns=pivot_col,
                             values="n", fill_value=0, aggfunc="sum")
        out = pd.DataFrame({row_col: wide.index.to_numpy()})
        for v in vals:
            col = (wide[v] if v in wide.columns
                   else pd.Series(0, index=wide.index))
            out[prefix + str(v)] = col.to_numpy().astype(np.int64)
        return out.reset_index(drop=True)

    return bucket_apply(ds.select_columns([row_col, pivot_col]),
                        [row_col], per_bucket, batch_format="pandas",
                        pre=pre)


def profile_columns(
    ds: ray.data.Dataset,
    columns: Sequence[str],
) -> ray.data.Dataset:
    """Schema profiling: one output row per named column with
    ``(column, n_rows, n_null, n_distinct)`` — the pre-flight data-
    quality census a pipeline runs before committing a 100-TB job to a
    partitioning or join plan (nullable join keys and key cardinality
    are exactly what decide broadcast vs shuffle vs salt).

    Exactness contract: ``n_distinct`` is EXACT (nulls excluded, values
    compared by their string form — within one column this is injective
    for the int/str/date columns it is meant for).  For corpus-scale
    free-text columns where an exact per-column distinct shuffle is not
    worth it, use the mergeable HLL sketch (:mod:`ops/sketch`) instead;
    this operator is the exact small-domain complement.

    Scale shape: per-batch melt to distinct (column, value) partials —
    the combiner dedups within the batch, so the ONE bucket shuffle
    carries distinct-partial volume, not rows — then a per-bucket dedup
    and a tiny per-column count reduce.  Null/row counts ride a
    separate O(columns) per-batch partial that sums on the driver
    (columns × batches scalars, never data)."""
    from pyrdf2vec_ray.shuffle import bucket_count, distinct
    from pyrdf2vec_ray.util import to_table

    cols = list(columns)

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            s = batch[c]
            nn = s[s.notna()]
            u = pd.unique(nn.astype(str))
            frames.append(pd.DataFrame({"column": c, "value": u}))
        out = pd.concat(frames, ignore_index=True)
        return out

    def null_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"column": cols,
             "rows": [int(len(batch))] * len(cols),
             "nulls": [int(batch[c].isna().sum()) for c in cols]})

    pairs = distinct(
        ds.select_columns(cols).map_batches(melt, batch_format="pandas"),
        ["column", "value"])
    ndist = bucket_count(pairs, ["column"], count_col="n_distinct")

    nulls = (to_table(ds.select_columns(cols).map_batches(
        null_partial, batch_format="pandas")).to_pandas()
        .groupby("column", as_index=False).agg(
            n_rows=("rows", "sum"), n_null=("nulls", "sum")))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch.merge(nulls, on="column", how="left")
        return pd.DataFrame(
            {"column": m["column"].astype(str),
             "n_rows": m["n_rows"].to_numpy().astype(np.int64),
             "n_null": m["n_null"].to_numpy().astype(np.int64),
             "n_distinct": m["n_distinct"].to_numpy().astype(np.int64)})

    return ndist.map_batches(finish, batch_format="pandas")


def rank_in_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """SQL-window ``RANK() OVER (PARTITION BY group ORDER BY value)``
    plus ``PERCENT_RANK()``, as a distributed operator: every input row
    comes back with its 1-based min-rank within its group (ties share
    the rank of their first member, gaps after — exactly SQL ``RANK``)
    and pct = (rank-1)/(n-1) (0 for singleton groups, SQL
    ``PERCENT_RANK``).  Rank features ("document's length percentile
    within its language", "user's spend rank within cohort") are the
    window-function family :mod:`ops/events`' running totals and LAG
    gaps don't cover.

    Scale shape: ONE group-bucket shuffle carrying (group, id, value)
    — the payload stays behind — then a vectorized per-bucket
    ``groupby().rank(method='min')``.  All rows of a group co-locate;
    the usual hot-group contract applies (a group's rows must fit a
    bucket — run :func:`hot_keys` first; for corpus-scale single
    groups use :func:`grouped_quantiles`' histogram path instead)."""
    from pyrdf2vec_ray.shuffle import bucket_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rnk = g.groupby(group_col)[value_col].rank(method="min")
        n = g.groupby(group_col)[value_col].transform("size")
        out = g[[group_col, id_col, value_col]].copy()
        out["rnk"] = rnk.to_numpy().astype(np.int64)
        denom = np.maximum(n.to_numpy().astype(np.int64) - 1, 1)
        out["pct_rank"] = (out["rnk"].to_numpy() - 1) / denom
        return out.reset_index(drop=True)

    return bucket_apply(ds.select_columns([group_col, id_col, value_col]),
                        [group_col], per_bucket, batch_format="pandas")


def robust_stats(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
) -> ray.data.Dataset:
    """(group, median, mad): per-group median and median absolute
    deviation — the outlier-RESISTANT location/scale pair
    (:func:`zscore_by_group`'s mean/std break down exactly on the
    heavy-tailed length/score distributions curation filters care
    about; median/MAD don't).  MAD is genuinely two-pass (the deviation
    needs the median first); both passes are EXACT via the
    histogram-quantile machinery, so the result is bit-identical to
    DuckDB ``quantile_disc`` / ``quantile_disc(abs(x - med), 0.5)``.

    Scale shape: two (group, value)-histogram shuffles (each bounded by
    the value DOMAIN, not the row count — grouped_quantiles' contract)
    with the group→median table broadcast between them (group-
    cardinality-sized, the same broadcast bound as zscore_by_group's
    stats table).  Integer values in, integer median/MAD out."""
    from pyrdf2vec_ray.util import to_table

    med_pd = to_table(grouped_quantiles(
        ds.select_columns([group_col, value_col]), group_col, value_col,
        (0.5,))).to_pandas()
    med = dict(zip(med_pd[group_col], med_pd[value_col]))

    def deviations(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[group_col].map(med).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {group_col: batch[group_col],
             "dev": np.abs(batch[value_col].to_numpy(np.int64) - m)})

    mad_pd_ds = grouped_quantiles(
        ds.select_columns([group_col, value_col]).map_batches(
            deviations, batch_format="pandas"),
        group_col, "dev", (0.5,))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[group_col]
        return pd.DataFrame(
            {group_col: g,
             "median": g.map(med).to_numpy(dtype=np.int64),
             "mad": batch["dev"].to_numpy().astype(np.int64)})

    return mad_pd_ds.map_batches(finish, batch_format="pandas")


def grouping_sets_agg(
    ds: ray.data.Dataset,
    sets: Sequence[Sequence[str]],
    value_col: str,
    all_label: str = "ALL",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL ``GROUP BY GROUPING SETS`` (rollup / cube) in one pass:
    every grouping set's ``count(*)`` and ``sum(value_col)`` computed
    together, with a ``grouping_id`` bitmask column (bit i set ⇔ column
    i of the UNION of all sets is AGGREGATED AWAY in that row — the
    SQL ``GROUPING()`` convention) and aggregated-away string columns
    filled with ``all_label`` instead of NULL, so the output schema is
    closed and null-free (nullable group columns would make 'ALL'
    ambiguous — this operator requires non-null group keys).

    The classic uses: ``sets=[[a,b],[a],[]]`` is ``ROLLUP(a,b)``;
    all four subsets of ``{a,b}`` is ``CUBE(a,b)``.

    Scale shape: ONE pass, ONE shuffle — a per-batch combiner
    replicates each batch's partial aggregates once per grouping set
    (output rows ≤ Σ_set keys-in-batch, not rows × sets), then a single
    bucket shuffle keyed on (group cols, grouping_id) re-aggregates the
    partials.  No second pass per level, unlike a UNION-of-GROUP-BYs
    plan which rescans the input once per set.  ``value_col`` must be
    integer-exact (cents, counts) so partial sums are order-independent.
    """
    sets = [list(s) for s in sets]
    union_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in union_cols:
                union_cols.append(c)
    gids = [sum((1 << i) for i, c in enumerate(union_cols) if c not in s)
            for s in sets]

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.select(union_cols + [value_col]).to_pandas()
        parts = []
        for s, gid in zip(sets, gids):
            if s:
                g = df.groupby(s, as_index=False).agg(
                    n=(value_col, "size"), total=(value_col, "sum"))
            else:
                g = pd.DataFrame(
                    {"n": [len(df)], "total": [df[value_col].sum()]})
            for c in union_cols:
                if c not in s:
                    g[c] = all_label
            g["grouping_id"] = np.int64(gid)
            parts.append(g[union_cols + ["grouping_id", "n", "total"]])
        out = pd.concat(parts, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        out["total"] = out["total"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    keys = union_cols + ["grouping_id"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, as_index=False).agg(
            n=("n", "sum"), total=("total", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out["total"] = out["total"].astype(np.int64)
        return out

    return bucket_apply(ds, keys, per_bucket, num_buckets=num_buckets,
                        batch_format="pandas", pre=pre)


def grouped_linreg(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group ordinary-least-squares fit ``y ~ slope·x + intercept``
    (SQL ``regr_slope``/``regr_intercept``) from sufficient statistics:
    the corpus reduces to per-group ``(n, Σx, Σy, Σxy, Σx²)`` — a
    per-batch combiner then ONE tiny bucket shuffle, never the rows —
    and the closed form reads off the sums.  The same
    sufficient-statistics shape as the distributed PCA/k-means fits,
    specialized to the 1-feature exact-SQL-oracle case.

    Determinism contract: ``x``/``y`` must be INTEGER-valued (counts,
    cents) with per-group ``Σx·y`` < 2⁵³ — partial sums are exact int64
    in any order, and the final float64 formula
    ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` evaluated on those exact sums
    is bit-identical to the oracle computing the same expression in
    DOUBLE.  Zero-variance groups (all x equal) are dropped, matching
    ``WHERE n·Σx² − (Σx)² > 0``."""

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        part = pd.DataFrame(
            {group_col: df[group_col], "n": np.int64(1), "sx": x,
             "sy": y, "sxy": x * y, "sxx": x * x})
        return pa.Table.from_pandas(
            part.groupby(group_col, as_index=False).sum(),
            preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, as_index=False).sum()
        n = s["n"].to_numpy(np.float64)
        sx = s["sx"].to_numpy(np.float64)
        sy = s["sy"].to_numpy(np.float64)
        sxy = s["sxy"].to_numpy(np.float64)
        sxx = s["sxx"].to_numpy(np.float64)
        den = n * sxx - sx * sx
        keep = den > 0
        slope = (n * sxy - sx * sy)[keep] / den[keep]
        return pd.DataFrame(
            {group_col: s[group_col].to_numpy()[keep],
             "n": s["n"].to_numpy(np.int64)[keep],
             "slope": slope,
             "intercept": (sy[keep] - slope * sx[keep]) / n[keep]})

    return bucket_apply(ds, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas",
                        pre=pre)


def grouped_mode(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group modal value with a DETERMINISTIC tie-break (highest
    count, then smallest value — SQL ``mode()`` leaves ties
    unspecified, so the oracle is the explicit ROW_NUMBER form).
    Output ``(group, mode, n)``.

    Scale shape: the corpus reduces to a (group, value) count table via
    the pre-aggregating bucket shuffle (combiner-bounded), then ONE
    group-bucket exchange of count rows picks the argmax — rows never
    move twice, and the second shuffle carries distinct (group, value)
    pairs, not occurrences."""
    counts = bucket_agg(ds.select_columns([group_col, value_col]),
                        [group_col, value_col],
                        {"n": (value_col, "size")},
                        num_buckets=num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values([group_col, "n", value_col],
                             ascending=[True, False, True])
                .drop_duplicates(subset=[group_col], keep="first"))
        return pd.DataFrame(
            {group_col: top[group_col].to_numpy(),
             "mode": top[value_col].to_numpy(),
             "n": top["n"].to_numpy().astype(np.int64)})

    return bucket_apply(counts, [group_col], pick,
                        num_buckets=num_buckets, batch_format="pandas")


def grouped_corr(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group Pearson correlation (SQL ``corr``) from the same
    exact-int64 sufficient statistics as :func:`grouped_linreg`, plus
    ``Σy²``:  ``r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) ·
    (n·Σy² − (Σy)²))``.  Contract: inputs are integer-valued and every
    per-group sum (the binding one is ``Σy²``) fits int64 — the sums
    are then exact in any order, and even when a sum exceeds 2⁵³ both
    engines round the SAME exact integer to double (DuckDB sums in
    HUGEINT), so the float64 closed form still replays bit-identically.
    Groups where either variance is zero are dropped (``WHERE ... > 0``
    both)."""

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        part = pd.DataFrame(
            {group_col: df[group_col], "n": np.int64(1), "sx": x,
             "sy": y, "sxy": x * y, "sxx": x * x, "syy": y * y})
        return pa.Table.from_pandas(
            part.groupby(group_col, as_index=False).sum(),
            preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, as_index=False).sum()
        n = s["n"].to_numpy(np.float64)
        sx = s["sx"].to_numpy(np.float64)
        sy = s["sy"].to_numpy(np.float64)
        vx = n * s["sxx"].to_numpy(np.float64) - sx * sx
        vy = n * s["syy"].to_numpy(np.float64) - sy * sy
        keep = (vx > 0) & (vy > 0)
        cov = (n * s["sxy"].to_numpy(np.float64) - sx * sy)[keep]
        return pd.DataFrame(
            {group_col: s[group_col].to_numpy()[keep],
             "n": s["n"].to_numpy(np.int64)[keep],
             "r": cov / np.sqrt(vx[keep] * vy[keep])})

    return bucket_apply(ds, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas",
                        pre=pre)


def categorical_mi(
    ds: ray.data.Dataset,
    a_col: str,
    b_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Mutual information (nats) between two categorical columns —
    the dependence screen of a column-profiling pass (is `lang`
    informative about `source`? is a feature leaking the label?):
    ``MI = Σ_xy (n_xy/n) · ln(n·n_xy / (n_x·n_y))`` from exact joint
    counts.  Output: one row ``(n, n_pairs, mi)`` where ``n_pairs``
    is the number of distinct (a, b) combinations observed.

    Scale shape: ONE combiner-bounded (a, b) pair-count reduce (the
    joint table is category-cardinality-sized, not corpus-sized); the
    marginals and the MI sum fold vectorized inside a single-group
    finisher.  All counts are exact int64; the float expression on
    them matches the oracle's DOUBLE form (sum order differs only in
    the final reduction — rounding-tolerant compare)."""
    pairs = bucket_agg(ds.select_columns([a_col, b_col]),
                       [a_col, b_col], {"nxy": (a_col, "size")},
                       num_buckets=num_buckets)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        nxy = g["nxy"].to_numpy(np.float64)
        n = nxy.sum()
        na = g.groupby(a_col)["nxy"].transform("sum").to_numpy(np.float64)
        nb = g.groupby(b_col)["nxy"].transform("sum").to_numpy(np.float64)
        mi = float(((nxy / n) * np.log(n * nxy / (na * nb))).sum())
        return pd.DataFrame({"n": [np.int64(n)],
                             "n_pairs": [np.int64(len(g))],
                             "mi": [mi]})

    # the pair table is tiny by contract — one repartition(1) reduce
    return pairs.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


def rrf_fuse(
    rankings: Sequence[ray.data.Dataset],
    group_col: str,
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion (Cormack et al. 2009) of multiple
    per-group rankings — the standard hybrid-retrieval combiner (BM25
    list ⊕ vector list ⊕ ...): ``rrf(id) = Σ_lists 1/(k + rank)``
    over the lists that contain the id (1-based ranks), then a fused
    1-based ``rrf_rank`` per group (rrf desc, id asc — deterministic
    ties).  Output ``(group, id, rrf, rrf_rank)``.

    Float determinism: each list contributes one exact double
    ``1/(k+rank)``; addition over the handful of lists is
    order-insensitive for two lists (commutative) and
    rounding-covered beyond.

    Scale shape: union of the (already top-k-sized) ranking lists →
    ONE (group, id) bucket reduce summing contributions → one
    group-bucket pass assigning fused ranks.  Everything is
    candidate-list-sized, never corpus-sized."""
    if not rankings:
        raise ValueError("need at least one ranking")
    kk = float(k)

    def contrib(ds):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {group_col: batch[group_col],
                 id_col: batch[id_col],
                 "rrf": 1.0 / (kk + batch[rank_col]
                               .to_numpy(np.float64))})
        return ds.map_batches(fn, batch_format="pandas")

    uni = contrib(rankings[0])
    for ds in rankings[1:]:
        uni = uni.union(contrib(ds))

    summed = bucket_agg(uni, [group_col, id_col],
                        {"rrf": ("rrf", "sum")},
                        num_buckets=num_buckets, pre=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "rrf", id_col],
                          ascending=[True, False, True],
                          kind="mergesort").copy()
        g["rrf_rank"] = (g.groupby(group_col, sort=False).cumcount()
                         + 1).astype(np.int64)
        return g

    return bucket_apply(summed, [group_col], finish,
                        num_buckets=num_buckets, batch_format="pandas")


def grouped_entropy(
    ds: ray.data.Dataset,
    group_col: str,
    label_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Shannon entropy (nats) of the ``label_col`` distribution within
    each group — the mixing diagnostic next to :func:`categorical_mi`
    ("how language-diverse is each source?"; 0 = single label,
    ln(k) = uniform over k).  Output ``(group, n, n_labels, entropy)``.

    Scale shape: ONE combiner-bounded (group, label) count reduce
    (label-cardinality-sized), then a group-bucket finisher folds the
    entropy vectorized from exact integer counts — the float
    expression ``−Σ (n_l/n)·ln(n_l/n)`` shares the oracle's operation
    order (sum order differs within rounding)."""
    counts = bucket_agg(ds.select_columns([group_col, label_col]),
                        [group_col, label_col],
                        {"nl": (label_col, "size")},
                        num_buckets=num_buckets)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(group_col)["nl"].transform("sum") \
               .to_numpy(np.float64)
        nl = g["nl"].to_numpy(np.float64)
        p = nl / tot
        term = -(p * np.log(p))
        out = pd.DataFrame({group_col: g[group_col].to_numpy(),
                            "term": term, "one": np.int64(1),
                            "nl": g["nl"].to_numpy().astype(np.int64)})
        agg = out.groupby(group_col, as_index=False).agg(
            n=("nl", "sum"), n_labels=("one", "sum"),
            entropy=("term", "sum"))
        agg["n"] = agg["n"].astype(np.int64)
        agg["n_labels"] = agg["n_labels"].astype(np.int64)
        return agg

    return bucket_apply(counts, [group_col], finish,
                        num_buckets=num_buckets, batch_format="pandas")


def gini_int(ds: ray.data.Dataset, col: str) -> pa.Table:
    """Exact Gini coefficient of a non-negative int64 column — THE
    skew diagnostic for per-key load (events per user, docs per
    domain, rows per partition): 0 = perfectly even, →1 = one key
    holds everything.  Returns one row ``(n, total, gini)``.

    Distributed shape: the values compress to a counts-of-counts
    histogram in ONE combiner-bounded value-bucket reduce; the driver
    folds the closed-form rank formula over the histogram.  The
    driver-resident state is one row per DISTINCT value — for count
    data that domain is tiny (bounded by the hottest key's count, not
    by key cardinality: a trillion users still yield at most
    max-activity distinct counts).  For continuous values, quantize
    first — Gini is scale-free, the histogram grid sets the error.

    Formula (ties handled in closed form): sort distinct values x
    ascending with frequencies f and exclusive cumulative counts cb;
    the tied run occupies ranks cb+1..cb+f whose sum is
    f·cb + f(f+1)/2, so S = Σ x·(f·cb + f(f+1)/2) — all exact int64 —
    and gini = 2.0·S/(n·T) − (n+1)/n with a single float expression
    mirrored verbatim in the SQL oracle (window cumsum + integer
    division ``//2`` so both engines stay integer-exact until the one
    division)."""
    h = bucket_agg(ds, [col], {"f": (col, "size")})
    hp = h.to_pandas().sort_values(col).reset_index(drop=True)
    x = hp[col].to_numpy(np.int64)
    f = hp["f"].to_numpy(np.int64)
    if len(x) == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "total": pa.array([0], pa.int64()),
                         "gini": pa.array([0.0], pa.float64())})
    if (x < 0).any():
        raise ValueError("gini_int requires non-negative values")
    cb = np.concatenate(([np.int64(0)], np.cumsum(f)[:-1]))
    n = int(f.sum())
    # int64 bound, checked BEFORE any numpy product (numpy wraps
    # silently past 2^63 where the oracle would raise): T ≤ x_max·n and
    # every rank-sum term ≤ x·f·n, so S ≤ n·T ≤ n²·x_max — require
    # n²·x_max < 2^63 (conservative; exact Python-int arithmetic)
    if n and n * n * int(x.max()) >= (1 << 63):
        raise OverflowError(
            "gini_int rank-sum may exceed int64 (need n²·max(x) < "
            "2^63); pre-scale or bucket the values")
    t = int((x * f).sum())
    s = int((x * (f * cb + f * (f + 1) // 2)).sum())
    gini = (2.0 * s / (float(n) * t) - (n + 1.0) / n) if t > 0 else 0.0
    return pa.table({"n": pa.array([n], pa.int64()),
                     "total": pa.array([t], pa.int64()),
                     "gini": pa.array([gini], pa.float64())})


def grouped_chisq(
    ds: ray.data.Dataset,
    group_col: str,
    cat_col: str,
) -> ray.data.Dataset:
    """Per-group chi-square drift statistic of a categorical column
    against the POOLED distribution — the classic "is this source /
    nation / shard distributed like the rest" test behind mixture
    monitoring and seasonality checks.  For each group g with total
    t_g, category c with pooled total m_c and grand total G:
    ``chi2_g = Σ_c (o_gc − e_gc)² / e_gc`` with ``e_gc = t_g·(m_c/G)``
    — zero cells included (a group MISSING a category is evidence).
    Returns ``(group, n, chi2)``.

    Scale shape: one combiner-bounded (group, cat) count reduce; the
    pooled category totals (one row per category — the small side by
    definition) collect once and broadcast in the finisher closure;
    the per-group fold is ONE group-bucket shuffle of the already-
    reduced count table with a vectorized pivot/reindex kernel —
    groups never co-reside with raw rows, and no group×cat matrix
    ever sits on the driver.  Float contract: counts stay int64 to
    the end; e = t·(m/G) and (o−e)²/e are the verbatim oracle
    expressions; only the Σ_c order differs (numpy pairwise vs SQL
    sequential), which the 1e-6 comparison absorbs."""
    cnt = bucket_agg(
        ds, [group_col, cat_col], {"n": (group_col, "size")}
    ).materialize()

    # pooled totals: a second (tiny) cat-bucket reduce over the already
    # group×cat-reduced table — the driver sees one row per CATEGORY
    mt = (bucket_agg(cnt, [cat_col], {"m": ("n", "sum")}, pre=False)
          .to_pandas().sort_values(cat_col))
    cats = mt[cat_col].to_numpy()
    m = mt["m"].to_numpy(np.int64)
    grand = int(m.sum())
    share = m.astype(np.float64) / grand

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index=group_col, columns=cat_col,
                            values="n", aggfunc="sum", fill_value=0)
        piv = piv.reindex(columns=cats, fill_value=0)
        o = piv.to_numpy(np.int64)
        t = o.sum(axis=1)
        e = t[:, None].astype(np.float64) * share[None, :]
        d = o.astype(np.float64) - e
        chi2 = (d * d / e).sum(axis=1)
        return pd.DataFrame({group_col: piv.index.to_numpy(),
                             "n": t, "chi2": chi2})

    return bucket_apply(cnt, [group_col], per_bucket,
                        batch_format="pandas")


def grouped_weighted_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.5,),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(group, q, value): EXACT weighted quantiles per group — the
    smallest value whose cumulative weight reaches ``q × W_g`` (weights
    int64; the weighted-median staple: "the price point below which
    half the QUANTITY ships").  Same scale shape as
    :func:`grouped_quantiles`: the corpus reduces to a (group, value,
    Σweight) histogram in one combiner-bounded shuffle — the exchange
    is bounded by the value domain, not the row count — then one
    group-bucket pass reads thresholds off cumulative sums.

    Float contract: cumulative weights stay int64; the threshold is
    the ONE float op ``q × W`` (int promoted to double, single
    rounding) and selection is ``cum >= q·W`` — mirrored verbatim by
    a window-cumsum oracle, so results are bit-reproducible."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    qs = list(qs)

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({group_col: batch[group_col],
                          value_col: batch[value_col],
                          "f": batch[weight_col].to_numpy(np.int64)})
        return g.groupby([group_col, value_col], as_index=False).agg(
            f=("f", "sum"))

    hist = bucket_agg(
        ds.select_columns([group_col, value_col, weight_col]).map_batches(
            pre, batch_format="pandas"),
        [group_col, value_col], {"f": ("f", "sum")}, pre=False,
        num_buckets=num_buckets,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col]).reset_index(drop=True)
        f = g["f"].to_numpy(np.int64)
        codes, uniq = pd.factorize(g[group_col].to_numpy())
        starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
        ends = np.r_[starts[1:], len(g)]
        cum = np.cumsum(f)
        base = np.where(starts > 0, cum[starts - 1], 0)
        totals = cum[ends - 1] - base
        vals = g[value_col].to_numpy()
        out_g, out_q, out_v = [], [], []
        # loop over GROUPS (not rows); each searchsorted is vectorized
        # over the group's histogram slice
        for gi in range(len(uniq)):
            within = cum[starts[gi]:ends[gi]] - base[gi]
            for q in qs:
                thr = q * float(totals[gi])
                # first index with cum >= thr (q=1 lands exactly on
                # the last entry: 1.0*W == W in IEEE)
                j = int(np.searchsorted(within, thr, side="left"))
                j = min(j, len(within) - 1)
                out_g.append(uniq[gi])
                out_q.append(q)
                out_v.append(vals[starts[gi] + j])
        return pd.DataFrame(
            {group_col: out_g, "q": np.asarray(out_q, dtype=np.float64),
             value_col: out_v})

    return bucket_apply(hist, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas")


def value_histogram(
    ds: ray.data.Dataset,
    col: str,
    bins: int = 20,
) -> ray.data.Dataset:
    """Equal-width histogram of a float column — the profiling /
    dashboard primitive: ``(bin, lo, hi, n)`` for every NON-EMPTY bin
    of ``bins`` equal slices of [min, max], the last bin closed so
    the max lands inside.  Two passes, both reductions: per-block
    min/max partials fold to two driver scalars, then the bin index
    is one vectorized ``floor((v − lo)/w)`` per batch into a
    combiner-bounded ≤``bins``-key reduce — no sort, no sampling,
    exact counts.

    Float contract: min/max are exact; ``w = (max − min)/bins``,
    the index expression, and the edge reconstruction ``lo + bin·w``
    are single-rounding chains mirrored verbatim in SQL.  Degenerate
    case (max == min): every row lands in bin 0 with lo == hi."""
    if bins < 1:
        raise ValueError("bins must be >= 1")

    def mm(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(np.float64)
        if len(v) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    parts = ds.select_columns([col]).map_batches(
        mm, batch_format="pandas").to_pandas()
    lo, hi = float(parts["lo"].min()), float(parts["hi"].max())
    w = (hi - lo) / bins

    def idx(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(np.float64)
        if w > 0:
            b = np.minimum(np.floor((v - lo) / w),
                           bins - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        g = pd.DataFrame({"bin": b, "n": 1})
        return g.groupby("bin", as_index=False).sum()

    cnt = bucket_agg(
        ds.select_columns([col]).map_batches(idx, batch_format="pandas"),
        ["bin"], {"n": ("n", "sum")}, pre=False,
    )

    def edges(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch["bin"].to_numpy(np.int64)
        return pd.DataFrame(
            {"bin": b, "lo": lo + b.astype(np.float64) * w,
             "hi": lo + (b + 1).astype(np.float64) * w,
             "n": batch["n"].to_numpy(np.int64)})

    return cnt.map_batches(edges, batch_format="pandas")


def cramers_v(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
) -> "pa.Table":
    """Cramér's V association between two categorical columns — the
    normalized chi-square dependence screen ("is language confounded
    with source?") feature-selection and leakage checks run before
    stratifying.  One row: ``(n, chi2, n_a, n_b, v)`` with
    ``v = sqrt(chi2 / (n·min(n_a−1, n_b−1)))`` against the
    independence model ``e_ij = r_i·c_j/n`` (zero cells included).

    Scale shape: ONE combiner-bounded (a, b) pair-count reduce —
    the exchange is category-cardinality² rows, never the corpus —
    then the driver folds the (bounded) contingency table.  Float
    contract: counts and margins stay int64; e, (o−e)²/e and the
    final sqrt are the verbatim oracle expressions; Σ order over
    cells is the only divergence, absorbed by the 1e-6 comparison."""
    cnt = bucket_agg(
        ds.select_columns([col_a, col_b]), [col_a, col_b],
        {"o": (col_a, "size")},
    ).to_pandas()
    piv = cnt.pivot_table(index=col_a, columns=col_b, values="o",
                          aggfunc="sum", fill_value=0)
    o = piv.to_numpy(np.int64)
    r = o.sum(axis=1)
    c = o.sum(axis=0)
    n = int(o.sum())
    e = r[:, None].astype(np.float64) * c[None, :] / n
    d = o.astype(np.float64) - e
    chi2 = float((d * d / e).sum())
    n_a, n_b = o.shape
    mindof = min(n_a - 1, n_b - 1)
    v = float(np.sqrt(chi2 / (float(n) * mindof))) if mindof > 0 else 0.0
    return pa.table({"n": pa.array([n], pa.int64()),
                     "chi2": pa.array([chi2], pa.float64()),
                     "n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64()),
                     "v": pa.array([v], pa.float64())})


def grouped_gini(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-GROUP Gini coefficient of a non-negative int64 column —
    :func:`gini_int` kept distributed: "how concentrated is activity
    within each event type / revenue within each nation".  Returns
    ``(group, n, total, gini)``.

    Scale shape: one combiner-bounded (group, value)→count histogram
    exchange, then the exact tie-aware rank formula folds VECTORIZED
    per group inside one group-bucket pass — groups never collect to
    the driver (unlike the global fold in gini_int, whose driver
    histogram is the right call for one group).  Same float contract:
    int64 to the end, then the single mirrored expression
    ``2·S/(n·T) − (n+1)/n``."""
    hist = bucket_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col], {"f": (value_col, "size")},
        num_buckets=num_buckets,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col]).reset_index(drop=True)
        x = g[value_col].to_numpy(np.int64)
        if (x < 0).any():
            raise ValueError("grouped_gini requires non-negative values")
        f = g["f"].to_numpy(np.int64)
        codes, uniq = pd.factorize(g[group_col].to_numpy())
        starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
        ends = np.r_[starts[1:], len(g)]
        cumf = np.cumsum(f)
        basef = np.where(starts > 0, cumf[starts - 1], 0)
        # exclusive within-group cumulative count per histogram row
        cb = np.r_[0, cumf[:-1]] - np.repeat(basef, ends - starts)
        terms = x * (f * cb + f * (f + 1) // 2)
        cumt = np.cumsum(terms)
        baset = np.where(starts > 0, cumt[starts - 1], 0)
        s = cumt[ends - 1] - baset
        n = cumf[ends - 1] - basef
        # same int64 bound as gini_int (S ≤ n²·x_max per group), checked
        # BEFORE the cumsum products wrap: exact Python-int check per
        # group — few groups per bucket, so the loop is cheap
        xmax = np.maximum.reduceat(x, starts)
        for ng, xm in zip(n.tolist(), xmax.tolist()):
            if ng and ng * ng * xm >= (1 << 63):
                raise OverflowError(
                    "grouped_gini rank-sum may exceed int64 for a "
                    "group (need n²·max(x) < 2^63 per group); "
                    "pre-scale or bucket the values")
        cumxf = np.cumsum(x * f)
        basexf = np.where(starts > 0, cumxf[starts - 1], 0)
        t = cumxf[ends - 1] - basexf
        nf = n.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            gini = np.where(
                t > 0, 2.0 * s / (nf * t) - (n + 1.0) / n, 0.0)
        return pd.DataFrame({group_col: uniq, "n": n, "total": t,
                             "gini": gini})

    return bucket_apply(hist, [group_col], per_bucket,
                        num_buckets=num_buckets, batch_format="pandas")


def _score_class_counts(ds, score_col, label_col, num_buckets):
    """(score, pos, neg) exact int64 counts per DISTINCT score, sorted
    ascending — the shared reduction of auc_exact / pr_curve: per-batch
    combiner + ONE score-bucket reduce, then the value-domain-scale
    table collects for the fold (bound contract stated by callers)."""

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        lab = batch[label_col].to_numpy(np.int64)
        if ((lab != 0) & (lab != 1)).any():
            raise ValueError(f"{label_col} must be binary 0/1")
        part = pd.DataFrame({
            "score": batch[score_col].to_numpy(np.int64),
            "pos": lab, "neg": np.int64(1) - lab})
        return part.groupby("score", as_index=False).sum()

    counts = bucket_agg(
        ds.select_columns([score_col, label_col]).map_batches(
            pre, batch_format="pandas"),
        ["score"], {"pos": ("pos", "sum"), "neg": ("neg", "sum")},
        num_buckets=num_buckets, pre=False)
    return counts.to_pandas().sort_values("score").reset_index(drop=True)


def auc_exact(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact ROC AUC of an integer score against a binary label — the
    Mann–Whitney rank statistic with the standard tie adjustment (a
    tied positive/negative pair counts ½), computed WITHOUT a global
    row sort:

        2U  =  Σ_v  pos_v · (2·neg_below(v) + neg_v)
        AUC =  2U / (2 · n_pos · n_neg)

    so everything except the final division is exact int64 and the
    result replays bit-identically in SQL (window-function oracle).
    Output: ONE row ``(n_pos, n_neg, auc_num, auc_den, auc)`` with
    ``auc_num = 2U``, ``auc_den = 2·n_pos·n_neg`` (AUC undefined when
    a class is empty — then num = den = 0 and ``auc`` is NaN exactly
    like SQL's NULL-division).

    Scale shape: per-batch (score → pos/neg count) combiner + ONE
    score-bucket reduce; the fold then runs over the DISTINCT-SCORE
    table — value-domain scale, not row scale, the same bound contract
    as `hot_keys` / `value_histogram` (integer scores from counts,
    ranks, or quantized models have bounded domains; quantize first
    otherwise — the bound is stated here because the fold collects
    that table).  Overflow: needs ``2·n_pos·n_neg < 2^63`` (any corpus
    below ~2·10⁹ rows of each class), checked explicitly."""

    c = _score_class_counts(ds, score_col, label_col, num_buckets)
    pos = c["pos"].to_numpy(np.int64)
    neg = c["neg"].to_numpy(np.int64)
    n_pos, n_neg = int(pos.sum()), int(neg.sum())
    if n_pos and n_neg and 2 * n_pos * n_neg >= (1 << 63):
        raise OverflowError(
            "auc_exact needs 2*n_pos*n_neg < 2^63; subsample first")
    cum_below = np.concatenate([[0], np.cumsum(neg)[:-1]])
    u2 = int((pos * (2 * cum_below + neg)).sum())
    den = 2 * n_pos * n_neg
    return ray.data.from_arrow(pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_num": pa.array([u2 if den else 0], pa.int64()),
        "auc_den": pa.array([den], pa.int64()),
        "auc": pa.array([u2 / den if den else float("nan")],
                        pa.float64()),
    }))


def pr_curve(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Precision/recall operating points at EVERY distinct score
    threshold (predict positive iff ``score >= threshold``) — the
    curve a pipeline reports next to :func:`auc_exact`.  Output one
    row per distinct score, descending:
    ``(threshold, tp, fp, fn, precision, recall)`` with exact int64
    counts and float64 ratios formed as ``tp / (tp + fp)`` /
    ``tp / n_pos`` (the SQL oracle writes the same divisions, so
    parity is bit-for-bit).

    Scale shape: the shared `_score_class_counts` reduction (per-batch
    combiner + ONE score-bucket exchange), then cumulative sums over
    the DISTINCT-SCORE table — value-domain scale with the same stated
    bound as :func:`auc_exact` / `hot_keys`."""
    c = _score_class_counts(ds, score_col, label_col, num_buckets)
    c = c.iloc[::-1].reset_index(drop=True)  # descending thresholds
    pos = c["pos"].to_numpy(np.int64)
    neg = c["neg"].to_numpy(np.int64)
    tp = np.cumsum(pos)
    fp = np.cumsum(neg)
    n_pos = int(pos.sum())
    fn = n_pos - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = tp.astype(np.float64) / np.maximum(tp + fp, 1)
        recall = (tp.astype(np.float64) / n_pos if n_pos
                  else np.zeros(len(tp)))
    return ray.data.from_arrow(pa.table({
        "threshold": pa.array(c["score"].to_numpy(np.int64),
                              pa.int64()),
        "tp": pa.array(tp, pa.int64()),
        "fp": pa.array(fp, pa.int64()),
        "fn": pa.array(fn, pa.int64()),
        "precision": pa.array(precision, pa.float64()),
        "recall": pa.array(recall, pa.float64()),
    }))


def calibration_bins(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    score_max: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Reliability diagram for an integer score: equal-width bins over
    ``[0, score_max]`` with each bin's exact count, mean score, and
    positive rate — the third leg of the eval family
    (:func:`auc_exact` ranks, :func:`pr_curve` thresholds, this one
    asks whether the score MAGNITUDE is honest).  Output one row per
    non-empty bin: ``(bin, lo, hi, n, n_pos, mean_score, pos_rate)``;
    ``score_max`` defaults to the observed max (one extra value-domain
    fold, no extra exchange — the distinct-score table is already
    collected).

    Bin rule: ``bin = floor(score * n_bins / (score_max + 1))`` —
    integer arithmetic only, so the SQL oracle bins identically
    (``CAST(score * n_bins / (score_max + 1) AS BIGINT)`` with BIGINT
    division truncating like floor for non-negative scores; negative
    scores raise here).

    Scale shape: the shared `_score_class_counts` reduction, then a
    bin fold over the distinct-score table (value-domain scale, stated
    bound as for auc_exact)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    c = _score_class_counts(ds, score_col, label_col, num_buckets)
    if len(c) and int(c["score"].min()) < 0:
        raise ValueError("calibration_bins needs non-negative scores")
    if score_max is None:
        score_max = int(c["score"].max()) if len(c) else 0
    s = c["score"].to_numpy(np.int64)
    pos = c["pos"].to_numpy(np.int64)
    tot = pos + c["neg"].to_numpy(np.int64)
    b = s * np.int64(n_bins) // np.int64(score_max + 1)
    g = pd.DataFrame({"bin": b, "n": tot, "n_pos": pos, "sn": s * tot})
    g = g.groupby("bin", as_index=False).sum()
    width = (score_max + 1) / n_bins
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(g["bin"].to_numpy(np.int64), pa.int64()),
        "lo": pa.array(g["bin"].to_numpy(np.int64) * width,
                       pa.float64()),
        "hi": pa.array((g["bin"].to_numpy(np.int64) + 1) * width,
                       pa.float64()),
        "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        "n_pos": pa.array(g["n_pos"].to_numpy(np.int64), pa.int64()),
        "mean_score": pa.array(
            g["sn"].to_numpy(np.int64)
            / g["n"].to_numpy(np.float64), pa.float64()),
        "pos_rate": pa.array(
            g["n_pos"].to_numpy(np.int64)
            / g["n"].to_numpy(np.float64), pa.float64()),
    }))


def grouped_auc(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    label_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group exact ROC AUC — the sliced-evaluation form of
    :func:`auc_exact` (per-language, per-source, per-cohort model
    monitoring): same Mann–Whitney 2U with ½-tie adjustment, same
    int64-exact arithmetic, but the fold is FULLY DISTRIBUTED — no
    driver collection at all: per-batch (group, score) → pos/neg
    combiner, ONE (group, score)-bucket reduce, then ONE group-bucket
    exchange where each bucket folds its groups with vectorized
    segment cumsums (sort within bucket + reduceat — no per-group
    Python loop).  Output one row per group:
    ``(group, n_pos, n_neg, auc_num, auc_den, auc)``; single-class
    groups get num = den = 0 and NaN like auc_exact.  Overflow bound
    ``2·n_pos·n_neg < 2^63`` is PER GROUP, checked."""
    from pyrdf2vec_ray.shuffle import bucket_agg, bucket_apply

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        lab = batch[label_col].to_numpy(np.int64)
        if ((lab != 0) & (lab != 1)).any():
            raise ValueError(f"{label_col} must be binary 0/1")
        part = pd.DataFrame({
            group_col: batch[group_col].to_numpy(),
            "score": batch[score_col].to_numpy(np.int64),
            "pos": lab, "neg": np.int64(1) - lab})
        return part.groupby([group_col, "score"], as_index=False).sum()

    counts = bucket_agg(
        ds.select_columns([group_col, score_col, label_col])
        .map_batches(pre, batch_format="pandas"),
        [group_col, "score"],
        {"pos": ("pos", "sum"), "neg": ("neg", "sum")},
        num_buckets=num_buckets, pre=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        from pyrdf2vec_ray.shuffle import segment_spans

        g = g.sort_values([group_col, "score"]).reset_index(drop=True)
        keys, codes = np.unique(g[group_col].to_numpy(), return_inverse=True)
        starts, lens = segment_spans(np.sort(codes))
        pos = g["pos"].to_numpy(np.int64)
        neg = g["neg"].to_numpy(np.int64)
        ends = starts + lens
        n_pos = np.add.reduceat(pos, starts)
        n_neg = np.add.reduceat(neg, starts)
        if (2.0 * n_pos * n_neg >= float(1 << 63)).any():
            raise OverflowError(
                "grouped_auc needs 2*n_pos*n_neg < 2^63 per group")
        # cum_below per row WITHIN its group: global cumsum minus the
        # group's base (the value just before its first row)
        cum = np.cumsum(neg)
        base = np.where(starts > 0, cum[starts - 1], 0)
        cum_below = np.concatenate([[0], cum[:-1]])
        cum_below = cum_below - np.repeat(base, lens)
        cum_below[starts] = 0
        u2_terms = pos * (2 * cum_below + neg)
        u2 = np.add.reduceat(u2_terms, starts)
        den = 2 * n_pos * n_neg
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = np.where(den > 0, u2 / np.maximum(den, 1),
                           np.nan)
        return pd.DataFrame({
            group_col: keys,
            "n_pos": n_pos, "n_neg": n_neg,
            "auc_num": np.where(den > 0, u2, 0).astype(np.int64),
            "auc_den": den.astype(np.int64),
            "auc": auc.astype(np.float64)})

    return bucket_apply(counts, [group_col], fold,
                        num_buckets=num_buckets, batch_format="pandas")
