"""Declarative data-quality expectation checks (the
Great-Expectations-style validation gate a production pipeline runs
before promoting a table): a rule list is evaluated in ONE streaming
pass and the result is a tiny ``(rule, n_checked, n_violations)``
table — the contract a CI gate or freshness monitor asserts on.

Supported rule kinds:

- ``not_null``   — violation: value is null
- ``range``      — violation: non-null value outside ``[lo, hi]``
- ``in_set``     — violation: non-null value not in ``values``
- ``regex``      — violation: non-null string without a regex match
                   (``re.search`` semantics — DuckDB
                   ``regexp_matches`` pairs exactly)
- ``unique``     — violation count: ``n_rows − n_distinct`` values

Scale shape: every rowwise rule folds into one ``map_batches`` that
emits len(rules) partial-count rows per block; ``unique`` rules ride
the SAME reduce via an algebraic trick — the rowwise pass contributes
``+n_rows`` to their violation sum and a ``shuffle.distinct`` on the
column contributes ``−1`` per distinct value, so the single
rule-bucket sum lands on ``n_rows − n_distinct`` with no count()
action, no driver state, and no second aggregate.  Nulls are skipped
(not violations) for range/in_set/regex; ``not_null`` is the explicit
null gate.  The exchange is rules × blocks rows for rowwise checks
plus the distinct-value stream for unique ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from pyrdf2vec_ray.shuffle import bucket_agg, distinct

_KINDS = ("not_null", "range", "in_set", "regex", "unique")


def _validate_rules(rules: list[dict]) -> None:
    names = set()
    for r in rules:
        if r.get("kind") not in _KINDS:
            raise ValueError(f"unknown rule kind {r.get('kind')!r}")
        if not r.get("rule") or not r.get("col"):
            raise ValueError(f"rule needs 'rule' and 'col': {r}")
        if r["rule"] in names:
            raise ValueError(f"duplicate rule name {r['rule']!r}")
        names.add(r["rule"])
        if r["kind"] == "range" and ("lo" not in r or "hi" not in r):
            raise ValueError(f"range rule needs lo/hi: {r}")
        if r["kind"] == "in_set" and not r.get("values"):
            raise ValueError(f"in_set rule needs values: {r}")
        if r["kind"] == "regex" and not r.get("pattern"):
            raise ValueError(f"regex rule needs pattern: {r}")


def check_expectations(
    ds: ray.data.Dataset,
    rules: list[dict],
) -> ray.data.Dataset:
    """Evaluate ``rules`` over ``ds``; returns a Dataset with one row
    per rule: ``(rule, n_checked, n_violations)``.  ``n_checked`` is
    the table's row count for every rule (rows the rule LOOKED at;
    null-skipping affects violations, not the denominator)."""
    _validate_rules(rules)
    rowwise = [r for r in rules if r["kind"] != "unique"]
    uniques = [r for r in rules if r["kind"] == "unique"]
    cols = sorted({r["col"] for r in rules})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        names, viols = [], []
        for r in rowwise:
            s = batch[r["col"]]
            nn = s.notna()
            if r["kind"] == "not_null":
                v = int((~nn).sum())
            elif r["kind"] == "range":
                x = pd.to_numeric(s, errors="coerce")
                v = int((nn & ((x < r["lo"]) | (x > r["hi"]))).sum())
            elif r["kind"] == "in_set":
                v = int((nn & ~s.isin(r["values"])).sum())
            else:  # regex
                hit = s.str.contains(r["pattern"], regex=True, na=False)
                v = int((nn & ~hit).sum())
            names.append(r["rule"])
            viols.append(v)
        for r in uniques:
            # +n_rows now; the distinct stream below contributes −1 per
            # distinct value, so the rule-bucket sum = n − n_distinct
            names.append(r["rule"])
            viols.append(n)
        return pd.DataFrame(
            {"rule": names,
             "n_checked": np.full(len(names), n, dtype=np.int64),
             "n_violations": np.asarray(viols, dtype=np.int64)})

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas")

    for r in uniques:
        dvals = distinct(ds.select_columns([r["col"]]), [r["col"]])
        name = r["rule"]

        def minus_one(batch: pd.DataFrame, _n=name) -> pd.DataFrame:
            m = len(batch)
            return pd.DataFrame(
                {"rule": [_n] * m,
                 "n_checked": np.zeros(m, dtype=np.int64),
                 "n_violations": np.full(m, -1, dtype=np.int64)})

        parts = parts.union(dvals.map_batches(
            minus_one, batch_format="pandas"))

    return bucket_agg(parts, ["rule"],
                      {"n_checked": ("n_checked", "sum"),
                       "n_violations": ("n_violations", "sum")})


def benford_firstdigit(
    ds: ray.data.Dataset,
    col: str,
    scale: int = 100,
) -> ray.data.Dataset:
    """Benford's-law audit of a positive numeric column — the classic
    fabricated-data / unit-mixing screen: the first significant digit
    of naturally-spread magnitudes follows ``p(d) = log10(1 + 1/d)``,
    and a synthetic or clipped column doesn't.  Returns 9 rows
    ``(digit, observed, expected, term)`` with ``expected = n·p(d)``
    and ``term = (observed − expected)²/expected`` — Σ term is the
    chi-square statistic, left per-digit so the report shows WHICH
    digit deviates.

    Determinism: values quantize to exact int64 units (``round(v ×
    scale)``; rows ≤ 0 after quantization are excluded — zero has no
    first digit) and the digit comes from the canonical base-10
    integer string, not float log10 — identical on every engine.
    Scale shape: one combiner-bounded reduce over a NINE-key domain;
    the Benford fold is driver arithmetic on 9 rows."""

    def digits(batch: pd.DataFrame) -> pd.DataFrame:
        # floor(v+0.5) = round-half-AWAY for positives, matching SQL
        # round(); np.round is half-to-even and would diverge on exact
        # .5 products (rows that land ≤ 0 are excluded on both engines)
        units = np.floor(
            batch[col].to_numpy(np.float64) * scale + 0.5).astype(np.int64)
        units = units[units > 0]
        d = pd.Series(units).astype(str).str[0].astype(np.int64)
        g = pd.DataFrame({"digit": d, "n": 1})
        return g.groupby("digit", as_index=False).sum()

    cnt = bucket_agg(
        ds.select_columns([col]).map_batches(digits, batch_format="pandas"),
        ["digit"], {"observed": ("n", "sum")}, pre=False,
    ).to_pandas().set_index("digit")["observed"]

    dig = np.arange(1, 10, dtype=np.int64)
    obs = np.array([int(cnt.get(d, 0)) for d in dig], dtype=np.int64)
    n = int(obs.sum())
    p = np.log10(1.0 + 1.0 / dig)
    exp = n * p
    dlt = obs.astype(np.float64) - exp
    term = dlt * dlt / exp if n > 0 else np.zeros(9)
    return ray.data.from_arrow(pa.table(
        {"digit": pa.array(dig, pa.int64()),
         "observed": pa.array(obs, pa.int64()),
         "expected": pa.array(exp, pa.float64()),
         "term": pa.array(term, pa.float64())}))


def k_anonymity(
    ds: ray.data.Dataset,
    quasi_cols: list[str],
    k: int = 5,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Re-identification risk audit (Sweeney 2002 k-anonymity): every
    quasi-identifier combination shared by FEWER than ``k`` rows, with
    its group size — the groups a privacy reviewer must generalize or
    suppress before a dataset ships for training.  Output: the
    ``quasi_cols`` plus ``n`` (group size), risk groups only; an empty
    result certifies the table k-anonymous for this quasi-identifier
    set.

    Scale shape: ONE pre-aggregating bucket shuffle
    (`shuffle.bucket_count` — per-batch combiner moves (combination,
    partial-count) rows, so the exchange is bounded by the
    quasi-identifier DOMAIN per block, not the row count), then a
    vectorized block-local ``n < k`` mask.  The output is
    risk-set-sized; the input table never collects anywhere."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    from pyrdf2vec_ray.shuffle import bucket_count

    counts = bucket_count(ds.select_columns(list(quasi_cols)),
                          list(quasi_cols), count_col="n",
                          num_buckets=num_buckets)

    def risk_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n"] < k]

    return counts.map_batches(risk_only, batch_format="pandas")
