"""SPARQL basic-graph-pattern (BGP) matching over a triples Dataset.

The reference engine's only query surface is a remote SPARQL endpoint
(`/root/reference/pyrdf2vec/connectors.py:89-134` — it ships the
per-entity hop query to a server and never evaluates patterns itself).
This module evaluates the core of SPARQL — a conjunctive set of triple
patterns with shared variables — *inside* the engine, directly over the
distributed triple set, so "what the endpoint answered" becomes a plain
Ray Data pipeline:

    bgp_match(triples, [("?c", "in_nation", "?n"),
                        ("?n", "in_region", "region:0")])
    -> Dataset[c, n]   (one row per SPARQL solution mapping)

Semantics (set algebra, matching SPARQL evaluation over a triple SET):

* a term starting with ``?`` is a variable; anything else is a constant
  matched by string equality,
* a pattern with a repeated variable (``?x p ?x``) matches only triples
  where those positions are equal,
* each pattern scan projects the triple set to its variable columns —
  because every non-variable position is pinned to a constant, the
  projection of distinct triples stays distinct, so NO per-pattern
  dedup shuffle is needed,
* patterns are combined by natural join on their shared variables;
  a natural join of sets is a set, so solutions come out distinct
  without a final dedup,
* ``select=[...]`` projects the solution set to a subset of variables
  WITH dedup (SPARQL ``SELECT DISTINCT`` semantics — plain bag
  projection would depend on join multiplicities that a set store
  does not define).

Scale shape: constants are pushed into the per-pattern scan (a
stateless vectorized ``map_batches`` filter over the triple stream —
at 100 TB this is the moment column/row pruning happens, one pass
shared by all patterns).  Each join is ONE int-bucket hash shuffle
(`ops/join.hash_join`) keyed on the shared variables; schema hints keep
the whole left-deep chain lazy/single-execution.  Join ORDER is chosen
greedily — start at the most-constant (most selective) pattern, then
always extend with a pattern sharing at least one bound variable,
preferring fewer new variables — so intermediate results shrink before
they widen and no cartesian product is ever formed (a disconnected BGP
raises).  Skewed join variables inherit `hash_join`'s bucket-count
control via ``num_buckets``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pyrdf2vec_ray.ops.join import hash_join
from pyrdf2vec_ray.shuffle import distinct

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_scan(
    triples: ray.data.Dataset, pat: tuple[str, str, str]
) -> tuple[ray.data.Dataset, list[str]]:
    """Filter the triple stream by the pattern's constants (and repeated-
    variable equalities), then project/rename to its variable columns.
    Returns (scan, var_names-in-column-order)."""
    consts = [(c, t) for c, t in zip(_POS, pat) if not _is_var(t)]
    var_first: dict[str, str] = {}  # var name -> first column holding it
    eqs: list[tuple[str, str]] = []  # same-var position pairs
    for c, t in zip(_POS, pat):
        if _is_var(t):
            name = t[1:]
            if not name:
                raise ValueError("empty variable name '?' in pattern")
            if name in var_first:
                eqs.append((var_first[name], c))
            else:
                var_first[name] = c
    if not var_first:
        raise ValueError(
            f"pattern {pat} has no variables; constant-only existence "
            "checks are not part of the BGP join (filter beforehand)")

    def scan(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in consts:
            m = pc.equal(batch[col], val)
            mask = m if mask is None else pc.and_(mask, m)
        for a, b in eqs:
            m = pc.equal(batch[a], batch[b])
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            batch = batch.filter(mask)
        return pa.table(
            {name: batch[col] for name, col in var_first.items()})

    return (
        triples.map_batches(scan, batch_format="pyarrow"),
        list(var_first),
    )


def bgp_match(
    triples: ray.data.Dataset,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Evaluate a conjunctive triple-pattern query (SPARQL BGP) over a
    deduplicated ``(subj, pred, obj)`` Dataset.  Output: one string
    column per distinct variable (without the ``?``), one row per
    solution mapping.  See the module docstring for semantics and the
    distributed plan."""
    if not patterns:
        raise ValueError("empty BGP")
    scans = [_pattern_scan(triples, p) for p in patterns]

    # greedy left-deep order: seed with the most-constant pattern, then
    # always extend across a shared variable, fewest new vars first
    n_const = [sum(not _is_var(t) for t in p) for p in patterns]
    order = [max(range(len(scans)),
                 key=lambda i: (n_const[i], -len(scans[i][1])))]
    done = {order[0]}
    bound = set(scans[order[0]][1])
    while len(done) < len(scans):
        cands = [i for i in range(len(scans)) if i not in done
                 and bound & set(scans[i][1])]
        if not cands:
            missing = [patterns[i] for i in range(len(scans))
                       if i not in done]
            raise ValueError(
                f"disconnected BGP: {missing} share no variable with "
                "the rest; evaluate the components separately")
        nxt = min(cands, key=lambda i: (len(set(scans[i][1]) - bound),
                                        -n_const[i]))
        order.append(nxt)
        done.add(nxt)
        bound |= set(scans[nxt][1])

    o = np.dtype("O")
    acc, acc_vars = scans[order[0]]
    for i in order[1:]:
        scan, svars = scans[i]
        on = [v for v in acc_vars if v in svars]
        acc = hash_join(
            acc, scan, on=on, num_buckets=num_buckets,
            lschema={v: o for v in acc_vars},
            rschema={v: o for v in svars})
        # hash_join column order: on + left-extra + right-extra
        acc_vars = (on + [v for v in acc_vars if v not in on]
                    + [v for v in svars if v not in on])

    if select is not None:
        unknown = [v for v in select if v not in acc_vars]
        if unknown:
            raise ValueError(f"select vars {unknown} not in BGP vars "
                             f"{sorted(acc_vars)}")
        acc = distinct(acc.select_columns(select), select,
                       num_buckets=num_buckets)
    return acc
