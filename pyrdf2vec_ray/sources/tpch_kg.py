"""Derive a KG edge list from the TPC-H-ish relational tables.

Stand-in for the reference's "RDF file → triples" source (kg.py:142-164)
over the driver-provided parquet: each foreign-key relation becomes a
(subj, pred, obj) triple with compact IRIs ("customer:42").  Reads prune
to the key columns only; construction is vectorized Arrow string
concatenation; global dedup reuses the construction pipeline's
groupby(subj, pred, obj) shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pyrdf2vec_ray.pipelines.construct import dedup_triples
from pyrdf2vec_ray.schemas import TRIPLES


def _triple_batch(prefix_s: str, sk, pred: str, prefix_o: str, ok) -> pa.Table:
    subj = pc.binary_join_element_wise(
        pa.scalar(prefix_s), pc.cast(sk, pa.string()), ""
    )
    obj = pc.binary_join_element_wise(
        pa.scalar(prefix_o), pc.cast(ok, pa.string()), ""
    )
    pred_arr = pa.array([pred] * len(subj), pa.string())
    return pa.Table.from_arrays([subj, pred_arr, obj], schema=TRIPLES)


RELATIONS = [
    # table, subj prefix/key, predicate, obj prefix/key
    ("customer", "customer:", "c_custkey", "in_nation", "nation:", "c_nationkey"),
    ("supplier", "supplier:", "s_suppkey", "in_nation", "nation:", "s_nationkey"),
    ("nation", "nation:", "n_nationkey", "in_region", "region:", "n_regionkey"),
    ("orders", "order:", "o_orderkey", "placed_by", "customer:", "o_custkey"),
    ("lineitem", "order:", "l_orderkey", "contains", "part:", "l_partkey"),
    ("lineitem", "part:", "l_partkey", "supplied_by", "supplier:", "l_suppkey"),
]

# the equivalent ANSI-SQL CTE for DuckDB oracles (UNION dedups)
TRIPLES_CTE = """
triples AS (
  SELECT 'customer:' || c_custkey AS subj, 'in_nation' AS pred,
         'nation:' || c_nationkey AS obj FROM customer
  UNION
  SELECT 'supplier:' || s_suppkey, 'in_nation', 'nation:' || s_nationkey FROM supplier
  UNION
  SELECT 'nation:' || n_nationkey, 'in_region', 'region:' || n_regionkey FROM nation
  UNION
  SELECT 'order:' || o_orderkey, 'placed_by', 'customer:' || o_custkey FROM orders
  UNION
  SELECT 'order:' || l_orderkey, 'contains', 'part:' || l_partkey FROM lineitem
  UNION
  SELECT 'part:' || l_partkey, 'supplied_by', 'supplier:' || l_suppkey FROM lineitem
)
"""


def _read_blocks(path: str) -> int:
    """Size-proportional read-task count.  Ray's read_op_min_num_blocks
    floor (and any session-level override of it) splits TINY side tables
    into dozens of fixed-overhead no-op tasks — measured 3x on the sf0.1
    kg build (8-11s -> 3-4s) from this alone.  ~16 MiB of file per read
    task, capped at the session CPU count: on a cluster that is one task
    per core, and Ray's dynamic block splitting still bounds the OUTPUT
    block size for huge per-task ranges."""
    import os

    import ray

    cpus = 16
    if ray.is_initialized():
        cpus = max(1, int(ray.cluster_resources().get("CPU", cpus)))
    size = os.path.getsize(path) if os.path.exists(path) else 0
    return max(1, min(cpus, (size + (16 << 20) - 1) // (16 << 20)))


def tpch_triples(sf_dir: str) -> ray.data.Dataset:
    # one read per TABLE (lineitem feeds two relations — scan it once,
    # emit both triple kinds from the same batch)
    by_table: dict[str, list] = {}
    for table, ps, sk, pred, po, ok in RELATIONS:
        by_table.setdefault(table, []).append((ps, sk, pred, po, ok))

    parts = []
    for table, rels in by_table.items():
        cols = sorted({c for _, sk, _, _, ok in rels for c in (sk, ok)})
        path = f"{sf_dir}/{table}.parquet"
        ds = ray.data.read_parquet(
            path, columns=cols, override_num_blocks=_read_blocks(path)
        )

        def to_triples(batch: pa.Table, rels=rels):
            tables = [
                _triple_batch(ps, batch[sk], pred, po, batch[ok])
                for ps, sk, pred, po, ok in rels
            ]
            return pa.concat_tables(tables)

        parts.append(ds.map_batches(to_triples, batch_format="pyarrow"))
    unioned = parts[0].union(*parts[1:])
    return dedup_triples(unioned)
