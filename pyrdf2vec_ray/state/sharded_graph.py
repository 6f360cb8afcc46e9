"""Hash-sharded graph index: walk extraction without driver-side graph
materialization (SURVEY.md §4 "Data distribution", the scale path that
``GraphIndex.from_dataset`` only documents).

Build: the triples Dataset is hash-partitioned TWICE — by
``crc32(subj) % S`` for forward hops and ``crc32(obj) % S`` for reverse
hops — straight to partitioned parquet (a shuffle-by-write; the driver
streams, never collects).  One Ray task per (direction, shard) then
loads its partition and builds the same CSR layout as the broadcast
index (``GraphIndex.from_table``), leaving the arrays in the object
store.  The driver holds S object refs per direction, not the graph.

Serve: hop lookups route by vertex NAME — shard ``crc32(name) % S``
owns every triple whose subj (resp. obj) is that name, so one shard
answers each forward (resp. reverse) ``get_hops`` exactly.  Hops come
back as name arrays sorted by (pred, obj) — the per-shard vocabulary is
sorted, so the order is lexicographic by names, identical to the
broadcast CSR's (global ids are positions in the globally sorted
vocabulary).  Walks over either backend are therefore bit-identical
(pinned by tests/test_sharded_graph.py).

On one node every worker maps all shards zero-copy from the shared
object store; on a multi-node cluster each shard ref lives wherever its
build task ran and workers pull only the shards their walks touch (or
pin walk actors to shard owners by routing entity batches with the same
crc32 — the partitioning key is stable across processes).

Reference parity: this replaces kg.py:122-133's driver-resident
transition matrices; the reference ships the WHOLE graph to every
worker (walker.py:187-195) and cannot exceed one machine.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray

from pyrdf2vec_ray.state.graph_index import GraphArrays, GraphIndex

TRIPLE_COLS = ["subj", "pred", "obj"]


def shard_of(name: str, num_shards: int) -> int:
    return zlib.crc32(name.encode()) % num_shards


def _shard_col(names: pa.ChunkedArray, num_shards: int) -> pa.Array:
    # crc32 so workers can route a SINGLE name to its shard at hop time
    # with the same function (process-stable, unlike builtin hash())
    vals = names.to_numpy(zero_copy_only=False)
    out = np.fromiter(
        (zlib.crc32(v.encode()) % num_shards for v in vals),
        dtype=np.int64, count=len(vals),
    )
    return pa.array(out, pa.int64())


@ray.remote
def _build_shard(part_dir: str) -> GraphArrays:
    """Load one hash partition and build its CSR (runs on any worker;
    the arrays land in that worker's object store, not on the driver)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(part_dir):
        t = pq.read_table(part_dir, columns=TRIPLE_COLS)
    else:  # empty shard: no rows hashed here
        t = pa.table({c: pa.array([], pa.string()) for c in TRIPLE_COLS})
    return GraphIndex.from_table(t).arrays


class ShardedGraphIndex:
    """S forward shards (partitioned by subj hash) + S reverse shards
    (partitioned by obj hash), each a GraphArrays object ref."""

    def __init__(self, fwd_refs: list, rev_refs: list, num_shards: int,
                 parquet_root: str):
        self.fwd_refs = fwd_refs
        self.rev_refs = rev_refs
        self.num_shards = num_shards
        self.parquet_root = parquet_root

    @staticmethod
    def build(
        triples_ds: "ray.data.Dataset",
        num_shards: int = 8,
        scratch_dir: str | None = None,
    ) -> "ShardedGraphIndex":
        import tempfile

        root = scratch_dir or tempfile.mkdtemp(prefix="sharded_graph_")

        def add_shard(key: str):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.select(TRIPLE_COLS).append_column(
                    "shard", _shard_col(batch[key], num_shards)
                )

            return fn

        # two shuffle-by-write passes; the driver never holds the triples.
        # The reverse pass reads the forward parquet back instead of
        # re-executing the (possibly expensive — dedup shuffle etc.)
        # upstream pipeline a second time.
        import ray.data

        fwd_dir = f"{root}/fwd"
        rev_dir = f"{root}/rev"
        triples_ds.map_batches(
            add_shard("subj"), batch_format="pyarrow"
        ).write_parquet(fwd_dir, partition_cols=["shard"])
        ray.data.read_parquet(fwd_dir, columns=TRIPLE_COLS).map_batches(
            add_shard("obj"), batch_format="pyarrow"
        ).write_parquet(rev_dir, partition_cols=["shard"])

        fwd_refs = [
            _build_shard.remote(f"{fwd_dir}/shard={s}") for s in range(num_shards)
        ]
        rev_refs = [
            _build_shard.remote(f"{rev_dir}/shard={s}") for s in range(num_shards)
        ]
        # wait for completion (refs stay in the object store; no driver copy)
        ray.wait(fwd_refs + rev_refs, num_returns=2 * num_shards, fetch_local=False)
        return ShardedGraphIndex(fwd_refs, rev_refs, num_shards, root)

    def triples_dataset(self) -> "ray.data.Dataset":
        """The forward-partitioned parquet re-read as a Dataset (used for
        name-keyed sampler fitting — grouped counts over the same
        persisted triples, no extra copy)."""
        import ray.data

        return ray.data.read_parquet(
            f"{self.parquet_root}/fwd", columns=TRIPLE_COLS
        )

    def local(self) -> "ShardedLocalGraph":
        """Lazy worker/driver-side view: shards resolve from the object
        store on FIRST TOUCH (shard-owner routing, VERDICT r4 item 2) —
        a consumer that only walks shard s's entities maps shard s plus
        the shards its hops actually cross, not all 2·S."""
        return ShardedLocalGraph.from_refs(self.fwd_refs, self.rev_refs)


class ShardedLocalGraph:
    """Worker-side view over the shard arrays (zero-copy object-store
    maps on the node that holds them).  Keys are vertex NAMES.

    Two forms: the eager constructor takes resolved array lists
    (tests / already-local state); :meth:`from_refs` takes object refs
    and resolves each (direction, shard) LAZILY on first touch — the
    multi-node story: walk batches are routed by ``crc32(entity) % S``
    (see ``walkers.extract_walks``), so an actor pinned to shard s maps
    s's arrays plus on-demand pulls for the shards its hops cross,
    O(graph/S + touched) per worker instead of O(graph).
    ``mapped_count()`` reports how many (direction, shard) slots are
    resident — pinned by tests/test_sharded_graph.py."""

    def __init__(self, fwd: list[GraphArrays], rev: list[GraphArrays]):
        self.fwd = list(fwd)
        self.rev = list(rev)
        self.num_shards = len(self.fwd)
        self._fwd_refs: list | None = None
        self._rev_refs: list | None = None

    @classmethod
    def from_refs(cls, fwd_refs: list, rev_refs: list) -> "ShardedLocalGraph":
        self = cls.__new__(cls)
        self.fwd = [None] * len(fwd_refs)
        self.rev = [None] * len(rev_refs)
        self.num_shards = len(fwd_refs)
        self._fwd_refs = list(fwd_refs)
        self._rev_refs = list(rev_refs)
        return self

    def _shard(self, s: int, is_reverse: bool) -> GraphArrays:
        arrs = self.rev if is_reverse else self.fwd
        a = arrs[s]
        if a is None:
            refs = self._rev_refs if is_reverse else self._fwd_refs
            a = arrs[s] = ray.get(refs[s])
        return a

    def mapped_count(self) -> int:
        """Resident (direction, shard) slots — the per-worker memory
        footprint the lazy routing bounds."""
        return (sum(a is not None for a in self.fwd)
                + sum(a is not None for a in self.rev))

    def _local_id(self, arrays: GraphArrays, name: str) -> int:
        i = int(np.searchsorted(arrays.names, name))
        if i < len(arrays.names) and arrays.names[i] == name:
            return i
        return -1

    def get_hops(self, name: str, is_reverse: bool = False):
        """(pred_names, other_names) in (pred, other) lexicographic order
        — the same order the broadcast CSR yields, so sampled walks match
        across backends."""
        s = shard_of(name, self.num_shards)
        a = self._shard(s, is_reverse)
        vid = self._local_id(a, name)
        if vid < 0:
            empty = a.names[:0]
            return empty, empty
        if is_reverse:
            lo, hi = a.rev_indptr[vid], a.rev_indptr[vid + 1]
            return a.names[a.rev_pred[lo:hi]], a.names[a.rev_subj[lo:hi]]
        lo, hi = a.fwd_indptr[vid], a.fwd_indptr[vid + 1]
        return a.names[a.fwd_pred[lo:hi]], a.names[a.fwd_obj[lo:hi]]

    def contains_one(self, name: str) -> bool:
        """Entity existence (kg.is_exist): a vertex exists iff it appears
        as some triple's subj (→ key of its forward shard) or obj (→ key
        of its reverse shard); both checks hit exactly one shard each."""
        s = shard_of(name, self.num_shards)
        f = self._shard(s, False)
        vid = self._local_id(f, name)
        if vid >= 0 and f.fwd_indptr[vid + 1] > f.fwd_indptr[vid]:
            return True
        r = self._shard(s, True)
        vid = self._local_id(r, name)
        return vid >= 0 and r.rev_indptr[vid + 1] > r.rev_indptr[vid]

    def contains(self, names: list[str]) -> np.ndarray:
        return np.array([self.contains_one(n) for n in names], dtype=bool)
