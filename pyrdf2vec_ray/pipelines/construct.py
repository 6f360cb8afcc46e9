"""KG construction: documents → mentions → linked triples → dedup → adjacency.

Ray-Data-native replacement for the reference's KG.__attrs_post_init__
file parse + add_walk loop (graphs/kg.py:142-216).  Every stage is a
Dataset transform; the only shuffles are the triple dedup
(groupby(subj,pred,obj)) and the adjacency materialize (groupby(subj)) —
see SURVEY.md §4's shuffle inventory.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pyrdf2vec_ray.schemas import ADJACENCY, HOP_STRUCT
from pyrdf2vec_ray.stages.extract import MentionExtractor
from pyrdf2vec_ray.stages.link import CandidateIndex, EntityLinker


def extract_mentions(docs: ray.data.Dataset, pattern: str | None = None) -> ray.data.Dataset:
    return docs.map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"pattern": pattern},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 8),
    )


def link_mentions(
    mentions: ray.data.Dataset,
    index: CandidateIndex,
    skip_predicates: frozenset[str] = frozenset(),
    min_score: float = 0.0,
) -> ray.data.Dataset:
    return mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={
            "index": index,
            "skip_predicates": skip_predicates,
            "min_score": min_score,
        },
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
    )


def _local_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate triples before the global
    shuffle (pre-aggregation — most duplicates are local)."""
    return batch.group_by(["subj", "pred", "obj"]).aggregate([])


def dedup_triples(linked: ray.data.Dataset) -> ray.data.Dataset:
    """Global exact dedup of (subj, pred, obj) — the reference's set-valued
    adjacency semantics (kg.py:177-178).  Local combine per batch, then one
    hash shuffle on the triple key."""
    triples = linked.select_columns(["subj", "pred", "obj"]).map_batches(
        _local_dedup, batch_format="pyarrow"
    )
    deduped = triples.groupby(["subj", "pred", "obj"]).count()
    return deduped.select_columns(["subj", "pred", "obj"])


def materialize_adjacency(
    triples: ray.data.Dataset, max_hops_per_row: int = 100_000
) -> ray.data.Dataset:
    """`adjacency` table: one row per subject with its sorted (pred, obj)
    hop list (≡ _transition_matrix / get_hops, kg.py:445-467).  Hub
    subjects with more than `max_hops_per_row` hops are salt-split across
    several rows (`part` column) so no single Arrow row explodes a block
    (SURVEY.md §7 "very wide records")."""

    def to_rows(group: pa.Table) -> pa.Table:
        group = group.sort_by([("pred", "ascending"), ("obj", "ascending")])
        subj = group["subj"][0].as_py()
        preds = group["pred"].to_pylist()
        objs = group["obj"].to_pylist()
        rows_subj, rows_part, rows_out = [], [], []
        for part, lo in enumerate(range(0, len(preds), max_hops_per_row)):
            hi = lo + max_hops_per_row
            rows_subj.append(subj)
            rows_part.append(part)
            rows_out.append(
                [{"pred": p, "obj": o} for p, o in zip(preds[lo:hi], objs[lo:hi])]
            )
        return pa.Table.from_pydict(
            {
                "subj": pa.array(rows_subj, pa.string()),
                "part": pa.array(rows_part, pa.int32()),
                "out": pa.array(rows_out, pa.list_(HOP_STRUCT)),
            }
        )

    return triples.groupby("subj").map_groups(to_rows, batch_format="pyarrow")


def construct_kg(
    docs: ray.data.Dataset,
    candidates: dict[str, str],
    skip_predicates: frozenset[str] = frozenset(),
    min_score: float = 0.0,
    pattern: str | None = None,
) -> ray.data.Dataset:
    """documents → deduplicated `triples` Dataset (lazy; one shuffle)."""
    index = CandidateIndex.build(candidates)
    mentions = extract_mentions(docs, pattern=pattern)
    linked = link_mentions(mentions, index, skip_predicates, min_score)
    return dedup_triples(linked)
