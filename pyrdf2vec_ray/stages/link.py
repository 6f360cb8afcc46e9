"""Entity linking + canonicalization (stateful actor-pool stage).

No reference analog (pyRDF2Vec receives IRIs directly); required by the
north_rule construction stage (SURVEY.md §2.3 G7).  The candidate index
(normalized surface key → canonical IRI) is hash-sharded and placed in
the object store ONCE (``ray.put`` per shard); every linker actor reads
the shards in ``__init__`` — a broadcast lookup join, never a shuffle.
At cluster scale the shards live on separate index actors and batches
are routed by key hash; on one node every linker holds all shards.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray

from pyrdf2vec_ray.schemas import IRI_PREFIX, LINKED


def normalize_surface(s: str) -> str:
    """Canonicalization key: casefold + collapse separators."""
    return s.casefold().replace("_", " ").strip()


class CandidateIndex:
    """Hash-sharded candidate dictionary broadcast via the object store."""

    def __init__(self, shard_refs: list, num_shards: int):
        self.shard_refs = shard_refs
        self.num_shards = num_shards

    @staticmethod
    def shard_of(key: str, num_shards: int) -> int:
        """Stable shard routing: crc32, NOT builtin hash() — Python string
        hashing is PYTHONHASHSEED-salted per process, so hash()-based
        routing would send lookups from a different process to the wrong
        shard actor."""
        return zlib.crc32(key.encode()) % num_shards

    @staticmethod
    def build(candidates: dict[str, str], num_shards: int = 8) -> "CandidateIndex":
        """candidates: normalized surface key → canonical IRI."""
        shards: list[dict[str, str]] = [{} for _ in range(num_shards)]
        for key, iri in candidates.items():
            shards[CandidateIndex.shard_of(key, num_shards)][key] = iri
        return CandidateIndex([ray.put(s) for s in shards], num_shards)

    def load(self) -> dict[str, str]:
        merged: dict[str, str] = {}
        for ref in self.shard_refs:
            merged.update(ray.get(ref))
        return merged


class EntityLinker:
    """map_batches(EntityLinker, concurrency=N, batch_format="pyarrow",
    fn_constructor_kwargs={"index": idx, ...}).

    Scoring: exact surface match on the canonical key → 1.0; normalized
    (case/sep-folded) match → 0.9; unlinkable surfaces fall back to
    ``IRI_PREFIX + surface`` with score 0.1 (kept so downstream recall
    is a filter choice, not silent data loss).
    Predicates are trusted vocabulary: canonicalized as IRI_PREFIX+surface.
    ``skip_predicates`` filtering (reference kg.py:209) happens here.
    """

    def __init__(
        self,
        index: CandidateIndex,
        skip_predicates: frozenset[str] = frozenset(),
        min_score: float = 0.0,
    ):
        self.index = index.load()          # once per actor
        self.skip = skip_predicates
        self.min_score = min_score
        self._cache: dict[str, tuple[str, float]] = {}

    def _link(self, surface: str) -> tuple[str, float]:
        hit = self._cache.get(surface)
        if hit is not None:
            return hit
        key = normalize_surface(surface)
        iri = self.index.get(key)
        if iri is None:
            out = (IRI_PREFIX + surface, 0.1)
        elif iri == IRI_PREFIX + surface:
            out = (iri, 1.0)
        else:
            out = (iri, 0.9)
        self._cache[surface] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_s = batch["surface_subj"].to_numpy(zero_copy_only=False)
        pred_s = batch["surface_pred"].to_numpy(zero_copy_only=False)
        obj_s = batch["surface_obj"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)

        subj, pred, obj, score, keep_doc = [], [], [], [], []
        for i in range(len(subj_s)):
            p_iri = IRI_PREFIX + pred_s[i]
            if p_iri in self.skip:
                continue
            s_iri, s_sc = self._link(subj_s[i])
            o_iri, o_sc = self._link(obj_s[i])
            sc = min(s_sc, o_sc)
            if sc < self.min_score:
                continue
            keep_doc.append(doc_ids[i])
            subj.append(s_iri)
            pred.append(p_iri)
            obj.append(o_iri)
            score.append(sc)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(keep_doc, pa.string()),
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "score": pa.array(np.asarray(score, dtype=np.float32)),
            },
            schema=LINKED,
        )
