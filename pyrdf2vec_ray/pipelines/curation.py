"""One-call LLM-corpus curation recipe — the end-to-end pipeline a
user of this engine actually runs over raw documents before training,
composing the already-oracle-checked operators into ONE lazy Ray Data
plan:

    normalize? → quality gates (length / repetition) → language
    filter → exact dedup → decontamination

Every gate is a STATELESS batch filter on the streaming doc
(doc_id, text) flow; the two steps with real exchange cost declare it:
exact dedup is `ops/dedup.exact_dedup`'s ONE content-hash bucket
shuffle + an id-bucket semi-join back onto the stream, and
decontamination is `ops/curate.decontaminate`'s broadcast anti-join
(benchmark hash set via ray.put once).  No stage materializes the
corpus; the returned Dataset is consumed by the caller's sink
(`sinks.write_table`) or the next pipeline (tokenize/pack).

The reference has no corpus surface at all (it starts from a finished
KG); this module is the training-data half of the engine's story.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def curate_corpus(
    docs: ray.data.Dataset,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    languages: list[str] | None = None,
    max_top_token_ratio: float | None = None,
    max_dup_2gram_ratio: float | None = None,
    dedup: str | None = "exact",
    benchmark: ray.data.Dataset | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Curated ``(doc_id, text)`` stream.  Gates in order (each
    optional): whitespace token-count window [min_tokens, max_tokens];
    Gopher repetition gates (modal-token ratio / duplicate-2-gram
    ratio via `ops/text.repetition_stats`' kernels, applied INLINE so
    the text column never needs a join back); `ops/text.lang_id`
    membership; exact content dedup (keep smallest doc_id);
    benchmark decontamination.  Filters use STRICT `<=` / `>=`
    comparisons shared verbatim with the SQL oracle."""
    from pyrdf2vec_ray.ops.dedup import exact_dedup
    from pyrdf2vec_ray.ops.join import hash_semi_join
    from pyrdf2vec_ray.ops.text import lang_id, repetition_stats

    work = docs.select_columns(["doc_id", "text"])

    if min_tokens is not None or max_tokens is not None:
        lo = 0 if min_tokens is None else int(min_tokens)
        hi = None if max_tokens is None else int(max_tokens)

        def length_gate(batch: pd.DataFrame) -> pd.DataFrame:
            n = batch["text"].astype(str).str.split().map(len) \
                .to_numpy(np.int64)
            m = n >= lo
            if hi is not None:
                m &= n <= hi
            return batch[m]

        work = work.map_batches(length_gate, batch_format="pandas")

    if max_top_token_ratio is not None or max_dup_2gram_ratio is not None:
        # repetition gates ride the id-bucket semi-join: the stats op
        # drops the text column, so survivors join back by doc_id
        stats = repetition_stats(work)

        def rep_gate(batch: pd.DataFrame) -> pd.DataFrame:
            m = np.ones(len(batch), dtype=bool)
            if max_top_token_ratio is not None:
                m &= (batch["top_token_ratio"].to_numpy()
                      <= max_top_token_ratio)
            if max_dup_2gram_ratio is not None:
                m &= (batch["dup_2gram_ratio"].to_numpy()
                      <= max_dup_2gram_ratio)
            return batch[m][["doc_id"]]

        keep = stats.map_batches(rep_gate, batch_format="pandas")
        i8 = np.dtype("int64")
        o = np.dtype("O")
        work = hash_semi_join(
            work, keep, on=["doc_id"], num_buckets=num_buckets,
            lschema={"doc_id": i8, "text": o},
            rschema={"doc_id": i8})

    if languages is not None:
        # lang_id emits (doc_id, lang_pred) and drops the text column;
        # survivors semi-join back onto the stream by doc_id
        allowed = frozenset(languages)

        def lang_gate(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["lang_pred"].isin(allowed)][["doc_id"]]

        keep = lang_id(work).map_batches(lang_gate,
                                         batch_format="pandas")
        i8 = np.dtype("int64")
        o = np.dtype("O")
        work = hash_semi_join(
            work, keep, on=["doc_id"], num_buckets=num_buckets,
            lschema={"doc_id": i8, "text": o},
            rschema={"doc_id": i8})

    if dedup == "exact":
        keep = exact_dedup(work)
        i8 = np.dtype("int64")
        o = np.dtype("O")
        work = hash_semi_join(
            work,
            keep.map_batches(lambda b: b[["doc_id"]],
                             batch_format="pandas"),
            on=["doc_id"], num_buckets=num_buckets,
            lschema={"doc_id": i8, "text": o},
            rschema={"doc_id": i8})
    elif dedup is not None:
        raise ValueError(f"unknown dedup mode {dedup!r} (exact|None); "
                         "near-dup pipelines compose ops/dedup "
                         "minhash/semdedup explicitly")

    if benchmark is not None:
        from pyrdf2vec_ray.ops.curate import decontaminate

        keep = decontaminate(work, benchmark)
        i8 = np.dtype("int64")
        o = np.dtype("O")
        work = hash_semi_join(
            work,
            keep.map_batches(lambda b: b[["doc_id"]],
                             batch_format="pandas"),
            on=["doc_id"], num_buckets=num_buckets,
            lschema={"doc_id": i8, "text": o},
            rschema={"doc_id": i8})

    return work
