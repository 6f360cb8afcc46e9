"""Deterministic generator for the interleaved text+media `documents` table.

BASELINE.json input_hint: ``doc_id:string, spans:list<struct<kind,text,
media_ref,offset:int32>>``.  Text spans embed triple mentions in closed
form (``"<Alice> knows <BOB> ."``) so the expected ``(subj, pred, obj)``
output of the construction pipeline is computable without running it
(FIXTURES.md F1).  Every doc is generated independently from
``(seed, doc_idx)`` so generation parallelizes as a ``map_batches`` over
``ray.data.range`` and the same inputs are reproduced at any
parallelism.  No external data, no wall-clock dependence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyrdf2vec_ray.schemas import DOCUMENTS, IRI_PREFIX, TRIPLES

NAMES = [
    "Alice", "Bob", "Casper", "Dean", "Emma", "Alfred", "Stephane",
    "Mathilde", "Alfy", "Julio", "Nadia", "Omar", "Priya", "Quentin",
    "Rosa", "Sven", "Tara", "Umar", "Vera", "Wim",
]
PREDICATES = ["knows", "loves", "likes", "worksFor", "locatedIn"]
MEDIA_KINDS = ["image", "audio", "video"]


def entity_name(i: int) -> str:
    base = NAMES[i % len(NAMES)]
    k = i // len(NAMES)
    return base if k == 0 else f"{base}{k}"


def entity_iri(i: int) -> str:
    return IRI_PREFIX + entity_name(i)


def _doc_rng(seed: int, doc_idx: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + doc_idx) % (2**31 - 1))


def _surface(name: str, variant: int) -> str:
    # alias variants the entity linker must canonicalize back to `name`
    if variant == 0:
        return name
    if variant == 1:
        return name.lower()
    return name.upper()


def _doc_triples(rng: np.random.RandomState, n_entities: int) -> list[tuple[int, int, int]]:
    """(subj_idx, pred_idx, obj_idx) mentions for one doc.  Zipf-ish skew on
    the subject so high-degree (hot-key) vertices exist at every scale."""
    k = 1 + int(rng.randint(0, 3))
    out = []
    for _ in range(k):
        s = int(n_entities * rng.random_sample() ** 2)  # skewed toward 0
        p = int(rng.randint(0, len(PREDICATES)))
        o = int(rng.randint(0, n_entities))
        if o == s:
            o = (o + 1) % n_entities
        out.append((s, p, o))
    return out


def make_documents_batch(
    doc_indices: np.ndarray, seed: int = 42, n_entities: int = 50
) -> pa.Table:
    """Build the `documents` rows for a batch of doc indices (vectorization
    unit for ``ray.data.range(n).map_batches``)."""
    doc_ids, all_spans = [], []
    for doc_idx in doc_indices:
        doc_idx = int(doc_idx)
        rng = _doc_rng(seed, doc_idx)
        spans = []
        offset = 0
        for (s, p, o) in _doc_triples(rng, n_entities):
            sv, ov = int(rng.randint(0, 3)), int(rng.randint(0, 3))
            text = (
                f"<{_surface(entity_name(s), sv)}> {PREDICATES[p]} "
                f"<{_surface(entity_name(o), ov)}> ."
            )
            spans.append(
                {"kind": "text", "text": text, "media_ref": "", "offset": offset}
            )
            offset += len(text) + 1
            if rng.random_sample() < 0.3:  # interleave an opaque media span
                kind = MEDIA_KINDS[int(rng.randint(0, len(MEDIA_KINDS)))]
                spans.append(
                    {
                        "kind": kind,
                        "text": "",
                        "media_ref": f"media://{kind}/{doc_idx}/{offset}",
                        "offset": offset,
                    }
                )
                offset += 1
        doc_ids.append(f"doc-{doc_idx:08d}")
        all_spans.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": all_spans}, schema=DOCUMENTS
    )


def synth_documents(n_docs: int, seed: int = 42, n_entities: int = 50):
    """Lazy Dataset of `n_docs` interleaved documents (streams; never
    materializes the corpus on the driver)."""
    import ray.data

    def build(batch: dict) -> pa.Table:
        return make_documents_batch(batch["id"], seed=seed, n_entities=n_entities)

    n_blocks = max(1, min(n_docs // 1000, 512))
    return ray.data.range(n_docs, override_num_blocks=n_blocks).map_batches(
        build, batch_format="numpy", batch_size=4096
    )


def synth_documents_fast(n_docs: int, seed: int = 42, n_entities: int = 50):
    """Benchmark-scale generator: one RandomState per BATCH (vectorized
    draws) instead of one per doc — ~10x faster, for corpora of millions.
    Deterministic given a fixed block layout; use `synth_documents` when
    per-doc closed-form expectations are needed (tests)."""
    import ray.data

    def build(batch: dict) -> pa.Table:
        ids = batch["id"]
        rng = np.random.RandomState((seed * 7_368_787 + int(ids[0])) % (2**31 - 1))
        n = len(ids)
        ks = rng.randint(1, 4, size=n)
        total = int(ks.sum())
        subj = (n_entities * rng.random_sample(total) ** 2).astype(np.int64)
        pred = rng.randint(0, len(PREDICATES), size=total)
        obj = rng.randint(0, n_entities, size=total)
        obj = np.where(obj == subj, (obj + 1) % n_entities, obj)
        sv = rng.randint(0, 3, size=total)
        ov = rng.randint(0, 3, size=total)
        media = rng.random_sample(total) < 0.3
        mkind = rng.randint(0, len(MEDIA_KINDS), size=total)

        doc_ids, all_spans = [], []
        pos = 0
        for i in range(n):
            doc_idx = int(ids[i])
            spans = []
            offset = 0
            for _ in range(ks[i]):
                text = (
                    f"<{_surface(entity_name(int(subj[pos])), int(sv[pos]))}> "
                    f"{PREDICATES[pred[pos]]} "
                    f"<{_surface(entity_name(int(obj[pos])), int(ov[pos]))}> ."
                )
                spans.append({"kind": "text", "text": text, "media_ref": "",
                              "offset": offset})
                offset += len(text) + 1
                if media[pos]:
                    kind = MEDIA_KINDS[int(mkind[pos])]
                    spans.append({"kind": kind, "text": "",
                                  "media_ref": f"media://{kind}/{doc_idx}/{offset}",
                                  "offset": offset})
                    offset += 1
                pos += 1
            doc_ids.append(f"doc-{doc_idx:08d}")
            all_spans.append(spans)
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": all_spans}, schema=DOCUMENTS
        )

    n_blocks = max(1, min(n_docs // 2000, 512))
    return ray.data.range(n_docs, override_num_blocks=n_blocks).map_batches(
        build, batch_format="numpy", batch_size=8192
    )


def expected_triples(n_docs: int, seed: int = 42, n_entities: int = 50) -> pa.Table:
    """Closed-form UNIQUE (subj, pred, obj) IRIs the construction pipeline
    must emit for `synth_documents(n_docs, seed, n_entities)` (triples dedup
    per the reference's set-valued adjacency, kg.py:177-178)."""
    seen, rows = set(), []
    for doc_idx in range(n_docs):
        rng = _doc_rng(seed, doc_idx)
        for (s, p, o) in _doc_triples(rng, n_entities):
            t = (entity_iri(s), IRI_PREFIX + PREDICATES[p], entity_iri(o))
            # consume the variant + media draws to stay in sync with the doc
            rng.randint(0, 3), rng.randint(0, 3)
            if rng.random_sample() < 0.3:
                rng.randint(0, len(MEDIA_KINDS))
            if t not in seen:
                seen.add(t)
                rows.append(t)
    cols = list(zip(*rows)) if rows else [[], [], []]
    return pa.Table.from_pydict(
        {"subj": list(cols[0]), "pred": list(cols[1]), "obj": list(cols[2])},
        schema=TRIPLES,
    )


# ---- canonical toy graphs from the reference tests (FIXTURES.md F2) --------

def _iri(n: str) -> str:
    return IRI_PREFIX + n


LOOP = [
    (_iri("Alice"), _iri("knows"), _iri("Bob")),
    (_iri("Alice"), _iri("knows"), _iri("Dean")),
    (_iri("Bob"), _iri("knows"), _iri("Dean")),
    (_iri("Dean"), _iri("loves"), _iri("Alice")),
]

LONG_CHAIN = [
    (_iri("Alice"), _iri("knows"), _iri("Bob")),
    (_iri("Alice"), _iri("knows"), _iri("Dean")),
    (_iri("Bob"), _iri("knows"), _iri("Mathilde")),
    (_iri("Mathilde"), _iri("knows"), _iri("Alfy")),
    (_iri("Alfy"), _iri("knows"), _iri("Stephane")),
    (_iri("Stephane"), _iri("knows"), _iri("Alfred")),
    (_iri("Alfred"), _iri("knows"), _iri("Emma")),
    (_iri("Emma"), _iri("knows"), _iri("Julio")),
]

GRAPH = [
    (_iri("Alice"), _iri("knows"), _iri("Bob")),
    (_iri("Alice"), _iri("knows"), _iri("Dean")),
    (_iri("Bob"), _iri("knows"), _iri("Casper")),
]


def triples_table(triples: list[tuple[str, str, str]]) -> pa.Table:
    s, p, o = zip(*triples) if triples else ([], [], [])
    return pa.Table.from_pydict(
        {"subj": list(s), "pred": list(p), "obj": list(o)}, schema=TRIPLES
    )
