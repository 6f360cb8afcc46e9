"""JSONL corpus source — the LLM-training interchange format (one JSON
object per line; The Pile / RedPajama / Dolma all ship this way).  The
reference only reads RDF serializations
(/root/reference/pyrdf2vec/graphs/kg.py loads via rdflib); a
training-data engine also has to ingest document corpora directly.

`read_documents_jsonl` wraps `ray.data.read_json` (block-parallel,
streaming — one read task per file / size target, no driver parsing)
and NORMALIZES the loose shapes real corpora use: the text field may
be named ``text`` / ``content`` / ``raw_content``, ids may be absent
(then deterministic ids are derived from the content hash — stable
across re-reads and resumable runs, unlike row positions, which depend
on file order), and extra fields are either kept or dropped."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_TEXT_FIELDS = ("text", "content", "raw_content")


def read_documents_jsonl(
    path: str,
    id_col: str | None = "doc_id",
    keep_extra: bool = False,
) -> ray.data.Dataset:
    """``(doc_id, text[, ...extra])`` from a JSONL file/directory.

    * the text column is the first of ``text``/``content``/
      ``raw_content`` present (missing → ValueError naming the schema),
    * ``id_col`` names an existing id column; if absent from the data
      a deterministic int64 id is derived per row from the md5 of the
      text (content-addressed — duplicate texts collide ON PURPOSE;
      exact-dedup-by-id comes free, and re-reads/resumes agree),
    * ``keep_extra`` keeps the remaining fields verbatim.

    Stateless normalization per batch; the read itself is Ray's
    block-parallel JSON reader (no driver-side parsing)."""
    ds = ray.data.read_json(path)

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        text_field = next(
            (f for f in _TEXT_FIELDS if f in batch.columns), None)
        if text_field is None:
            raise ValueError(
                f"no text field among {_TEXT_FIELDS} in JSONL schema "
                f"{sorted(batch.columns)}")
        out = pd.DataFrame(
            {"text": batch[text_field].astype(str).to_numpy()})
        if id_col is not None and id_col in batch.columns:
            out.insert(0, "doc_id",
                       batch[id_col].to_numpy())
        else:
            out.insert(0, "doc_id", np.array(
                [int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "big")
                 >> 1 for t in out["text"]], dtype=np.int64))
        if keep_extra:
            for c in batch.columns:
                if c not in (text_field, id_col):
                    out[c] = batch[c].to_numpy()
        return out

    return ds.map_batches(norm, batch_format="pandas")
