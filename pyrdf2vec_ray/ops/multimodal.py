"""Multimodal span handling: media spans are opaque `binary`/ref columns
with typed metadata; decode/feature-extract are actor-pool stages whose
Ray-side plumbing (schema, batch size, actor signature, output layout)
is real, while the codec itself is stubbed — the image/audio libraries
are not in this container (task brief: stub the decode step, keep the
pipeline real).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

MEDIA_FEATURES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32())),   # fixed dim per kind
    ]
)


def media_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Flatten the interleaved spans to one row per NON-text span
    (doc_id, kind, media_ref, offset) — zero-copy Arrow list kernels."""

    def flatten(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans)
        doc_ids = pc.take(batch["doc_id"], parent)
        t = pa.Table.from_arrays(
            [doc_ids, flat.field("kind"), flat.field("media_ref"), flat.field("offset")],
            names=["doc_id", "kind", "media_ref", "offset"],
        )
        return t.filter(pc.invert(pc.equal(t["kind"], "text")))

    return docs.map_batches(flatten, batch_format="pyarrow", batch_size=2048)


class MediaDecoder:
    """Actor-pool decode/feature stage.  Real pipeline shape; fake codec.

    ``mode="fake"`` (default): deterministic pseudo-features derived from
    the media_ref hash — stable across runs, so downstream stages are
    testable.  ``mode="strict"`` raises NotImplementedError, marking
    exactly where a real decoder (PIL/ffmpeg/torchaudio) plugs in.
    """

    def __init__(self, dim: int = 16, mode: str = "fake"):
        self.dim = dim
        self.mode = mode

    def _decode(self, media_ref: str, kind: str) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                f"no {kind} codec available in this environment; "
                "plug a real decoder into MediaDecoder._decode"
            )
        h = hashlib.sha256(media_ref.encode()).digest()
        raw = np.frombuffer((h * ((self.dim * 4) // len(h) + 1))[: self.dim * 4],
                            dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(ref, kind)
            for ref, kind in zip(
                batch["media_ref"].to_pylist(), batch["kind"].to_pylist()
            )
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
            },
            schema=MEDIA_FEATURES,
        )


def media_features(
    docs: ray.data.Dataset, dim: int = 16, mode: str = "fake",
    concurrency=(1, 4), batch_size: int = 512,
) -> ray.data.Dataset:
    """documents → per-media-span feature vectors (actor pool; small
    batches because real media payloads are large — ray_guide.md
    memory-aware note)."""
    return media_spans(docs).map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"dim": dim, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
