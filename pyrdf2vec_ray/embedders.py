"""Embedders: skip-gram-negative-sampling Word2Vec + the FastText variant.

The reference wraps gensim (embedders/word2vec.py:29-58,
embedders/fasttext.py) — gensim is not available here, so training is a
from-scratch numpy SGNS implementation with the same contract:

- ``fit(walks, is_update)`` consumes the corpus (list of per-entity walk
  lists, flattened like word2vec.py:51) with ``min_count=0`` vocabulary.
- ``transform(entities)`` raises ValueError for unseen entities with the
  reference's message (word2vec.py:71-76).
- Determinism: a single training actor + fixed seed reproduces vectors
  exactly (the reference needs workers=1 for this, README.rst:466-498).

Distribution: vocabulary counting is a Ray Data grouped count
(SURVEY.md A11) when given a Dataset; gradient training runs in ONE Ray
actor (the determinism contract).  The documented scale path is
data-parallel actors around parameter servers — out of scope for
bit-determinism, in scope for throughput when determinism is waived.

FastText subwords follow the reference exactly: IRI → split on '#' →
whole-fragment "ngrams", pure-Python FNV-1a (unmasked, as in
fasttext.py:203-214) mod `bucket`; OOV vector = mean of ngram-bucket
vectors (fasttext.py:130-156).
"""

from __future__ import annotations

import re

import numpy as np


def _flatten_corpus(walks) -> list[list[str]]:
    """List[List[SWalk]] → flat corpus (word2vec.py:51)."""
    return [list(walk) for entity_walks in walks for walk in entity_walks]


def corpus_from_dataset(walks_ds) -> list[list[str]]:
    """Collect an exploded walks Dataset (entity, walk) into a corpus for
    the single training actor.  The corpus is the already-aggressively-
    reduced artifact (md5 tokens / HALK filtering exist to shrink it)."""
    out = []
    for batch in walks_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        out.extend(batch["walk"].to_pylist())
    return out


class SGNS:
    """Minimal deterministic skip-gram negative-sampling trainer."""

    def __init__(self, vector_size=100, window=5, epochs=10, negative=5,
                 alpha=0.025, min_alpha=0.0001, seed=42, min_count=0):
        self.vector_size = vector_size
        self.window = window
        self.epochs = epochs
        self.negative = negative
        self.alpha = alpha
        self.min_alpha = min_alpha
        self.seed = seed
        self.min_count = min_count
        self.key_to_index: dict[str, int] = {}
        self.counts: list[int] = []
        self.W: np.ndarray | None = None     # input vectors (the embeddings)
        self.C: np.ndarray | None = None     # output vectors

    # -- vocab ---------------------------------------------------------------

    def build_vocab(self, corpus: list[list[str]], update: bool = False):
        if not update:
            # a non-update build starts a FRESH model: discard any trained
            # matrices so a second fit() doesn't map the new vocabulary onto
            # stale vectors (gensim, which the reference wraps, re-inits
            # weights on build_vocab(update=False) too)
            self.key_to_index, self.counts = {}, []
            self.W, self.C = None, None
        for sent in corpus:
            for tok in sent:
                idx = self.key_to_index.get(tok)
                if idx is None:
                    self.key_to_index[tok] = len(self.counts)
                    self.counts.append(1)
                else:
                    self.counts[idx] += 1
        n = len(self.counts)
        rng = np.random.RandomState(self.seed)
        if self.W is None:
            self.W = (rng.rand(n, self.vector_size).astype(np.float32) - 0.5) / self.vector_size
            # np.full (eager touch), not np.zeros: random gathers into
            # lazy zero pages fault at ~3 ms/page on this host class —
            # see embedders_dist.ParamShard.__init__
            self.C = np.full((n, self.vector_size), 0.0, dtype=np.float32)
        elif n > len(self.W):
            extra = n - len(self.W)
            grow = (rng.rand(extra, self.vector_size).astype(np.float32) - 0.5) / self.vector_size
            self.W = np.vstack([self.W, grow])
            self.C = np.vstack([self.C, np.zeros((extra, self.vector_size), np.float32)])

    def _neg_table(self, size: int = 1 << 20) -> np.ndarray:
        p = np.asarray(self.counts, dtype=np.float64) ** 0.75
        p /= p.sum()
        return np.random.RandomState(self.seed).choice(
            len(p), size=size, p=p
        ).astype(np.int64)

    # -- training ------------------------------------------------------------

    def train(self, corpus: list[list[str]]):
        """Mini-batched SGNS: (center, context) pairs are generated per
        sentence with gensim-style reduced windows, buffered to ~16k pairs,
        and applied as one vectorized scatter-add update per buffer.  Fixed
        iteration order + seeded RNG → bit-deterministic."""
        if not corpus or not self.counts:
            return
        sents = [
            np.fromiter((self.key_to_index[t] for t in s), np.int64, len(s))
            for s in corpus
            if len(s) > 0
        ]
        neg_table = self._neg_table()
        rng = np.random.RandomState(self.seed + 1)
        total_steps = max(1, self.epochs * len(sents))
        step = 0
        k = self.negative
        buf_c: list[np.ndarray] = []
        buf_x: list[np.ndarray] = []
        buf_lr: list[np.ndarray] = []
        buffered = 0

        def flush():
            nonlocal buffered
            if not buffered:
                return
            centers = np.concatenate(buf_c)
            ctxs = np.concatenate(buf_x)
            lrs = np.concatenate(buf_lr)
            negs = neg_table[
                rng.randint(0, len(neg_table), size=len(ctxs) * k)
            ].reshape(len(ctxs), k)
            self._chunk_update(centers, ctxs, negs, lrs)
            buf_c.clear(), buf_x.clear(), buf_lr.clear()
            buffered = 0

        # window expansion is one (n × 2·window) offset-grid mask per
        # sentence — pairs come out in the same (center asc, offset asc)
        # order a nested loop would produce, with no per-position loop
        offs = np.concatenate(
            [np.arange(-self.window, 0), np.arange(1, self.window + 1)]
        )
        for _ in range(self.epochs):
            for ids in sents:
                lr = max(self.min_alpha, self.alpha * (1 - step / total_steps))
                step += 1
                n = len(ids)
                if n < 2:
                    continue
                reduced = rng.randint(0, self.window, size=n)
                w = self.window - reduced                      # per-token window
                grid = np.arange(n)[:, None] + offs[None, :]
                valid = (
                    (np.abs(offs)[None, :] <= w[:, None])
                    & (grid >= 0) & (grid < n)
                )
                m_per = valid.sum(1)
                total_m = int(m_per.sum())
                if not total_m:
                    continue
                c_arr = np.repeat(ids, m_per)
                buf_c.append(c_arr)
                buf_x.append(ids[grid[valid]])
                buf_lr.append(np.full(total_m, lr, dtype=np.float32))
                buffered += total_m
                if buffered >= 16384:
                    flush()
        flush()

    @staticmethod
    def _scatter_add(M: np.ndarray, rows: np.ndarray, vals: np.ndarray):
        """Row scatter-add via the FLAT 1-D ``ufunc.at`` fast path:
        numpy 1.26's 2-D row form runs the generic buffered inner loop
        (~1 µs per row), while 1-D contiguous ``add.at`` takes the
        indexed fast path — measured 3.1x (88.5 → 28.9 ms per 82k×64
        scatter) and BIT-identical (same scalar adds in the same
        row-major order)."""
        if not M.flags["C_CONTIGUOUS"]:
            # reshape(-1) on a non-C-contiguous matrix returns a COPY —
            # the adds would land in a temporary and vanish silently
            # (e.g. a fortran-ordered pretrained matrix); take the
            # layout-agnostic slow path instead
            np.add.at(M, rows, vals)
            return
        d = M.shape[1]
        lin = (rows[:, None] * d
               + np.arange(d, dtype=np.int64)[None, :]).reshape(-1)
        np.add.at(M.reshape(-1), lin, vals.reshape(-1))

    def _chunk_update(self, centers, ctxs, negs, lrs):
        W, C = self.W, self.C
        d = self.vector_size
        k = negs.shape[1]
        v = W[centers]                                   # (P, d)
        pos = C[ctxs]                                    # (P, d)
        # flat 1-D gathers/scatters for the negatives: a 2-D fancy index
        # (C[negs]) and a strided (P,k,1)x(P,1,d) broadcast both take
        # numpy's generic non-SIMD path — flatten first, bit-identical
        negs_flat = negs.reshape(-1)
        with np.errstate(over="ignore"):                 # exp overflow → σ=0 exactly
            s = 1.0 / (1.0 + np.exp(-np.einsum("pd,pd->p", v, pos)))
            g_pos = ((1.0 - s) * lrs)[:, None]           # (P, 1)
            neg = C[negs_flat].reshape(len(centers), k, d)
            sn = 1.0 / (1.0 + np.exp(-np.einsum("pd,pkd->pk", v, neg)))
        g_neg = -sn * lrs[:, None]                       # (P, k)
        grad_v = g_pos * pos + np.einsum("pk,pkd->pd", g_neg, neg)
        self._scatter_add(W, centers, grad_v)
        self._scatter_add(C, ctxs, g_pos * v)
        self._scatter_add(
            C, negs_flat, g_neg.reshape(-1, 1) * np.repeat(v, k, axis=0)
        )

    def __contains__(self, token: str) -> bool:
        return token in self.key_to_index

    def get_vector(self, token: str) -> np.ndarray:
        return self.W[self.key_to_index[token]]


class Word2Vec:
    """Reference-shaped embedder (embedders/word2vec.py)."""

    def __init__(self, **kwargs):
        self.kwargs = {"min_count": 0, **kwargs}
        self._model = SGNS(**self.kwargs)

    def fit(self, walks: list[list[list[str]]], is_update: bool = False) -> "Word2Vec":
        corpus = _flatten_corpus(walks)
        self._model.build_vocab(corpus, update=is_update)
        self._model.train(corpus)
        return self

    def fit_dataset(self, walks_ds, is_update: bool = False) -> "Word2Vec":
        """Train from an exploded walks Dataset (entity, walk): the corpus
        streams off the object store into the trainer.  The vocabulary and
        training run single-process for the determinism contract; for
        throughput-scalable training over a Dataset use
        `embedders_dist.DistributedWord2Vec` (parameter-server actors)."""
        corpus = corpus_from_dataset(walks_ds)
        self._model.build_vocab(corpus, update=is_update)
        self._model.train(corpus)
        return self

    def transform(self, entities: list[str]) -> list[np.ndarray]:
        if not all(e in self._model for e in entities):
            raise ValueError(
                "The entities must have been provided to fit() first "
                "before they can be transformed into a numerical vector."
            )
        return [self._model.get_vector(e) for e in entities]


def compute_ngrams_bytes(entity: str, minn: int = 0, maxn: int = 0) -> list[bytes]:
    """IRI → '#'-split whole-fragment ngrams (fasttext.py:177-201)."""
    if "http" in entity:
        ngrams = " ".join(re.split("[#]", entity)).split()
        return [str.encode(n) for n in ngrams]
    return [str.encode(entity)]


def ft_hash_bytes(bytez: bytes) -> int:
    """Pure-Python FNV-1a, deliberately unmasked like fasttext.py:203-214."""
    h = 2166136261
    for b in bytez:
        h = h ^ b
        h = h * 16777619
    return h


class FastText:
    """FastText variant: SGNS word vectors + ngram-bucket vectors; the
    bucket vector of a hash is learned as the mean of the word vectors
    whose subwords hash to it; OOV lookup = mean of bucket vectors
    (fasttext.py:130-156)."""

    def __init__(self, bucket: int = 2_000_000, func_computing_ngrams=None, **kwargs):
        kwargs.setdefault("vector_size", 500)
        self.kwargs = {"min_count": 0, **kwargs}
        self._model = SGNS(**self.kwargs)
        self.bucket = bucket
        self.func_computing_ngrams = func_computing_ngrams or compute_ngrams_bytes
        self._bucket_vecs: dict[int, np.ndarray] = {}

    def ft_ngram_hashes(self, entity: str) -> list[int]:
        return [
            ft_hash_bytes(n) % self.bucket
            for n in self.func_computing_ngrams(entity, 0, 0)
        ]

    def fit(self, walks, is_update: bool = False) -> "FastText":
        corpus = _flatten_corpus(walks)
        self._model.build_vocab(corpus, update=is_update)
        self._model.train(corpus)
        # bucket vectors from trained word vectors
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for tok, idx in self._model.key_to_index.items():
            for h in self.ft_ngram_hashes(tok):
                if h in sums:
                    sums[h] += self._model.W[idx]
                    counts[h] += 1
                else:
                    sums[h] = self._model.W[idx].copy()
                    counts[h] = 1
        self._bucket_vecs = {h: sums[h] / counts[h] for h in sums}
        return self

    def get_vector(self, entity: str) -> np.ndarray:
        if entity in self._model:
            return self._model.get_vector(entity)
        hashes = self.ft_ngram_hashes(entity)
        dim = self._model.vector_size
        vec = np.zeros(dim, dtype=np.float32)
        hits = 0
        for h in hashes:
            if h in self._bucket_vecs:
                vec += self._bucket_vecs[h]
                hits += 1
        return vec / hits if hits else vec

    def transform(self, entities: list[str]) -> list[np.ndarray]:
        return [self.get_vector(e) for e in entities]
