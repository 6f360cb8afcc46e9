"""Distributed Word2Vec: data-parallel SGNS over walk-corpus shards
(north_star: "fits Word2Vec skip-gram embeddings on parameter-server
actors").

Topology: the vocabulary is a Ray Data grouped count over the exploded
walks Dataset (SURVEY.md A11); the corpus is sharded across N trainer
actors; each epoch every actor runs vectorized SGNS over its shard
starting from the current global weights and ships back its delta; the
driver (acting as the parameter server) averages deltas and
re-broadcasts — synchronous federated SGD.  Deterministic: fixed shard
assignment (round-robin by sentence index) + per-actor fixed seeds +
deterministic averaging order.  Bit-identical to nothing (like gensim
workers>1); quality-equivalent, throughput-scalable.

For bit-reproducible vectors use the single-actor `embedders.Word2Vec`
(the reference's workers=1 contract, README.rst:466-498).
"""

from __future__ import annotations

import numpy as np

import ray

from pyrdf2vec_ray.embedders import SGNS


@ray.remote
class SGNSShardTrainer:
    def __init__(self, shard: list[list[int]], vocab_size: int, cfg: dict, seed: int):
        self.sents = [np.asarray(s, dtype=np.int64) for s in shard if len(s) > 0]
        self.cfg = cfg
        self.seed = seed
        self.vocab_size = vocab_size
        self.neg_table = None

    def set_neg_table(self, table: np.ndarray):
        self.neg_table = table

    def train_epoch(self, W: np.ndarray, C: np.ndarray, lr: float, epoch: int):
        """One local pass; returns (delta_W, delta_C)."""
        model = SGNS(**self.cfg)
        model.W = W.copy()
        model.C = C.copy()
        rng = np.random.RandomState(self.seed + epoch)
        k = model.negative
        window = model.window
        for ids in self.sents:
            n = len(ids)
            if n < 2:
                continue
            reduced = rng.randint(0, window, size=n)
            w = window - reduced
            cs, xs = [], []
            for i in range(n):
                lo, hi = max(0, i - w[i]), min(n, i + w[i] + 1)
                m = hi - lo - 1
                if m <= 0:
                    continue
                cs.append(np.full(m, ids[i]))
                xs.append(np.concatenate([ids[lo:i], ids[i + 1 : hi]]))
            if not cs:
                continue
            centers = np.concatenate(cs)
            ctxs = np.concatenate(xs)
            negs = self.neg_table[
                rng.randint(0, len(self.neg_table), size=len(ctxs) * k)
            ].reshape(len(ctxs), k)
            model._chunk_update(
                centers, ctxs, negs, np.full(len(centers), lr, np.float32)
            )
        return model.W - W, model.C - C


class DistributedWord2Vec:
    """API-compatible with embedders.Word2Vec; trains on N shard actors."""

    def __init__(self, num_workers: int = 4, **kwargs):
        self.num_workers = num_workers
        self.kwargs = {"min_count": 0, **kwargs}
        self._model = SGNS(**self.kwargs)

    def fit(self, walks, is_update: bool = False) -> "DistributedWord2Vec":
        corpus = [list(w) for ew in walks for w in ew]
        m = self._model
        m.build_vocab(corpus, update=is_update)
        id_corpus = [
            [m.key_to_index[t] for t in s] for s in corpus if len(s) > 0
        ]
        shards = [id_corpus[i :: self.num_workers] for i in range(self.num_workers)]
        neg_table = m._neg_table()
        trainers = [
            SGNSShardTrainer.remote(sh, len(m.counts), self.kwargs, seed=1000 + i)
            for i, sh in enumerate(shards)
        ]
        ray.get([t.set_neg_table.remote(neg_table) for t in trainers])
        total = max(1, m.epochs)
        for epoch in range(total):
            lr = max(m.min_alpha, m.alpha * (1 - epoch / total))
            W_ref, C_ref = ray.put(m.W), ray.put(m.C)
            deltas = ray.get(
                [t.train_epoch.remote(W_ref, C_ref, lr, epoch) for t in trainers]
            )
            # synchronous parameter-server step: average worker deltas in
            # fixed actor order (deterministic)
            for dW, dC in deltas:
                m.W += dW / self.num_workers
                m.C += dC / self.num_workers
        for t in trainers:
            ray.kill(t)
        return self

    def transform(self, entities: list[str]) -> list[np.ndarray]:
        if not all(e in self._model for e in entities):
            raise ValueError(
                "The entities must have been provided to fit() first "
                "before they can be transformed into a numerical vector."
            )
        return [self._model.get_vector(e) for e in entities]
