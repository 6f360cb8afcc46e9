"""Byte-pair-encoding tokenizer TRAINING and application (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the step before every LLM data pipeline's "token count"
column exists at all.

The key scale fact (and the classic algorithm's own structure): BPE
training needs only the WORD-FREQUENCY table, not the corpus — the
(word, count) table is a sufficient statistic, and it is
vocabulary-sized.  So the distributed part is ONE combiner-bounded
word-count reduce over the corpus; the merge loop then runs on the
driver over that bounded table (exactly Sennrich's reference
implementation), which is the same driver-residue class as the
Word2Vec vocabulary and WL label map (SCALE.md "known driver-side
residues").

* :func:`bpe_train` — corpus → (rank, left, right, count) merge table
  as a Dataset.  Deterministic: ties on pair count break
  lexicographically on (left, right); words tokenize to characters
  with the ``</w>`` end-of-word marker appended to the final symbol.
* :func:`bpe_encode` — apply a merge table to the corpus: per batch,
  each distinct word is encoded ONCE (worker-side cache + in-batch
  factorize) by the standard lowest-rank-merge-first loop, then doc
  token counts assemble vectorized.  The merge table broadcasts via
  ``ray.put`` once; streaming map, NO shuffle.

Neither direction is SQL-expressible (iterative data-dependent
merges), so both are pytest-pinned against hand-computed fixtures and
rows-only checked by the driver — the documented non-oracle class.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray
import ray.data

WORD_RE = re.compile(r"[a-z']+")
EOW = "</w>"


def _word_counts(
    docs: ray.data.Dataset, text_col: str,
) -> pd.DataFrame:
    """(word, n) over the lowercase ``[a-z']+`` token contract — the
    vocabulary-sized sufficient statistic; per-batch combiner then one
    bucket reduce, collected to the driver (bounded by vocabulary,
    not corpus)."""
    from pyrdf2vec_ray.shuffle import bucket_agg

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in batch[text_col].astype(str).tolist():
            toks.extend(WORD_RE.findall(t.lower()))
        if not toks:
            return pd.DataFrame({"word": [], "n": []})
        s = pd.Series(toks).value_counts()
        return pd.DataFrame({"word": s.index, "n": s.to_numpy()})

    return bucket_agg(
        docs.map_batches(pre, batch_format="pandas"),
        ["word"], {"n": ("n", "sum")}, pre=False).to_pandas()


def _symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def bpe_train(
    docs: ray.data.Dataset,
    n_merges: int,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Learn ``n_merges`` BPE merge rules from the corpus.  Returns a
    Dataset ``(rank, left, right, count)`` — rank 0 is the first merge
    learned; ``count`` is the weighted pair frequency at merge time.
    Stops early when no pair occurs twice (count < 2, Sennrich's
    convention)."""
    wc = _word_counts(docs, text_col)
    vocab: dict[tuple[str, ...], int] = {
        _symbols(w): int(n)
        for w, n in zip(wc["word"].tolist(), wc["n"].tolist()) if w
    }

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        joined = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab

    return ray.data.from_pandas(pd.DataFrame(
        {"rank": np.array([m[0] for m in merges], dtype=np.int64),
         "left": [m[1] for m in merges],
         "right": [m[2] for m in merges],
         "count": np.array([m[3] for m in merges], dtype=np.int64)}))


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under the merge ranks —
    the standard lowest-rank-first merge loop."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_encode(
    docs: ray.data.Dataset,
    merges: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, n_words, n_bpe_tokens) under a trained merge table —
    the real token-budget column.  The merge table (rank, left, right)
    broadcasts once via ``ray.put``; per batch every DISTINCT word is
    encoded once (pd.factorize + a worker-process cache keyed by the
    merge-table id), then counts assemble vectorized.  Streaming map,
    NO shuffle."""
    table = [(str(l), str(r)) for l, r in
             zip(merges["left"].tolist(), merges["right"].tolist())]
    ref = ray.put({p: i for i, p in enumerate(table)})
    cache_key = id(table)

    def encode(batch: pd.DataFrame,
               _cache: dict = {}) -> pd.DataFrame:  # noqa: B006
        if _cache.get("key") != cache_key:
            _cache.clear()
            _cache.update(key=cache_key, ranks=ray.get(ref), words={})
        ranks, seen = _cache["ranks"], _cache["words"]
        texts = batch[text_col].astype(str).tolist()
        toks: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tt = WORD_RE.findall(t.lower())
            counts[i] = len(tt)
            toks.extend(tt)
        ntok = np.zeros(len(texts), dtype=np.int64)
        if toks:
            codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
            per_uniq = np.empty(len(uniq), dtype=np.int64)
            for j, w in enumerate(uniq):
                n = seen.get(w)
                if n is None:
                    n = _encode_word(w, ranks)
                    seen[w] = n
                per_uniq[j] = n
            np.add.at(ntok, np.repeat(np.arange(len(texts)), counts),
                      per_uniq[codes])
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "n_words": counts, "n_bpe_tokens": ntok})

    return docs.select_columns([id_col, text_col]).map_batches(
        encode, batch_format="pandas", batch_size=1024)
