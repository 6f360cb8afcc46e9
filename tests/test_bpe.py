"""BPE training/encoding: hand-computed merge sequences (the Sennrich
worked example shape), deterministic ties, early stop, and encode
counts under the learned table."""
from __future__ import annotations

import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.bpe import bpe_encode, bpe_train


def _docs(texts):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))


def test_merge_sequence_hand_computed():
    # corpus: low x5, lower x2  (classic fixture)
    docs = _docs(["low " * 5 + "lower " * 2])
    m = bpe_train(docs, 4).to_pandas()
    got = list(map(tuple, m[["rank", "left", "right"]]
                   .itertuples(index=False)))
    # pairs: (l,o)=7 (o,w</w>)=5 (o,w)=2 (w,e)=2 (e,r</w>)=2
    assert got[0] == (0, "l", "o")
    # after merge 0: (lo,w</w>)=5 wins
    assert got[1] == (1, "lo", "w</w>")
    # then (lo,w)=2 vs (w,e)=2 vs (e,r</w>)=2 -> lexicographic: e < lo < w
    assert got[2] == (2, "e", "r</w>")
    assert m["count"].tolist()[:3] == [7, 5, 2]


def test_early_stop_when_no_repeated_pair():
    docs = _docs(["ab cd"])  # every pair occurs once
    m = bpe_train(docs, 10).to_pandas()
    assert len(m) == 0


def test_encode_counts_under_learned_table():
    docs = _docs(["low low lower"])
    merges = bpe_train(docs, 3).to_pandas()
    out = bpe_encode(docs, merges).to_pandas()
    assert out.loc[0, "n_words"] == 3
    # learned merges stop at 2 — (l,o)x3 then (lo,w</w>)x2; every
    # remaining pair is a singleton (count < 2 early stop):
    #   low -> [low</w>]            = 1 token (x2 words)
    #   lower -> lo w e r</w>       = 4 tokens
    assert out.loc[0, "n_bpe_tokens"] == 1 + 1 + 4


def test_encode_without_merges_is_char_count():
    docs = _docs(["ab a"])
    out = bpe_encode(docs, pd.DataFrame(
        {"left": [], "right": []})).to_pandas()
    # ab -> a b</w> (2), a -> a</w> (1)
    assert out.loc[0, "n_bpe_tokens"] == 3


def test_multibatch_corpus_same_merges():
    texts = ["the cat sat on the mat"] * 3 + ["the bat"] * 2
    one = bpe_train(_docs([" ".join(texts)]), 5).to_pandas()
    many = bpe_train(_docs(texts), 5).to_pandas()
    assert one[["rank", "left", "right", "count"]].equals(
        many[["rank", "left", "right", "count"]])
