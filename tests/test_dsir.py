"""importance_weights (DSIR-style): planted-vocabulary fixtures — docs
drawn from the target vocabulary must outscore off-target docs, empty
docs score zero, and weights are additive per token."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.curate import importance_weights


def _score(raw_texts, target_texts, n_bins=64):
    raw = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(raw_texts), dtype=np.int64),
         "text": raw_texts}))
    tgt = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(target_texts), dtype=np.int64),
         "text": target_texts}))
    out = importance_weights(raw, tgt, n_bins=n_bins).to_pandas()
    return out.set_index("doc_id").sort_index()


def test_target_like_docs_outscore_off_target():
    target = ["der hund und die katze"] * 3
    raw = ["der hund und die katze",      # pure target vocabulary
           "orbit vector matrix tensor",  # disjoint vocabulary
           ""]                            # empty
    out = _score(raw, target)
    assert out.loc[0, "logw"] > out.loc[1, "logw"]
    assert out.loc[2, "logw"] == 0.0 and out.loc[2, "n_tokens"] == 0


def test_token_counts_follow_word_regex():
    out = _score(["Don't STOP 99 now!"], ["x"])
    # lowercased [a-z']+ tokens: don't / stop / now
    assert out.loc[0, "n_tokens"] == 3


def test_weights_additive_in_tokens():
    target = ["alpha beta"] * 4
    raw = ["alpha", "alpha alpha"]
    out = _score(raw, target)
    assert np.isclose(out.loc[1, "logw"], 2 * out.loc[0, "logw"])


def test_every_raw_doc_scored_once():
    target = ["a b c"]
    raw = [f"doc number {i}" for i in range(7)]
    out = _score(raw, target)
    assert len(out) == 7


def test_ctfidf_discriminative_terms_win():
    from pyrdf2vec_ray.ops.text import ctfidf_terms

    docs = ray.data.from_pandas(pd.DataFrame(
        {"cluster": ["a", "a", "b", "b"],
         "text": ["apple apple shared", "apple orchard shared",
                  "banana banana shared", "banana split shared"]}))
    out = ctfidf_terms(docs, k=2).to_pandas()
    top = {c: g.sort_values("score", ascending=False)["term"].tolist()
           for c, g in out.groupby("cluster")}
    # 'shared' appears in both clusters -> ln(2/2)=0 score, never top
    assert top["a"][0] == "apple" and "shared" not in top["a"]
    assert top["b"][0] == "banana" and "shared" not in top["b"]
    # df column counts clusters containing the term
    assert set(out.loc[out["term"] == "apple", "df"]) == {1}


def test_readability_hand_counts():
    from pyrdf2vec_ray.ops.text import readability_scores

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2],
         "text": ["The cat sat. It ran!", ""]}))
    out = (readability_scores(docs).to_pandas()
           .set_index("doc_id").sort_index())
    # 5 words, 2 sentence runs, vowel groups: e/a/a/i/a = 5
    assert out.loc[1, "n_words"] == 5
    assert out.loc[1, "n_sentences"] == 2
    assert out.loc[1, "n_syllables"] == 5
    expect = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(out.loc[1, "flesch"] - expect) < 1e-12
    # empty doc: sentence floor 1, score 0
    assert out.loc[2, "n_sentences"] == 1 and out.loc[2, "flesch"] == 0.0


def test_compression_ratio_orders_quality():
    from pyrdf2vec_ray.ops.text import compression_ratio

    rng = np.random.default_rng(11)
    random_text = " ".join(
        "".join(rng.choice(list("abcdefghijklmnop"), 8)) for _ in range(200))
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": ["spam " * 400, random_text, ""]}))
    out = (compression_ratio(docs).to_pandas()
           .set_index("doc_id").sort_index())
    # templated text compresses far harder than random text
    assert out.loc[1, "ratio"] < 0.05 < out.loc[2, "ratio"]
    assert out.loc[3, "ratio"] == 1.0 and out.loc[3, "n_bytes"] == 0
    # deterministic: fixed level -> byte-identical reruns
    again = (compression_ratio(docs).to_pandas()
             .set_index("doc_id").sort_index())
    assert (again["n_compressed"] == out["n_compressed"]).all()


def test_type_token_ratio_hand_counts():
    from pyrdf2vec_ray.ops.text import type_token_ratio

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": ["spam spam spam spam", "all words are unique", ""]}))
    out = (type_token_ratio(docs).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "n_types"] == 1 and out.loc[1, "ttr"] == 0.25
    assert out.loc[2, "ttr"] == 1.0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "ttr"] == 1.0


def test_source_kl_drift_ordering():
    from pyrdf2vec_ray.ops.curate import source_kl

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = ray.data.from_pandas(pd.DataFrame(
        {"source": ["web"] * 4 + ["code"],
         "text": [base] * 4 + ["def lambda yield async await " * 8]}))
    out = source_kl(docs, n_bins=64).set_index("source")
    # the lone off-distribution source diverges more from the blend
    assert out.loc["code", "kl"] > out.loc["web", "kl"]
    assert out.loc["web", "n_tokens"] == 4 * 45
