"""Training-data-pipeline operators: planted-case tests for dedup,
similarity, text analysis, windows, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.ops.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    simhash,
)
from pyrdf2vec_ray.ops.events import sessionize, tumbling_window
from pyrdf2vec_ray.ops.multimodal import MediaDecoder, media_features, media_spans
from pyrdf2vec_ray.ops.similarity import knn_bruteforce, knn_ivf
from pyrdf2vec_ray.ops.text import lang_id, quality_scores, text_stats
from pyrdf2vec_ray.util import to_table

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to the old mill by the river where it sleeps all day long"
)


def docs_ds():
    texts = [BASE, BASE, BASE.replace("lazy", "sleepy"), "completely different words here",
             "der hund und die katze sind nicht da", ""]
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts), pa.string())})
    )


def test_exact_dedup_keeps_min_doc_id():
    out = to_table(exact_dedup(docs_ds())).to_pandas().sort_values("doc_id")
    # doc 1 (identical to doc 0) is dropped
    assert set(out["doc_id"]) == {0, 2, 3, 4, 5}


def test_minhash_finds_planted_neardup():
    pairs = minhash_dedup_pairs(docs_ds(), threshold=0.5).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got          # exact dup
    assert (0, 2) in got or (1, 2) in got   # one-word-changed near dup
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for a, b in got)


def test_simhash_close_for_neardups():
    out = to_table(simhash(docs_ds())).to_pandas().set_index("doc_id")["simhash"]
    def ham(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
    assert ham(out[0], out[1]) == 0
    assert ham(out[0], out[2]) < 12
    assert ham(out[0], out[3]) > 20


def test_embedding_neardup_planted():
    v = np.random.RandomState(0).randn(20, 8).astype(np.float32)
    v[7] = v[3] * 1.001  # planted near-duplicate
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(20), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in v],
                                        pa.list_(pa.float32()))})
    )
    pairs = embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    assert (3, 7) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_knn_bruteforce_self_is_top1():
    v = np.random.RandomState(1).randn(50, 8).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in v],
                                        pa.list_(pa.float32()))})
    )
    out = knn_bruteforce(ds, v[:3], np.arange(3), k=3).to_pandas()
    for q in range(3):
        g = out[out["query_id"] == q].sort_values("cos", ascending=False)
        assert g.iloc[0]["neighbor_id"] == q  # self similarity 1.0


def test_knn_ivf_mostly_agrees_with_bruteforce():
    v = np.random.RandomState(2).randn(200, 16).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in v],
                                        pa.list_(pa.float32()))})
    )
    bf = knn_bruteforce(ds, v[:5], np.arange(5), k=5).to_pandas()
    ivf = knn_ivf(ds, v[:5], np.arange(5), k=5, n_centroids=8, nprobe=4).to_pandas()
    recall = 0
    for q in range(5):
        a = set(bf[bf["query_id"] == q]["neighbor_id"])
        b = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recall += len(a & b) / len(a)
    assert recall / 5 >= 0.5  # approximate, but must find self + close items


def test_text_stats_and_quality():
    st = to_table(text_stats(docs_ds())).to_pandas().set_index("doc_id")
    assert st.loc[3, "n_tokens"] == 4
    assert st.loc[3, "n_chars"] == len("completely different words here")
    q = to_table(quality_scores(docs_ds())).to_pandas().set_index("doc_id")
    assert q.loc[0, "stopword_ratio"] > q.loc[4, "stopword_ratio"]


def test_lang_id_heuristic():
    out = to_table(lang_id(docs_ds())).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[4, "lang_pred"] == "de"
    assert out.loc[5, "lang_pred"] == "und"


def test_tumbling_window_counts():
    ts = pd.to_datetime(
        ["2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 11:05",
         "2024-01-01 10:30"]
    )
    ds = ray.data.from_pandas(
        pd.DataFrame({"user_id": [1, 1, 1, 2], "ts": ts,
                      "value": [1.0, 2.0, 3.0, 4.0]})
    )
    out = to_table(tumbling_window(ds, freq="h")).to_pandas()
    row = out[(out["user_id"] == 1)
              & (out["window_start"] == pd.Timestamp("2024-01-01 10:00"))]
    assert int(row["n_events"].iloc[0]) == 2
    assert float(row["sum_value"].iloc[0]) == 3.0


def test_sessionize_gap():
    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 12:00"]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"user_id": [1, 1, 1], "ts": ts}))
    out = to_table(sessionize(ds, gap_minutes=30)).to_pandas()
    assert len(out) == 2
    assert sorted(out["n_events"]) == [1, 2]


def test_media_pipeline_fake_and_strict():
    docs_t = synth.make_documents_batch(list(range(40)), seed=4, n_entities=10)
    ds = ray.data.from_arrow(docs_t)
    spans = to_table(media_spans(ds)).to_pandas()
    assert set(spans["kind"]) <= {"image", "audio", "video"}
    assert (spans["media_ref"].str.startswith("media://")).all()
    feats = to_table(media_features(ds, dim=8)).to_pandas()
    assert len(feats) == len(spans)
    assert all(len(f) == 8 for f in feats["feature"])
    # determinism of the fake codec
    d = MediaDecoder(dim=8)
    assert np.array_equal(d._decode("media://x/1", "image"),
                          d._decode("media://x/1", "image"))
    with pytest.raises(NotImplementedError):
        MediaDecoder(dim=8, mode="strict")._decode("media://x/1", "image")


def test_embedding_neardup_multitable_recall():
    # 50 base vectors + a perturbed copy of each (cos > 0.999): with two
    # LSH tables the planted pairs must be found at high recall, and the
    # result is a Dataset (no driver-side pair materialization)
    rng = np.random.RandomState(5)
    v = rng.randn(50, 16).astype(np.float32)
    ids = list(range(50)) + [100 + i for i in range(50)]
    vecs = np.concatenate([v, v + rng.randn(50, 16).astype(np.float32) * 1e-3])
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in vecs],
                                        pa.list_(pa.float32()))})
    )
    out = embedding_neardup_pairs(ds, threshold=0.999)
    assert isinstance(out, ray.data.Dataset)
    got = set(zip(*[out.to_pandas()[c] for c in ("id_a", "id_b")]))
    planted = {(i, 100 + i) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9
    # no duplicate pair rows despite multi-table probing
    assert len(got) == out.count()


def test_lang_quality_vectorized_match_naive():
    """The vectorized extractall formulations must reproduce the naive
    per-row semantics exactly (wordlist regex, tie handling, empties)."""
    import re

    from pyrdf2vec_ray.ops.text import LANG_PROFILES, LangId, QualityScorer

    word_re = re.compile(r"[a-zA-Z']+")
    texts = [
        "The quick brown fox and the lazy dog", "", "    ", "123 456 !!",
        "der hund und die katze", "le chat et la vie est belle",
        "el que la es THE THE the", "o'neill's DOG", "und der the le el",
        "a " * 50 + "zzz",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    q = QualityScorer()(df.copy())
    for i, t in enumerate(texts):
        ws = word_re.findall(t.lower())
        assert q["n_words"][i] == len(ws)
        exp_stop = sum(w in LANG_PROFILES["en"] for w in ws)
        assert q["stopword_ratio"][i] == exp_stop / max(1, len(ws))
        exp_mean = float(np.mean([len(w) for w in ws])) if ws else 0.0
        assert abs(q["mean_word_len"][i] - exp_mean) < 1e-12

    lang = LangId()(df.copy())
    for i, t in enumerate(texts):
        ws = word_re.findall(t.lower())
        best, best_hits = "und", 0
        for lg in sorted(LANG_PROFILES):
            hits = sum(w in LANG_PROFILES[lg] for w in ws)
            if hits > best_hits:
                best, best_hits = lg, hits
        assert lang["lang_pred"][i] == best, (i, t)


def test_bpe_token_count():
    from pyrdf2vec_ray.ops.text import BPE_RE, token_count_bpe

    texts = ["I'll say don't, 42 times!", "", "hello world"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    out = to_table(token_count_bpe(ds)).to_pandas().sort_values("doc_id")
    import re
    assert out["n_bpe_tokens"].tolist() == [
        len(BPE_RE.findall(t)) for t in texts
    ]
    # contraction suffixes split like a BPE pre-tokenizer
    assert BPE_RE.findall("I'll don't") == ["I", "'ll", " don", "'t"]


def test_knn_ivf_recall_vs_bruteforce():
    from pyrdf2vec_ray.ops.similarity import knn_bruteforce, knn_ivf

    rng = np.random.RandomState(3)
    # clustered corpus so IVF centroids are meaningful
    centers = rng.randn(8, 16) * 4
    vecs = np.concatenate([c + rng.randn(40, 16) * 0.3 for c in centers])
    ids = np.arange(len(vecs))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))})
    ).repartition(4)
    q = vecs[:6]
    qids = ids[:6]
    exact = knn_bruteforce(ds, q, qids, k=5).to_pandas()
    approx = knn_ivf(ds, q, qids, k=5, n_centroids=8, nprobe=3).to_pandas()
    # top-1 must be the query itself in both (self-similarity 1.0)
    for qid in qids:
        assert exact[exact.query_id == qid].iloc[0]["neighbor_id"] == qid
        assert approx[approx.query_id == qid].iloc[0]["neighbor_id"] == qid
    # recall@5 of the probed search vs exact
    hits = 0
    for qid in qids:
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits / (5 * len(qids)) >= 0.8


def test_multimodal_resize_and_frames():
    from pyrdf2vec_ray import synth
    from pyrdf2vec_ray.ops.multimodal import resize_images, sample_frames

    docs = synth.synth_documents(300, seed=5, n_entities=30)
    imgs = to_table(resize_images(docs, width=16, height=12, concurrency=1))
    assert imgs.num_rows > 0
    assert set(imgs["kind"].to_pylist()) == {"image"}
    # binary pixel buffers have exactly width*height uint8 bytes
    assert all(len(p) == 16 * 12 for p in imgs["pixels"].to_pylist())
    # deterministic across runs
    imgs2 = to_table(resize_images(docs, width=16, height=12, concurrency=1))
    assert imgs.sort_by("media_ref").equals(imgs2.sort_by("media_ref"))

    frames = to_table(sample_frames(docs, stride=25, dim=8, concurrency=1))
    assert frames.num_rows > 0
    df = frames.to_pandas()
    # one video span fans out to multiple sampled frames, stride-spaced
    per_ref = df.groupby("media_ref")["frame_idx"].apply(list)
    assert any(len(v) > 1 for v in per_ref)
    for idxs in per_ref:
        assert idxs == sorted(idxs)
        assert all(i % 25 == 0 for i in idxs)
    assert all(len(f) == 8 for f in df["feature"])


def test_multimodal_strict_mode_raises():
    import pytest

    from pyrdf2vec_ray import synth
    from pyrdf2vec_ray.ops.multimodal import resize_images, sample_frames

    docs = synth.synth_documents(50, seed=5, n_entities=10)
    with pytest.raises(Exception, match="NotImplementedError|codec|demuxer"):
        to_table(resize_images(docs, mode="strict", concurrency=1))
    with pytest.raises(Exception, match="NotImplementedError|demuxer|codec"):
        to_table(sample_frames(docs, mode="strict", concurrency=1))


def test_tfidf_topk_matches_naive(ray_session):
    import math
    from collections import Counter

    from pyrdf2vec_ray.ops.text import tfidf_topk

    texts = {
        1: "the cat sat on the mat",
        2: "the dog ate the cat food",
        3: "quantum flux capacitor hums",
        4: "the the the dog dog runs",
    }
    docs = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in texts.items()]
    )
    got = tfidf_topk(docs, k=2).to_pandas()

    # naive reference
    tf = {d: Counter(t.lower().split()) for d, t in texts.items()}
    df = Counter(w for c in tf.values() for w in c)
    n = float(len(texts))
    want = {}
    for d, c in tf.items():
        scored = sorted(
            ((round(cnt * math.log(n / df[w]), 6), w, cnt) for w, cnt in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        want[d] = [(w, cnt, df[w]) for _, w, cnt in scored]

    for d, rows in got.groupby("doc_id"):
        rows = rows.sort_values(
            ["tfidf", "token"], ascending=[False, True]
        )
        assert [(r.token, r.tf, r.df) for r in rows.itertuples()] == want[d]
        for r in rows.itertuples():
            assert abs(r.tfidf - r.tf * math.log(n / r.df)) < 1e-9


def test_repetition_stats_signals():
    import ray.data
    from pyrdf2vec_ray.ops.text import repetition_stats

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a a a a",          # one token repeated
                    "a b c d",          # all distinct
                    "a b a b a b",      # repeated 2-grams
                    "x",                # single token
                ],
            }
        )
    )
    out = (
        repetition_stats(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_words"]) == [4, 4, 6, 1]
    assert out.loc[0, "top_token_ratio"] == 1.0
    assert out.loc[1, "top_token_ratio"] == 0.25
    assert abs(out.loc[2, "top_token_ratio"] - 0.5) < 1e-12
    # doc 1: 3 identical 2-grams of 3 -> ratio 1 - 1/3
    assert abs(out.loc[0, "dup_2gram_ratio"] - (1 - 1 / 3)) < 1e-12
    assert out.loc[1, "dup_2gram_ratio"] == 0.0
    # doc 3: 5 2-grams, 2 distinct ("a b" x3, "b a" x2)
    assert abs(out.loc[2, "dup_2gram_ratio"] - (1 - 2 / 5)) < 1e-12
    # single-token doc: whole-text shingle, no duplication
    assert out.loc[3, "dup_2gram_ratio"] == 0.0


def test_asof_join_semantics():
    import ray.data
    from pyrdf2vec_ray.ops.events import asof_join

    ts = pd.to_datetime(
        ["2024-01-01 00:00:05", "2024-01-01 00:00:10", "2024-01-01 00:00:20"]
    )
    left = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": ts,
        "event_id": [100, 101, 102],
        "value": [1.0, 2.0, 3.0],
    }))
    rts = pd.to_datetime(
        ["2024-01-01 00:00:05", "2024-01-01 00:00:05",
         "2024-01-01 00:00:08", "2024-01-01 00:00:30"]
    )
    right = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": rts,
        "event_id": [7, 9, 8, 10],
        "value": [0.5, 0.7, 0.8, 0.9],
    }))
    out = (
        asof_join(left, right, right_prefix="r_")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # click@05 matches the tied views@05 -> max event_id (9) wins
    # click@10 matches view@08; user-2 click@20 has NO prior view -> dropped
    assert list(out["event_id"]) == [100, 101]
    assert list(out["r_event_id"]) == [9, 8]
    assert list(out["r_value"]) == [0.7, 0.8]


def test_sliding_window_covers_k_windows():
    import ray.data
    from pyrdf2vec_ray.ops.events import sliding_window

    ts = pd.to_datetime(["2024-01-01 10:20:00", "2024-01-01 10:50:00"])
    ds = ray.data.from_pandas(
        pd.DataFrame({"user_id": [1, 1], "ts": ts, "value": [1.0, 2.0]})
    )
    out = (
        sliding_window(ds, window_s=3600, slide_s=900)
        .to_pandas()
        .sort_values("window_start_s")
        .reset_index(drop=True)
    )
    base = int(pd.Timestamp("2024-01-01 10:15:00").timestamp())
    # event@10:20 covered by windows starting 09:30..10:15 (4 windows);
    # event@10:50 by 10:00..10:45 -> overlap at 10:00 and 10:15
    both = out[out["n_events"] == 2]
    assert sorted(both["window_start_s"]) == [base - 900, base]
    assert (both["sum_value"] == 3.0).all()
    assert len(out) == 6  # 4 + 4 - 2 overlapping
    with pytest.raises(ValueError):
        sliding_window(ds, window_s=3600, slide_s=700)


def test_interval_join_containment_and_overlap_guard():
    import ray.data
    from pyrdf2vec_ray.ops.events import interval_join

    pts = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 11:30",
                              "2024-01-01 10:05", "2024-01-01 10:20"]),
        "event_id": [1, 2, 3, 4],
    }))
    iv = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 2],
        "session_start": pd.to_datetime(
            ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 10:10"]),
        "session_end": pd.to_datetime(
            ["2024-01-01 10:30", "2024-01-01 11:15", "2024-01-01 10:30"]),
    }))
    out = (
        interval_join(pts, iv)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 2 (11:30) is outside both user-1 intervals; event 3 (10:05)
    # precedes user-2's interval
    assert list(out["event_id"]) == [1, 4]
    assert out.loc[0, "session_end"] == pd.Timestamp("2024-01-01 10:30")

    bad = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1],
        "session_start": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:10"]),
        "session_end": pd.to_datetime(["2024-01-01 10:30", "2024-01-01 10:40"]),
    }))
    with pytest.raises(Exception, match="non-overlapping"):
        interval_join(pts, bad).to_pandas()


def test_hll_estimate_within_error_bound():
    import ray.data
    from pyrdf2vec_ray.ops.sketch import hll_estimate, hll_registers

    rng = np.random.RandomState(7)
    # two languages with known distinct-token counts
    def mk(lang, n_tokens, n_docs):
        vocab = [f"{lang}tok{i}" for i in range(n_tokens)]
        return [
            (d, " ".join(rng.choice(vocab, 30)), lang) for d in range(n_docs)
        ]

    rows = mk("aa", 1500, 300) + mk("bb", 400, 200)
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    regs = hll_registers(ray.data.from_pandas(df)).to_pandas()
    est = hll_estimate(regs).set_index("lang")["est_distinct"]
    # exact distinct tokens actually used per lang
    exact = (
        df.assign(tok=df["text"].str.split())
        .explode("tok").groupby("lang")["tok"].nunique()
    )
    for lang in ("aa", "bb"):
        rel = abs(est[lang] - exact[lang]) / exact[lang]
        assert rel < 0.15, (lang, est[lang], exact[lang])
    # registers merge by max: sketch of half the docs never exceeds full
    half = hll_registers(
        ray.data.from_pandas(df.iloc[: len(df) // 2])
    ).to_pandas()
    m = half.merge(regs, on=["lang", "reg"], suffixes=("_h", "_f"))
    assert (m["rho_max_h"] <= m["rho_max_f"]).all()


def test_cms_point_estimates_bound_exact_counts():
    import ray.data
    from pyrdf2vec_ray.ops.sketch import cms_counters, cms_query

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(300)]
    # zipf-ish: token w0 very heavy
    texts = [
        " ".join(rng.choice(vocab, 40, p=np.ones(300) / 300))
        + " w0 w0 w0"
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    counters = cms_counters(ray.data.from_pandas(df)).to_pandas()
    exact = (
        df["text"].str.split().explode().value_counts()
    )
    probe = ["w0", "w1", "w2", "w17"]
    est = cms_query(counters, probe).set_index("token")["est"]
    for t in probe:
        assert est[t] >= exact[t]  # CM never underestimates
    # the heavy hitter is estimated tightly (overestimate <= ||f||_1/width * e ~ small)
    assert est["w0"] <= exact["w0"] + 8 * len(df["text"].str.split().explode()) / 1024
    # counters merge by sum: half-corpus counters <= full
    half = cms_counters(ray.data.from_pandas(df.iloc[:100])).to_pandas()
    m = half.merge(counters, on=["d", "j"], suffixes=("_h", "_f"))
    assert (m["cnt_h"] <= m["cnt_f"]).all()


def test_attribution_lookback_and_tiebreak():
    import ray.data
    from pyrdf2vec_ray.ops.events import attribution

    ts = pd.to_datetime([
        "2024-01-01 00:00:00",  # 0 view  u1
        "2024-01-01 00:00:00",  # 1 click u1 (tied ts with 0)
        "2024-01-01 01:00:00",  # 2 purchase u1 -> touch 1 (max id at tie)
        "2024-01-01 09:00:00",  # 3 purchase u1 -> touch 8h old, OUTSIDE 6h
        "2024-01-01 00:30:00",  # 4 view  u2
        "2024-01-01 02:00:00",  # 5 purchase u2 -> touch 4 (90min <= 6h)
        "2024-01-01 03:00:00",  # 6 purchase u3 -> no touch at all, dropped
    ])
    ev = ray.data.from_pandas(pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4, 5, 6],
        "ts": ts,
        "user_id": [1, 1, 1, 1, 2, 2, 3],
        "event_type": ["view", "click", "purchase", "purchase",
                       "view", "purchase", "purchase"],
        "value": [0.0, 0.0, 10.0, 20.0, 0.0, 30.0, 40.0],
    }))
    out = (attribution(ev, lookback=pd.Timedelta(hours=6))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert list(out["event_id"]) == [2, 5]
    assert list(out["touch_event_id"]) == [1, 4]
    assert list(out["channel"]) == ["click", "view"]
    assert list(out["value"]) == [10.0, 30.0]


def test_attribution_no_lookback_matches_any_prior_touch():
    import ray.data
    from pyrdf2vec_ray.ops.events import attribution

    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-05 00:00:00"])
    ev = ray.data.from_pandas(pd.DataFrame({
        "event_id": [0, 1],
        "ts": ts,
        "user_id": [1, 1],
        "event_type": ["view", "purchase"],
        "value": [0.0, 5.0],
    }))
    out = attribution(ev).to_pandas()
    assert list(out["touch_event_id"]) == [0]
    assert list(out["channel"]) == ["view"]
