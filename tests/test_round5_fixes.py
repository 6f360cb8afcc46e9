"""Round-5 ADVICE fixes pinned by tests.

1. neighbor_jaccard works on int64 vertex ids (ADVICE r4 item 1): the
   top-k tie-break key packs int pairs order-preservingly instead of
   string-concatenating, so numeric tie order matches ORDER BY u, v.
2. gini_int / grouped_gini raise on int64 rank-sum overflow instead of
   wrapping silently (ADVICE r4 item 3).
3. benford_firstdigit quantizes half-away-from-zero like SQL round()
   (ADVICE r4 item 4).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pyrdf2vec_ray.ops.graph import neighbor_jaccard


def test_neighbor_jaccard_int_ids():
    # same topology as the string-keyed exact-small test, int vertices:
    # 10: {1, 2, 3}; 20: {1, 2}; 30: {2}
    rows = [(10, 1), (10, 2), (10, 3),
            (20, 1), (20, 2),
            (30, 2)]
    df = pd.DataFrame(rows, columns=["a", "b"]).astype(np.int64)
    out = neighbor_jaccard(ray.data.from_pandas(df), k=10).to_pandas()
    got = {(r.u, r.v): (r.inter, r.deg_u, r.deg_v, round(r.jaccard, 6))
           for r in out.itertuples()}
    assert got[(10, 20)] == (2, 3, 2, round(2 / 3, 6))
    assert got[(10, 30)] == (1, 3, 1, round(1 / 3, 6))
    assert got[(20, 30)] == (1, 2, 1, 0.5)


def test_neighbor_jaccard_int_tie_order():
    # two pairs with identical jaccard (1.0): (1,2) and (3,4) — k=1
    # must keep (1,2), the smaller (u, v), exactly as ORDER BY u, v
    rows = [(1, 7), (2, 7), (3, 8), (4, 8)]
    df = pd.DataFrame(rows, columns=["a", "b"]).astype(np.int64)
    out = neighbor_jaccard(ray.data.from_pandas(df), k=1).to_pandas()
    assert len(out) == 1
    assert (int(out["u"].iloc[0]), int(out["v"].iloc[0])) == (1, 2)


def test_neighbor_jaccard_int_ids_too_large():
    rows = [(1 << 33, 1), (2, 1)]
    df = pd.DataFrame(rows, columns=["a", "b"]).astype(np.int64)
    # the ValueError surfaces wrapped in RayTaskError — match message
    with pytest.raises(Exception, match="2\\^32"):
        neighbor_jaccard(ray.data.from_pandas(df), k=5).to_pandas()


def test_gini_int_overflow_raises():
    from pyrdf2vec_ray.ops.agg import gini_int

    # n·total >= 2^63: one giant value with a huge frequency would wrap
    # the rank-sum; the op must raise, not return a plausible float
    big = (1 << 62)
    ds = ray.data.from_arrow(pa.table({"v": pa.array([big, big],
                                                     pa.int64())}))
    with pytest.raises(OverflowError, match="int64"):
        gini_int(ds, "v")


def test_grouped_gini_overflow_raises():
    from pyrdf2vec_ray.ops.agg import grouped_gini

    big = (1 << 62)
    df = pd.DataFrame({"g": ["a", "a"], "v": [big, big]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(OverflowError, match="int64"):
        grouped_gini(ds, "g", "v").to_pandas()


def test_gini_int_small_still_exact():
    from pyrdf2vec_ray.ops.agg import gini_int

    # hand value: x = [1, 1, 2] -> gini = 2*(1*1+1*2+2*3... use the
    # rank-sum formula directly: sorted x=[1,1,2], ranks 1..3,
    # S = 1*1 + 1*2 + 2*3 = 9, n=3, T=4 -> 2*9/(3*4) - 4/3 = 1/6
    ds = ray.data.from_pandas(pd.DataFrame({"v": [2, 1, 1]}))
    t = gini_int(ds, "v")
    assert t["n"][0].as_py() == 3
    assert t["total"][0].as_py() == 4
    assert abs(t["gini"][0].as_py() - (2 * 9 / 12 - 4 / 3)) < 1e-12


def test_benford_half_away_rounding():
    from pyrdf2vec_ray.ops.validate import benford_firstdigit

    # 0.195 * 100 = 19.5 exactly in this float? 0.195 is not exact in
    # binary — use values whose scaled product IS an exact .5:
    # 0.5/100 scale=100 -> not useful; take v where v*100 == x.5
    # exactly representable: v = 19.5/100 is inexact, so construct via
    # scale=10 and v = 2.45 ... safest: v*scale computed from halves:
    vals = np.array([1.5, 2.5, 9.5]) / 100.0 * 100.0  # == [1.5,2.5,9.5]
    # feed with scale=1 so units are exactly n.5
    df = pd.DataFrame({"v": [1.5, 2.5, 9.5, 0.4]})
    out = (benford_firstdigit(ray.data.from_pandas(df), "v", scale=1)
           .to_pandas().set_index("digit")["observed"])
    # half-away: 1.5->2, 2.5->3, 9.5->10 (digit 1), 0.4->0 excluded
    assert int(out.get(2, 0)) == 1
    assert int(out.get(3, 0)) == 1
    assert int(out.get(1, 0)) == 1
    # np.round (half-even) would have produced 2, 2, 10 instead
    assert int(out.get(9, 0)) == 0


def test_link_scores_fanout_bound():
    """max_center_fanout: each center keeps its first k neighbors in
    (md5(v), v) order — wedge volume O(k^2) per center; kept-neighbor
    pairs score identically to the unbounded run (full degrees in
    denominators), dropped pairs are exactly the non-kept ones."""
    import hashlib

    import pandas as pd
    import ray.data

    from pyrdf2vec_ray.ops.graph import link_scores
    from pyrdf2vec_ray.util import to_table

    # star: center c with 6 leaves → all 15 leaf pairs share c
    leaves = [f"v{i}" for i in range(6)]
    df = pd.DataFrame({"a": ["c"] * 6, "b": leaves})
    ds = ray.data.from_pandas(df).repartition(2)
    full = to_table(link_scores(ds)).to_pandas()
    assert len(full) == 15
    k = 3
    got = to_table(link_scores(ds, max_center_fanout=k)).to_pandas()
    kept = sorted(leaves, key=lambda v: (
        hashlib.md5(v.encode()).hexdigest(), v))[:k]
    expect_pairs = {(u, w) for i, u in enumerate(kept)
                    for w in kept[i + 1:]}
    assert {(r.u, r.w) for r in got.itertuples()} == {
        (min(u, w), max(u, w)) for u, w in expect_pairs}
    # surviving pairs keep bit-identical scores (full-degree AA/Jaccard)
    m = full.merge(got, on=["u", "w"], suffixes=("_f", "_g"))
    assert len(m) == len(got)
    assert (m["aa_f"] == m["aa_g"]).all()
    assert (m["jaccard_f"] == m["jaccard_g"]).all()


def test_import_gated_codecs_fallback_parity():
    """AnyImageResizer / AnyAudioDecoder (round 5): with Pillow /
    soundfile absent they fall back to the stdlib P5 / wave parsers and
    must be value-identical to the oracle-checked PgmResizer /
    WavDecoder; with the libs present the same payloads exercise the
    real codec branch (Pillow reads PGM) and the assertion is the same.
    The Pillow branch's dispatch is additionally exercised via a stub
    module so the gate itself is covered either way."""
    import io
    import struct
    import sys
    import types
    import wave as wave_mod

    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyrdf2vec_ray.ops.multimodal import (
        AnyAudioDecoder,
        AnyImageResizer,
        PgmResizer,
        WavDecoder,
        any_images_resized,
        pgm_resized,
    )

    # planted PGM payloads
    payloads = []
    for did in range(6):
        w, h = 20 + (did % 4) * 10, 16 + (did % 3) * 8
        y, x = np.mgrid[0:h, 0:w]
        img = ((x * 7 + y * 13 + did) % 256).astype(np.uint8)
        payloads.append({"doc_id": did,
                         "payload": b"P5\n%d %d\n255\n" % (w, h)
                                    + img.tobytes()})
    ds = ray.data.from_items(payloads).map_batches(
        lambda b: pa.table({"doc_id": pa.array(b["doc_id"], pa.int64()),
                            "payload": pa.array(b["payload"], pa.binary())}),
        batch_format="pandas")
    base = pgm_resized(ds, 8, 8).to_pandas().sort_values("doc_id")
    gated = any_images_resized(ds, 8, 8).to_pandas().sort_values("doc_id")
    assert base.reset_index(drop=True).equals(gated.reset_index(drop=True))

    # WAV payloads: gated audio decoder == oracle-checked WavDecoder
    def wav_bytes(freq, n, sr=8000):
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            t = np.arange(n)
            s = (3000 * np.sign(np.sin(2 * np.pi * freq * t / sr))
                 ).astype("<i2")
            w.writeframes(s.tobytes())
        return buf.getvalue()

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "payload": pa.array([wav_bytes(440, 800),
                                           wav_bytes(200, 640)],
                                          pa.binary())})
    a = WavDecoder()(batch).to_pandas()
    b = AnyAudioDecoder()(batch).to_pandas()
    assert a.equals(b)

    # cover the Pillow dispatch branch with a stub module (real Pillow,
    # when installed, takes this same path)
    class _FakeImg:
        def __init__(self, arr):
            self._a = arr

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None):
            return self._a

    fake = types.ModuleType("PIL.Image")
    fake.open = lambda fp: _FakeImg(
        PgmResizer._parse_p5(fp.getvalue()))
    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = fake
    sys.modules["PIL"] = pil_pkg
    sys.modules["PIL.Image"] = fake
    try:
        r = AnyImageResizer(8, 8)
        assert r.backend == "pillow"
        one = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "payload": pa.array([payloads[0]["payload"]],
                                            pa.binary())})
        via_pil = r(one).to_pandas()
        via_pgm = PgmResizer(8, 8)(one).to_pandas()
        assert via_pil.equals(via_pgm)
    finally:
        del sys.modules["PIL"], sys.modules["PIL.Image"]


# ---- duplicate_spans --------------------------------------------------------


def test_duplicate_spans_cross_doc_only():
    from pyrdf2vec_ray.ops.dedup import duplicate_spans

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta",      # spans: "alpha beta", "beta gamma", "gamma delta"
            "zzz alpha beta yyy",          # shares "alpha beta" with doc 1
            "solo solo solo",              # within-doc repeat only: NOT duplicated
            "",                            # no tokens -> 0 spans
        ]})
    out = (duplicate_spans(ray.data.from_pandas(docs), span_tokens=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["n_spans"].tolist() == [3, 3, 2, 0]
    # only "alpha beta" crosses documents; doc 3's "solo solo" repeats
    # twice inside ONE doc and counts zero
    assert out["dup_spans"].tolist() == [1, 1, 0, 0]


def test_duplicate_spans_counts_every_position():
    from pyrdf2vec_ray.ops.dedup import duplicate_spans

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x y x y x",   # "x y": pos 0 and 2; "y x": pos 1 and 3
                 "x y"]})
    out = (duplicate_spans(ray.data.from_pandas(docs), span_tokens=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 1 has 4 spans; "x y" occurs in doc 2 too, so BOTH of doc 1's
    # "x y" positions count; its two "y x" spans stay single-doc
    assert out["n_spans"].tolist() == [4, 1]
    assert out["dup_spans"].tolist() == [2, 1]


def test_duplicate_spans_tokenizer_is_lowercase_alpha():
    from pyrdf2vec_ray.ops.dedup import duplicate_spans

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Alpha, BETA!", "alpha beta 42"]})
    out = (duplicate_spans(ray.data.from_pandas(docs), span_tokens=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # punctuation/digits are not tokens: both docs reduce to
    # ["alpha","beta"] -> the single span matches cross-doc
    assert out["n_spans"].tolist() == [1, 1]
    assert out["dup_spans"].tolist() == [1, 1]


# ---- fault tolerance ---------------------------------------------------------


def test_transient_task_failure_retried_transparently(tmp_path):
    """A map task that fails ONCE (first attempt) must be retried by
    Ray Data with `retry_exceptions` and produce the same result as a
    clean run — the single-node stand-in for the lost-worker case on a
    real cluster (lineage re-executes the lost block; the engine's
    stages are deterministic, so the retried block is bit-identical).
    Partition-level resume for coarser failures is covered by the
    checkpoint tests."""
    import os

    marker = str(tmp_path / "boom_once")

    def flaky(batch: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            raise RuntimeError("injected one-shot failure")
        return batch

    out = (ray.data.range(1000)
           .map_batches(flaky, batch_format="pandas", batch_size=100,
                        retry_exceptions=True)
           .take_all())
    assert sorted(r["id"] for r in out) == list(range(1000))
    assert os.path.exists(marker)  # the failure really fired
