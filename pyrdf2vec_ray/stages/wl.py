"""Weisfeiler-Lehman relabeling (reference weisfeiler_lehman.py:69-129).

Vertices of the bipartite graph are entities AND per-triple predicate
instances; label propagation runs through both:

  L0(entity)         = name            L0(pinst(s,p,o)) = p
  Ln(pinst(s,p,o))   = H(L_{n-1}(pinst) + "-" + L_{n-1}(s))
  Ln(entity v)       = H(L_{n-1}(v) + "-" + join(sorted(set(
                           L_{n-1}(pinst) of triples with obj = v))))
  H(x) = str(md5(x).digest()[:md5_bytes])   (or x when md5_bytes is None)

Computed here as k vectorized passes over the CSR edge arrays (pandas
groupby for the sorted-distinct-join).  The distributed formulation is k
rounds of edges⋈labels + groupby(child) (SURVEY.md A9); this
single-task form serves graphs that fit the object store and is itself
run inside one Ray task when used from the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyrdf2vec_ray.state.graph_index import LocalGraph


def _hash_chunk(strings: np.ndarray, md5_bytes: int) -> np.ndarray:
    from hashlib import md5 as _md5

    # list comprehension, not fromiter+genexpr: ~25% less interpreter
    # overhead on the millions-of-distinct-labels iterations
    out = np.empty(len(strings), dtype=object)
    out[:] = [str(_md5(u.encode()).digest()[:md5_bytes]) for u in strings]
    return out


def _on_ray_driver() -> bool:
    """True only on an initialized Ray DRIVER — fanning out from inside
    a Ray task/actor would hold its CPU while waiting (deadlock risk)."""
    try:
        import ray

        if not ray.is_initialized():
            return False
        ctx = ray.get_runtime_context()
        return ctx.get_task_id() is None and ctx.get_actor_id() is None
    except Exception:
        return False


def _hash_distinct_codes(
    strings: np.ndarray, md5_bytes: int | None,
    parallel_threshold: int = 400_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(hashed distinct values, codes) such that hashed[codes] hashes
    each input string, calling md5 only once per DISTINCT value: WL
    labels converge fast, so distinct labels << vertices/edges — this is
    what makes the relabeling vectorized rather than a per-vertex loop.

    pd.factorize (hash-based, object dtype) — NOT np.unique over a
    fixed-width string array: hub vertices produce suffix strings of
    100s of KB, and U-dtype pads every row to the longest one.

    Past `parallel_threshold` distinct labels (late WL iterations on
    big graphs, where pin labels approach edge count) the md5 pass fans
    out over Ray tasks in 16 chunks — A/B: 2.2s serial vs 1.2s for 2M
    labels; below it the ship cost eats the savings, so it stays
    inline.  Fan-out only from the DRIVER (see _on_ray_driver)."""
    codes, uniq = pd.factorize(strings, sort=False)
    if md5_bytes:
        if len(uniq) >= parallel_threshold and _on_ray_driver():
            import ray

            rf = ray.remote(num_cpus=1)(_hash_chunk)
            hashed = np.concatenate(ray.get([
                rf.remote(c, md5_bytes)
                for c in np.array_split(uniq, 16)
            ]))
        else:
            hashed = _hash_chunk(uniq, md5_bytes)
    else:
        hashed = np.asarray(uniq, dtype=object)
    return hashed, codes


def _hash_distinct(
    strings: np.ndarray, md5_bytes: int | None,
    parallel_threshold: int = 400_000,
) -> np.ndarray:
    hashed, codes = _hash_distinct_codes(strings, md5_bytes,
                                         parallel_threshold)
    return hashed[codes]


def wl_labels(
    g: LocalGraph, wl_iterations: int, md5_bytes: int | None = 8
) -> dict[str, list[str]]:
    """name → [label_0, ..., label_k] for every ENTITY vertex."""
    a = g.a
    nv = g.num_vertices
    names = a.names

    subj_per_edge = np.repeat(np.arange(nv), np.diff(a.fwd_indptr))
    obj_per_edge = a.fwd_obj.astype(np.int64)

    ent_labels = names.astype(object).copy()          # L_n(entity), start n=0
    pin_labels = names[a.fwd_pred.astype(np.int64)].astype(object)  # L_n(pinst)

    history: list[np.ndarray] = [ent_labels.copy()]

    pin_uniq = pin_codes = None  # carried from the previous _hash_distinct
    for _ in range(wl_iterations):
        # entity suffix: sorted distinct pinst labels of incoming triples.
        # factorize(sort=True) assigns label codes in lexicographic order,
        # so one int64 unique over (obj * L + code) yields the per-object
        # DISTINCT labels already sorted — no pandas lexsort/groupby pass.
        #
        # From iteration 2 on, the previous pin hashing pass already
        # factorized this exact array — re-sorting its DISTINCT values
        # (≤ distinct labels, often << edges) and rank-remapping the
        # carried codes replaces a full edge-count factorize.  md5 labels
        # are short ASCII reprs, so the sort runs on a fixed-width copy
        # (C comparisons); identical order to the object sort.  Falls
        # back to factorize if truncated-digest collisions made two code
        # slots share one label (fresh factorize would merge them).
        if pin_codes is not None:
            sortable = pin_uniq.astype(np.str_) if md5_bytes else pin_uniq
            order = np.argsort(sortable, kind="stable")
            srt = pin_uniq[order]
            if len(srt) > 1 and (srt[1:] == srt[:-1]).any():
                pin_codes = None      # digest collision: merge via factorize
            else:
                rank = np.empty(len(order), dtype=np.int64)
                rank[order] = np.arange(len(order))
                lab_codes, lab_uniq = rank[pin_codes], srt
        if pin_codes is None:
            lab_codes, lab_uniq = pd.factorize(pin_labels, sort=True)
        L = max(1, len(lab_uniq))
        # packing bound: nv * L must fit int64 (nv≈2e5, L≈2e6 at sf0.1 →
        # 4e11; revisit packing for graphs past ~1e9 distinct labels)
        key = obj_per_edge * L + lab_codes
        uk = np.unique(key)
        objs_u = uk // L
        labs_u = uk % L
        starts = np.flatnonzero(np.r_[True, objs_u[1:] != objs_u[:-1]])
        ends = np.r_[starts[1:], len(uk)]
        lab_uniq_obj = np.asarray(lab_uniq, dtype=object)
        suffix_full = np.full(nv, "", dtype=object)
        for s, e in zip(starts, ends):
            suffix_full[objs_u[s]] = "-".join(lab_uniq_obj[labs_u[s:e]])

        # vectorized concat (C-level object add) + distinct-only hashing
        new_ent = _hash_distinct(ent_labels + "-" + suffix_full, md5_bytes)
        pin_uniq, pin_codes = _hash_distinct_codes(
            pin_labels + "-" + ent_labels[subj_per_edge], md5_bytes
        )
        ent_labels, pin_labels = new_ent, pin_uniq[pin_codes]
        history.append(ent_labels.copy())

    entity_ids = np.flatnonzero(a.is_entity)
    return {
        str(names[v]): [str(h[v]) for h in history] for v in entity_ids
    }


def wl_labels_from_dataset(
    triples_ds, wl_iterations: int, md5_bytes: int | None = 8,
    num_buckets: int | None = None,
) -> dict[str, list[str]]:
    """WL labels computed from the triples DATASET — the SURVEY A9
    join-rounds formulation backing the sharded graph (no CSR, the
    per-triple state NEVER lands on the driver).

    Round 5 shape (TWO exchanges total, independent of wl_iterations;
    rounds 3-4 paid one suffix shuffle per iteration):
      0. FUSED round: every triple emits (name=obj, pin=pred) and a
         (name=subj, pin=SENTINEL) presence row; ONE obj/name-keyed
         bucket shuffle yields per-name suffix_0 (sorted-distinct real
         pins) AND the complete entity name set (vocabulary-scale
         collect) — E_0 = names, E_1 = H(E_0 + "-" + suffix_0).
      1. T = per-triple (subj, obj, pin=H(pred + "-" + subj)) is
         bucket-partitioned by hash(obj) ONCE — the suffix key never
         changes across iterations, so later rounds need NO exchange:
      Then per remaining iteration, over the obj-bucketed T:
      a. suffix(obj) = block-local groupby (every row of an obj lives
         in one block) + a vocabulary-scale collect; a driver-side
         merge re-splits the few objs a block split may straddle
         (loop-round pins are md5 hex, so '-' rejoin is unambiguous);
      b. T' = map_batches: pin ← H(pin + "-" + E[subj]) via the
         broadcast E (a lookup join, no shuffle, block-preserving);
      c. E' = H(E + "-" + suffix) driver-side (vocabulary-scale).

    The returned name → [label_0..k] map is byte-identical to
    ``wl_labels`` over the broadcast CSR (pinned by tests)."""
    import pyarrow as pa

    import ray
    import ray.data

    from pyrdf2vec_ray.shuffle import bucket_apply
    from pyrdf2vec_ray.util import to_table

    if num_buckets is None:
        # size buckets by DATA VOLUME (~85k triple rows each), not CPU
        # count: the per-iteration shuffles are overhead-bound when rows
        # per bucket get small (measured 48.8s @ 32 buckets vs 26.1s @ 16
        # on 1.36M rows); count() on the parquet-backed triples Dataset
        # is metadata-only
        try:
            num_buckets = max(4, min(256, triples_ds.count() // 85_000 + 1))
        except Exception:
            num_buckets = None

    SENT = "\x00"   # engine strings never contain NUL

    # FUSED iteration 0: one exchange produces BOTH the entity name
    # set (every subj/obj, sentinel presence rows) and suffix_0
    def fused_rows(batch: pa.Table) -> pa.Table:
        subj = batch["subj"].combine_chunks().cast(pa.string())
        obj = batch["obj"].combine_chunks().cast(pa.string())
        pred = batch["pred"].combine_chunks().cast(pa.string())
        n = len(subj)
        return pa.table({
            "obj": pa.concat_arrays([obj, subj]),
            "pin": pa.concat_arrays(
                [pred, pa.array([SENT] * n, pa.string())]),
        })

    def pre_dedup(batch: pa.Table) -> pa.Table:
        # per-batch (obj, pin) distinct combiner: early iterations'
        # pin labels are low-cardinality (iteration 0 = predicates),
        # so the suffix shuffle moves a fraction of the triple rows
        return (batch.select(["obj", "pin"])
                .group_by(["obj", "pin"]).aggregate([]))

    def fused_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        real = g[g["pin"] != SENT].sort_values(["obj", "pin"])
        # pandas returns a SERIES from an empty SeriesGroupBy.agg — a
        # bucket can legitimately hold only sentinel presence rows
        # (subjects that never appear as an object)
        if real.empty:
            suf = pd.DataFrame({"obj": pd.Series(dtype=object),
                                "suffix": pd.Series(dtype=object)})
        else:
            suf = (real.groupby("obj", as_index=False)["pin"]
                       .agg("-".join)
                       .rename(columns={"pin": "suffix"}))
        names = pd.DataFrame({"obj": g["obj"].drop_duplicates()})
        out = names.merge(suf, on="obj", how="left")
        out["suffix"] = out["suffix"].fillna("")
        return out

    f0 = to_table(bucket_apply(
        triples_ds.map_batches(fused_rows, batch_format="pyarrow"),
        ["obj"], fused_bucket, num_buckets=num_buckets,
        batch_format="pandas", pre=pre_dedup,
    ))
    raw_names = np.asarray(f0["obj"].to_numpy(zero_copy_only=False))
    order = np.argsort(raw_names.astype(np.str_), kind="stable")
    ent_names = raw_names[order].astype(np.str_)
    suffix0 = np.asarray(
        f0["suffix"].to_numpy(zero_copy_only=False), dtype=object
    )[order]

    ent_lab = ent_names.astype(object).copy()
    history = [ent_lab.copy()]
    if wl_iterations == 0:
        return {str(n): [str(ent_lab[i])]
                for i, n in enumerate(ent_names)}

    # T_1: per-triple pin label = H(pred + "-" + E_0[subj]); E_0 is the
    # identity labeling, so no broadcast pull is needed yet
    def pin1(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["subj", "obj", "pred"]].copy()
        batch["pin"] = _hash_distinct(
            batch["pred"].to_numpy(dtype=object) + "-"
            + batch["subj"].to_numpy(dtype=object), md5_bytes)
        return batch[["subj", "obj", "pin"]]

    # Tagged-union layout: every materialized T generation carries BOTH
    # the per-triple rows (kind=0: subj/obj/pin) AND the block-local
    # suffix rows the NEXT driver step consumes (kind=1: obj/suffix) —
    # so each iteration is ONE edge-scale pass (update pins + group
    # suffixes, fused) plus a zero-copy Arrow filter for the
    # vocabulary-scale suffix collect, instead of separate suffix and
    # update jobs over the full T.
    COLS = ["subj", "obj", "pin", "suffix", "kind"]

    def _suffix_rows(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:  # empty SeriesGroupBy.agg returns a Series
            return pd.DataFrame({"obj": pd.Series(dtype=object),
                                 "suffix": pd.Series(dtype=object)})
        s = g[["obj", "pin"]].drop_duplicates().sort_values(["obj", "pin"])
        return (s.groupby("obj", as_index=False)["pin"].agg("-".join)
                 .rename(columns={"pin": "suffix"}))

    def _tagged(t_rows: pd.DataFrame) -> pd.DataFrame:
        suf = _suffix_rows(t_rows)
        t = t_rows[["subj", "obj", "pin"]].copy()
        t["suffix"] = ""
        t["kind"] = np.int8(0)
        s = pd.DataFrame({"subj": "", "obj": suf["obj"].to_numpy(),
                          "pin": "",
                          "suffix": suf["suffix"].to_numpy(),
                          "kind": np.int8(1)})
        return pd.concat([t[COLS], s[COLS]], ignore_index=True)

    T = None
    if wl_iterations > 1:
        # bucket by hash(obj) ONCE (the only loop exchange): after this
        # every row of an obj sits in one block, so each iteration's
        # suffix groupby is block-local; the bucket kernel already
        # emits iteration 1's suffix rows
        T = bucket_apply(
            triples_ds.map_batches(pin1, batch_format="pandas"),
            ["obj"], _tagged, num_buckets=num_buckets,
            batch_format="pandas",
        ).materialize()

    ent_lab = _hash_distinct(ent_lab + "-" + suffix0, md5_bytes)
    history.append(ent_lab.copy())

    def take_suffix(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc
        return (batch.filter(pc.equal(batch["kind"], 1))
                .select(["obj", "suffix"]))

    for it in range(1, wl_iterations):
        # a. suffix per obj: zero-copy filter of the tagged rows the
        # previous edge-scale pass already grouped — NO exchange
        suf = to_table(T.map_batches(take_suffix, batch_format="pyarrow"))
        suf_obj = np.asarray(suf["obj"].to_numpy(zero_copy_only=False))
        suf_val = np.asarray(
            suf["suffix"].to_numpy(zero_copy_only=False), dtype=object)
        # merge partials for objs a block split straddled (rare; loop
        # pins are md5 hex so '-' resplit is exact)
        if len(np.unique(suf_obj)) != len(suf_obj):
            frame = pd.DataFrame({"obj": suf_obj, "suffix": suf_val})
            frame = frame.groupby("obj", as_index=False)["suffix"].agg(
                lambda parts: "-".join(
                    sorted(set(p for s in parts for p in s.split("-")))))
            suf_obj = frame["obj"].to_numpy()
            suf_val = frame["suffix"].to_numpy(dtype=object)
        suffix = np.full(len(ent_names), "", dtype=object)
        pos = np.searchsorted(ent_names, suf_obj)
        suffix[pos] = suf_val

        # 2. pin update via the broadcast entity labels (lookup join)
        # FUSED with the next round's suffix grouping; E_{n-1} = the
        # level the NEXT round's pins need.  Skipped on the final round
        # — no later suffix consumes it.
        if it + 1 < wl_iterations:
            lab_ref = ray.put((ent_names, history[-1]))

            def update_and_group(batch: pd.DataFrame,
                                 lab_ref=lab_ref) -> pd.DataFrame:
                names, labs = ray.get(lab_ref)
                t = batch[batch["kind"] == 0][["subj", "obj", "pin"]]
                subj_lab = labs[
                    np.searchsorted(names, t["subj"].to_numpy())]
                t = t.copy()
                t["pin"] = _hash_distinct(
                    t["pin"].to_numpy(dtype=object) + "-" + subj_lab,
                    md5_bytes)
                return _tagged(t)

            T = T.map_batches(update_and_group, batch_size=None,
                              batch_format="pandas").materialize()

        # 3. new entity labels (vocabulary-scale, driver-side)
        ent_lab = _hash_distinct(ent_lab + "-" + suffix, md5_bytes)
        history.append(ent_lab.copy())

    return {
        str(name): [str(h[i]) for h in history]
        for i, name in enumerate(ent_names)
    }
