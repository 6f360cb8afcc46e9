"""The LLM training-data curation pipeline end to end — the operators a
100-TB corpus runs between raw documents and the trainer, composed:

  docs → exact dedup → benchmark decontamination (exact + 8-gram,
         Bloom-prefiltered)
       → quality / repetition / bigram-LM filtering
       → per-language length normalization (z-score) + top-k audit
       → deterministic train/val/test splits (splitmix64, shuffle-free)
       → per-language mixture down-sampling + ECDF length filter
       → sequence packing (distributed prefix sum)
       → weighted source interleave (WFQ schedule) as the training order

Everything is reproducible under re-partitioning/resume (pure per-row
hashes, no RNG streams).  Run: PYTHONPATH=.. python curation.py
"""

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

import pandas as pd                                               # noqa: E402
import ray.data                                                   # noqa: E402

from pyrdf2vec_ray.ops.agg import ecdf_by_group                   # noqa: E402
from pyrdf2vec_ray.ops.curate import (                            # noqa: E402
    assign_splits,
    decontaminate,
    decontaminate_ngram,
    interleave_sources,
    pack_sequences,
    sample_by_hash,
    shuffle_order,
)
from pyrdf2vec_ray.ops.agg import topk_by_group, zscore_by_group  # noqa: E402
from pyrdf2vec_ray.ops.dedup import exact_dedup                   # noqa: E402
from pyrdf2vec_ray.ops.sketch import bloom_contains, bloom_words  # noqa: E402
from pyrdf2vec_ray.ops.text import (                              # noqa: E402
    bigram_lm_scores,
    repetition_stats,
)

SF = "/root/testdata/sf0.001"
docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text", "lang"])

# 1. exact dedup: smallest doc_id per identical text survives
survivors = exact_dedup(docs)
keep_ids = set(survivors.to_pandas()["doc_id"])  # demo-scale collect
docs = docs.map_batches(
    lambda b: b[b["doc_id"].isin(keep_ids)], batch_format="pandas"
)

# 2. decontamination vs a held-out "benchmark" (here: every 20th doc)
bench = docs.map_batches(
    lambda b: b[b["doc_id"] % 20 == 0], batch_format="pandas"
).map_batches(lambda t: t, batch_format="pyarrow")
clean_ids = set(decontaminate_ngram(docs, bench, window=8)
                .to_pandas()["doc_id"])
docs = docs.map_batches(
    lambda b: b[b["doc_id"].isin(clean_ids)], batch_format="pandas"
)

# 3. repetition filter: drop boilerplate-heavy docs
rep = repetition_stats(docs).to_pandas()
good = set(rep[rep["dup_2gram_ratio"] < 0.5]["doc_id"])
docs = docs.map_batches(
    lambda b: b[b["doc_id"].isin(good)], batch_format="pandas"
)

# 3b. bigram-LM gibberish filter: drop docs far below the corpus's
# mean log-prob (fit on the surviving docs themselves)
lm = bigram_lm_scores(docs).to_pandas()
cut = lm["logprob2"].mean() - 3 * lm["logprob2"].std()
fluent = set(lm[lm["logprob2"] >= cut]["doc_id"])
docs = docs.map_batches(
    lambda b: b[b["doc_id"].isin(fluent)], batch_format="pandas"
)

# 3c. audits: Bloom membership probe (zero false negatives) and
# per-language length landscape (z-score + longest docs)
bloom = bloom_words(docs).to_pandas()
probe = docs.take(1)[0]["text"].split()[:3]
assert bloom_contains(bloom, probe).all()  # no false negatives, ever
wide = docs.map_batches(
    lambda b: b.assign(n_chars=b["text"].str.len()), batch_format="pandas"
)
z = zscore_by_group(wide, "lang", "n_chars", id_col="doc_id").to_pandas()
longest = topk_by_group(wide, "lang", "n_chars", 2,
                        id_col="doc_id").to_pandas()

# 4. splits + mixture weighting + packing + training order
splits = assign_splits(docs, seed=7).to_pandas()
sampled = sample_by_hash(
    docs, rates_by="lang",
    rates={"en": 0.9, "de": 0.5, "fr": 0.25, "es": 0.1}, seed=11,
)
# ECDF tail trim: drop each language's shortest 5% of docs
pct = ecdf_by_group(wide, "lang", "n_chars", id_col="doc_id").to_pandas()
long_enough = set(pct[pct["pct_rank"] >= 0.05]["doc_id"])
docs = docs.map_batches(
    lambda b: b[b["doc_id"].isin(long_enough)], batch_format="pandas"
)
packed = pack_sequences(docs, budget=2048).to_pandas()
order = shuffle_order(docs.select_columns(["doc_id"]), seed=13).to_pandas()
# cap each language's contribution at a character budget, then the
# actual training order: weighted mixture schedule by language
from pyrdf2vec_ray.ops.curate import budget_sample  # noqa: E402

capped = budget_sample(
    wide.select_columns(["doc_id", "lang", "n_chars"]),
    budget=5000, group_col="lang", weight_col="n_chars", seed=23,
).to_pandas()
mix = interleave_sources(
    docs.select_columns(["doc_id", "lang"]),
    {"en": 4, "de": 2, "fr": 2, "es": 1, "zh": 1},
    source_col="lang", seed=17,
).to_pandas().sort_values("rank")

print("docs after dedup+decontam+quality+LM:", len(packed))
print("bloom words set:", len(bloom), "| |z|>2 outliers:",
      int((z["zscore"].abs() > 2).sum()))
print("longest per lang:", longest.groupby("lang")["n_chars"].max().to_dict())
print(splits["split"].value_counts().to_dict())
print("sampled rows:", sampled.count())
print("packed sequences:", int(packed["seq_id"].max()) + 1,
      "of 2048 tokens")
print(pd.merge(packed, order, on="doc_id").head(3).to_string())
print("mixture head:", mix.head(8)["lang"].tolist())
print("budget-capped per lang:",
      capped.groupby("lang")["cum"].max().to_dict(), "(<= 5000)")

ray.shutdown()
