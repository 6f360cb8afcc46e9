"""The round-5 continuation surfaces in one script: KG cleanup
(sameAs canonicalization + conflict resolution), data-governance
audits (k-anonymity, FK orphans), the model-eval family (AUC / PR /
calibration, per-cohort), and perceptual image dedup over really-
decoded payloads.  Run: PYTHONPATH=.. python governance_eval.py
"""
import numpy as np
import pandas as pd

import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

# --- KG cleanup: alias chains collapse, conflicting facts resolve ---------
from pyrdf2vec_ray.ops.agg import grouped_mode
from pyrdf2vec_ray.ops.er import sameas_canonicalize

dirty = ray.data.from_items([
    {"subj": "acme", "pred": "hq_in", "obj": "berlin"},
    {"subj": "acme_gmbh", "pred": "hq_in", "obj": "berlin"},
    {"subj": "acme_gmbh", "pred": "owl:sameAs", "obj": "acme"},
    {"subj": "w", "pred": "supplier_of", "obj": "acme_gmbh"},
])
clean = sameas_canonicalize(dirty).to_pandas()
print("canonicalized KG:\n", clean.to_string(index=False))

votes = ray.data.from_items(
    [{"subj": "acme", "obj": "berlin"}] * 2
    + [{"subj": "acme", "obj": "munich"}])
print("conflict resolution:\n",
      grouped_mode(votes, "subj", "obj").to_pandas().to_string(index=False))

# --- governance: k-anonymity over quasi-identifiers -----------------------
from pyrdf2vec_ray.ops.validate import k_anonymity

people = ray.data.from_items(
    [{"zip": 10115, "age_band": "30s"}] * 6
    + [{"zip": 10115, "age_band": "40s"}] * 2)
risk = k_anonymity(people, ["zip", "age_band"], k=5).to_pandas()
print("k-anonymity risk groups (k=5):\n", risk.to_string(index=False))

# --- eval family: AUC / PR / calibration ----------------------------------
from pyrdf2vec_ray.ops.agg import auc_exact, calibration_bins, pr_curve

rng = np.random.RandomState(0)
scores = rng.randint(0, 20, 400)
labels = (rng.rand(400) < 1 / (1 + np.exp(6 - 0.7 * scores))).astype(int)
preds = ray.data.from_items(
    [{"s": int(a), "y": int(b)} for a, b in zip(scores, labels)])
print("auc:", auc_exact(preds, "s", "y").to_pandas().to_string(index=False))
print("pr head:\n",
      pr_curve(preds, "s", "y").to_pandas().head(4).to_string(index=False))
print("calibration:\n",
      calibration_bins(preds, "s", "y", n_bins=4).to_pandas()
      .to_string(index=False))

# --- multimodal: perceptual dedup of decoded images -----------------------
from pyrdf2vec_ray.ops.multimodal import image_dup_pairs


def pgm(w, h, fn):
    y, x = np.mgrid[0:h, 0:w]
    return b"P5\n%d %d\n255\n" % (w, h) + fn(x, y).astype(np.uint8).tobytes()


imgs = ray.data.from_items([
    {"doc_id": 1, "payload": pgm(8, 8, lambda x, y: (x >= 4) * 255)},
    {"doc_id": 2, "payload": pgm(16, 16, lambda x, y: (x >= 8) * 255)},
    {"doc_id": 3, "payload": pgm(8, 8, lambda x, y: (y >= 4) * 255)},
])
print("perceptual dup pairs:\n",
      image_dup_pairs(imgs, concurrency=1).to_pandas()
      .to_string(index=False))

ray.shutdown()
