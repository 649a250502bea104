"""Session-3 batch-5 families: weighted reservoir sampling, exact time
decay. Oracle gates pin full outputs; these pin the sampling bias and
the exact-arithmetic identities."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.functions.hashing import md5_hash64
from vbpl_web_crawl_ray.pipelines.relational10 import (
    DECAY_MAX_AGE_DAYS, SAMPLE_K, q_time_decayed_value,
    q_weighted_reservoir_sample)


def test_reservoir_matches_global_priority_order(sf_dir):
    """The per-batch local-k merge equals the literal global k smallest
    priorities (the same containment argument as the KMV sketch)."""
    out = q_weighted_reservoir_sample(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    h = md5_hash64([str(i) for i in docs["doc_id"]]).astype(np.float64)
    prio = h / docs["n_chars"].to_numpy(np.int64)
    order = np.lexsort((docs["doc_id"].to_numpy(np.int64), prio))
    want = docs["doc_id"].to_numpy(np.int64)[order][:SAMPLE_K]
    assert out["doc_id"].tolist() == want.tolist()
    assert len(out) == SAMPLE_K


def test_reservoir_is_weight_biased():
    """Sanity of the A-Res shape: over many synthetic draws, items with
    10x weight are sampled ~10x as often (ratio within a loose band) —
    the property hash/weight priorities exist to deliver."""
    n = 4000
    ids = np.arange(n)
    w = np.where(ids % 2 == 0, 10.0, 1.0)
    picks = np.zeros(2)
    # vary the id space to simulate independent draws
    for trial in range(40):
        h = md5_hash64([f"{trial}:{i}" for i in ids]).astype(np.float64)
        prio = h / w
        top = np.argsort(prio)[:200]
        picks[0] += (top % 2 == 0).sum()
        picks[1] += (top % 2 == 1).sum()
    ratio = picks[0] / picks[1]
    assert 6.0 < ratio < 16.0


def test_decay_numer_is_exact_and_bounded(sf_dir):
    """decay_numer equals the literal per-row bigint sum, and
    decayed_value <= plain value sum (decay only shrinks)."""
    out = q_time_decayed_value(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    anchor = pd.Timestamp("2024-02-01").value // 1000
    t = ev["ts"].astype("int64").to_numpy()
    age = np.minimum((anchor - t) // 86_400_000_000,
                     DECAY_MAX_AGE_DAYS).astype(np.int64)
    cents = np.round(ev["value"].to_numpy(np.float64) * 100) \
        .astype(np.int64)
    ev2 = pd.DataFrame({"e": ev["event_type"], "age": age, "c": cents})
    for _, r in out.iterrows():
        g = ev2[ev2["e"] == r["event_type"]]
        num = sum(int(c) << int(DECAY_MAX_AGE_DAYS - a)
                  for a, c in zip(g["age"], g["c"]))
        assert int(r["decay_numer"]) == num
        assert 0.0 < r["decayed_value"] <= g["c"].sum() / 100.0
