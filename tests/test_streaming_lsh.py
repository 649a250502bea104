"""LSH-bucketed near-dup recall and actor-held streaming state."""

import numpy as np
import pandas as pd
import ray.data as rd

from vbpl_web_crawl_ray.stages import ann, dedup
from vbpl_web_crawl_ray.stages.streaming import run_stream


def test_embedding_near_dup_lsh_recall(sf_dir):
    exact = dedup.embedding_near_dup_pairs(sf_dir, threshold=0.45)
    approx = ann.embedding_near_dup_lsh(sf_dir, threshold=0.45)
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    approx_set = set(zip(approx["id_a"], approx["id_b"]))
    # verification makes precision exact; LSH recall must be high
    assert approx_set <= exact_set
    if exact_set:
        recall = len(approx_set & exact_set) / len(exact_set)
        assert recall >= 0.8, (recall, len(exact_set))


def test_ivf_topk_recall(sf_dir):
    exact = ann.brute_force_topk(sf_dir, query_vec_id=0, k=10)
    approx = ann.ivf_topk(sf_dir, query_vec_id=0, k=10, nprobe=6)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 7  # >=70% recall at nprobe=6/16 cells


def test_stream_state_matches_batch(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    got = run_stream(ds, num_buckets=3, alpha=0.2)
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"])
    pdf = pdf.sort_values(["ts", "event_id"])
    want_n = pdf.groupby("user_id")["value"].size()
    want_sum = pdf.groupby("user_id")["value"].sum()

    def ema(vals, a=0.2):
        e = None
        for v in vals:
            e = v if e is None else a * v + (1 - a) * e
        return e

    want_ema = pdf.groupby("user_id")["value"].agg(ema)
    got = got.set_index("user_id")
    assert (got["n"] == want_n).all()
    assert np.allclose(got["total"], want_sum)
    assert np.allclose(got["ema"], want_ema)


def test_stream_incremental_across_feeds(sf_dir):
    """State carries across successive datasets (the incremental claim)."""
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"])
    pdf = pdf.sort_values(["ts", "event_id"])
    half = len(pdf) // 2
    import ray
    from vbpl_web_crawl_ray.stages.streaming import StreamBucket
    a = StreamBucket.remote(0.2)
    ray.get(a.feed.remote(pdf.iloc[:half]))
    ray.get(a.feed.remote(pdf.iloc[half:]))
    got = ray.get(a.snapshot.remote()).set_index("user_id").sort_index()
    want = pdf.groupby("user_id")["value"].size().sort_index()
    assert got["n"].to_numpy().tolist() == want.to_numpy().tolist()
