"""Session-3 batch-8 families: source vocab overlap, join fanout."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational13 import (
    q_join_fanout_histogram, q_source_vocab_overlap)


def test_vocab_overlap_matches_set_algebra(sf_dir):
    """Driver-side set algebra over the raw corpus reproduces every
    pair's intersection/union, and Jaccard is inter/union exactly."""
    out = q_source_vocab_overlap(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    vocab = {}
    for s, g in docs.groupby("source"):
        vocab[s] = set(w for t in g["text"] for w in t.split(" "))
    for _, r in out.iterrows():
        a, b = vocab[r["source_a"]], vocab[r["source_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_inter"] == len(a & b)
        assert r["n_union"] == len(a | b)
        assert r["jaccard"] == r["n_inter"] / r["n_union"]
    n_src = docs["source"].nunique()
    assert len(out) == n_src * (n_src - 1) // 2


def test_fanout_histogram_reconciles(sf_dir):
    """Histogram keys sum to |orders|, and the weighted sum equals
    |lineitem| (every lineitem lands in exactly one key's fanout)."""
    out = q_join_fanout_histogram(sf_dir)
    n_orders = len(pd.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"]))
    n_lines = len(pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                                  columns=["l_orderkey"]))
    assert out["n_keys"].sum() == n_orders
    assert int((out["fanout"] * out["n_keys"]).sum()) == n_lines
    assert (out["fanout"] >= 0).all()
