"""Session-3 batch-4 families: RRF fusion, Gini concentration,
windowed funnel. Oracle gates pin full outputs; these pin the
distributed-rank machinery and the closed-form identities."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational9 import (
    FUNNEL_WINDOW_US, q_funnel_windowed, q_gini_user_activity,
    q_rrf_fusion)
from vbpl_web_crawl_ray.pipelines.relational7 import q_funnel_conversion


def test_rrf_ranks_are_exact_row_numbers(sf_dir):
    """The histogram-offset ranking equals a literal global argsort
    ROW_NUMBER on both keys, for every doc in the fused top-20."""
    out = q_rrf_fusion(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])
    docs["n_toks"] = docs["text"].str.split(" ").map(
        lambda t: len(set(t)))

    def rownum(df, key):
        d = df.sort_values([key, "doc_id"],
                           ascending=[False, True]).reset_index(drop=True)
        return dict(zip(d["doc_id"], d.index + 1))

    rc, rt = rownum(docs, "n_chars"), rownum(docs, "n_toks")
    for _, r in out.iterrows():
        assert r["rank_chars"] == rc[r["doc_id"]]
        assert r["rank_toks"] == rt[r["doc_id"]]
    assert len(out) == 20
    # scores non-increasing with doc_id breaking exact ties
    s = out["rrf_score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_gini_closed_form_equals_rank_sum(sf_dir):
    """The per-tie-block closed form x*f*(2o+f-n) equals the literal
    sorted-rank sum, and the result sits in [0, 1)."""
    out = q_gini_user_activity(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    x = np.sort(ev["user_id"].value_counts().to_numpy(np.int64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    numer = int(((2 * i - n - 1) * x).sum())
    assert out.loc[0, "gini_numer"] == numer
    assert out.loc[0, "n_users"] == n
    assert out.loc[0, "total_events"] == int(x.sum())
    assert 0.0 <= out.loc[0, "gini"] < 1.0


def test_windowed_funnel_bounded_by_unwindowed(sf_dir):
    """Adding the 72h window can only shrink stages 2 and 3, and the
    window boundary is inclusive (an exactly-72h conversion counts)."""
    w = q_funnel_windowed(sf_dir)["n_users"].to_numpy()
    u = q_funnel_conversion(sf_dir)["n_users"].to_numpy()
    assert w[0] == u[0]                      # stage 1 has no window
    assert w[1] <= u[1] and w[2] <= u[2]
    assert (w[:-1] >= w[1:]).all()
    assert FUNNEL_WINDOW_US == 72 * 3600 * 1_000_000
