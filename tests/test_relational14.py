"""Session-3 batch-9 families: lag-1 autocorrelation, mix drift."""

import math

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational14 import (
    SPLIT_TS, q_daily_autocorr, q_type_mix_drift)


def test_autocorr_moments_match_dense_series(sf_dir):
    """Driver-side dense reconstruction reproduces every type's integer
    moments, and |r| <= 1."""
    out = q_daily_autocorr(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    day = ev["ts"].astype("int64") // 86_400_000_000
    for _, r in out.iterrows():
        days = day[ev["event_type"] == r["event_type"]]
        vc = days.value_counts().sort_index()
        lo, hi = int(vc.index.min()), int(vc.index.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[vc.index.to_numpy() - lo] = vc.to_numpy()
        x, y = dense[:-1], dense[1:]
        n = len(x)
        assert r["n_pairs"] == n
        assert r["cov_num"] == n * int((x * y).sum()) \
            - int(x.sum()) * int(y.sum())
        assert abs(r["lag1_r"]) <= 1.0
        if r["var1_num"] > 0 and r["var2_num"] > 0:
            want = r["cov_num"] / math.sqrt(
                float(int(r["var1_num"]) * int(r["var2_num"])))
            assert r["lag1_r"] == want


def test_drift_bounds_and_identity(sf_dir):
    """0 <= L1 <= 2 on real data; identical mixes give exactly 0 and
    disjoint mixes exactly 2 (closed-form sanity on synthetic cells)."""
    out = q_type_mix_drift(sf_dir)
    assert 0.0 <= out.loc[0, "l1_drift"] <= 2.0
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    split = pd.Timestamp(SPLIT_TS).value // 1000
    t = ev["ts"].astype("int64")
    assert out.loc[0, "n_first"] == int((t < split).sum())
    assert out.loc[0, "n_second"] == int((t >= split).sum())

    def l1(c1, c2):
        n1, n2 = sum(c1), sum(c2)
        return sum(abs(a * n2 - b * n1) for a, b in zip(c1, c2)) \
            / (n1 * n2)

    assert l1([10, 20], [30, 60]) == 0.0     # identical mixes
    assert l1([10, 0], [0, 99]) == 2.0       # disjoint mixes