"""Session-3 batch-6 families: Lorenz deciles, market-basket lift."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational9 import q_gini_user_activity
from vbpl_web_crawl_ray.pipelines.relational11 import (
    q_lorenz_decile_shares, q_session_cooccurrence_lift)
from vbpl_web_crawl_ray.pipelines.relational7 import GAP_US


def test_lorenz_reconciles_and_is_convex(sf_dir):
    """Deciles cover every user and event; ascending-activity ordering
    makes per-decile mean activity non-decreasing (the Lorenz convexity
    that makes the curve a curve); shares sum to 1."""
    out = q_lorenz_decile_shares(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    assert out["n_users"].sum() == ev["user_id"].nunique()
    assert out["n_events"].sum() == len(ev)
    assert abs(out["event_share"].sum() - 1.0) < 1e-12
    mean = out["n_events"] / out["n_users"]
    assert (mean.diff().dropna() >= 0).all()


def test_lorenz_agrees_with_gini_direction(sf_dir):
    """Cross-family sanity: the Gini computed from the same counts is
    positive iff the top decile's PER-CAPITA activity exceeds the
    bottom's (raw decile shares can't be compared — rank cuts of a
    non-multiple-of-10 population make decile sizes uneven)."""
    lz = q_lorenz_decile_shares(sf_dir)
    gini = q_gini_user_activity(sf_dir).loc[0, "gini"]
    mean = lz["n_events"] / lz["n_users"]
    top = mean.iloc[lz["decile"].idxmax()]
    bot = mean.iloc[lz["decile"].idxmin()]
    assert (gini > 0) == (top > bot)


def test_lift_reconciles_with_brute_sessionize(sf_dir):
    """A driver-side sessionization reproduces every pair's co-session
    count and the base-rate counts."""
    out = q_session_cooccurrence_lift(sf_dir)
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("int64").to_numpy()
    u = ev["user_id"].to_numpy(np.int64)
    new = np.ones(len(ev), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP_US)
    st = pd.DataFrame({"sid": np.cumsum(new),
                       "e": ev["event_type"].to_numpy(object)}) \
        .drop_duplicates()
    s_total = st["sid"].nunique()
    singles = st.groupby("e")["sid"].nunique()
    pairs = st.merge(st, on="sid")
    pairs = pairs[pairs["e_x"] < pairs["e_y"]]
    want = pairs.groupby(["e_x", "e_y"])["sid"].size()
    for _, r in out.iterrows():
        assert r["n_co"] == want[(r["type_a"], r["type_b"])]
        assert r["n_a"] == singles[r["type_a"]]
        assert r["n_b"] == singles[r["type_b"]]
        expect = (r["n_co"] * s_total) / (r["n_a"] * r["n_b"])
        assert r["lift"] == expect
    assert len(out) == len(want)             # every co-occurring pair
    assert (out["lift"] > 0).all()
