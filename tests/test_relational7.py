"""Session-3 batch-2 families: funnel, conjunctive search, Z-order
layout, session paths. Oracle gates pin full outputs; this module pins
the structural properties the SQL twins cannot state."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational7 import (
    GAP_US, SEARCH_TERMS, morton_interleave, morton_sql_expr,
    q_conjunctive_token_search, q_funnel_conversion, q_session_paths,
    q_zorder_layout_stats)


def test_funnel_is_monotone(sf_dir):
    out = q_funnel_conversion(sf_dir)
    assert list(out["stage"]) == ["1_view", "2_click", "3_purchase"]
    n = out["n_users"].to_numpy()
    assert (n[:-1] >= n[1:]).all()          # each stage can only shrink
    assert n[0] > 0                          # fixture has views


def test_funnel_matches_per_user_scan(sf_dir):
    """Brute-force parity: a per-user Python scan applying the strict->
    rule reproduces the distributed counts."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts"])
    reached = [0, 0, 0]
    for _, g in ev.groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy()
        e = g["event_type"].to_numpy()
        t1 = t[e == "view"]
        if not len(t1):
            continue
        reached[0] += 1
        t2 = t[(e == "click") & (t > t1.min())]
        if not len(t2):
            continue
        reached[1] += 1
        t3 = t[(e == "purchase") & (t > t2.min())]
        if len(t3):
            reached[2] += 1
    got = q_funnel_conversion(sf_dir)["n_users"].tolist()
    assert got == reached


def test_conjunctive_search_token_not_substring(sf_dir):
    """Every returned doc contains ALL terms as whole tokens, and the
    match rule is token equality, not substring."""
    out = q_conjunctive_token_search(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    hit = set(out["doc_id"])
    for doc_id, text in docs["text"].items():
        toks = set(text.split(" "))
        assert (doc_id in hit) == all(t in toks for t in SEARCH_TERMS)


def test_morton_helpers_agree_and_are_bijective():
    """The numpy interleave and the generated SQL expression produce the
    same codes (checked via DuckDB over the full 6-bit grid), and the
    interleave is a bijection on the grid."""
    import duckdb
    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    x, y = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    z = morton_interleave(x, y)
    assert len(np.unique(z)) == 64 * 64 and z.min() == 0 \
        and z.max() == 4095
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"x": x, "y": y}))
    zsql = con.execute(
        f"SELECT {morton_sql_expr('x', 'y')} AS z FROM g"
    ).fetchdf()["z"].to_numpy()
    assert np.array_equal(z, zsql)


def test_zorder_tiles_bound_both_dims(sf_dir):
    """The property Z-ordering exists for: every tile's bbox is a small
    rectangle in BOTH dims (<= quarter of each axis for a 6-bit code
    cut at the top 6 bits), so either-dim predicates can prune tiles."""
    out = q_zorder_layout_stats(sf_dir)
    assert out["n_parts"].sum() == len(
        pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"]))
    # top 6 of 12 bits -> each tile spans an 8x8 cell rectangle
    assert ((out["x_max"] - out["x_min"]) < 8).all()
    assert ((out["y_max"] - out["y_min"]) < 8).all()


def test_session_paths_reconcile(sf_dir):
    """Total sessions equal the gaps-and-islands count, and every path
    has at most 5 hops (the stated prefix truncation)."""
    out = q_session_paths(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("int64").to_numpy()
    u = ev["user_id"].to_numpy(np.int64)
    new = np.ones(len(ev), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP_US)
    assert out["n_sessions"].sum() == int(new.sum())
    assert out["path"].str.count(">").max() <= 4
