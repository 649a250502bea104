"""Session-3 batch-7 families: HDR log histogram, FD profiling."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational12 import (
    q_fd_audit, q_value_log_histogram)


def test_log_histogram_buckets_are_exact_exponents(sf_dir):
    """Every bucket's [c_min, c_max] sits inside [2^b, 2^(b+1)) — the
    exactness that a float log2 can lose at 2^k boundaries — and the
    counts cover the table."""
    out = q_value_log_histogram(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    assert out["n_rows"].sum() == len(ev)
    for _, r in out.iterrows():
        b = r["bucket"]
        if b < 0:
            assert r["c_max"] <= 0
        else:
            assert (1 << b) <= r["c_min"] <= r["c_max"] < (1 << (b + 1))


def test_frexp_exponent_matches_bit_length():
    """The engine's frexp trick equals int.bit_length - 1 on the full
    boundary-heavy range (1..2^20 powers and neighbors)."""
    vals = []
    for k in range(1, 50):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    v = np.array(vals, dtype=np.int64)
    _, e = np.frexp(v.astype(np.float64))
    got = e - 1
    want = np.array([x.bit_length() - 1 for x in vals], dtype=np.int64)
    assert np.array_equal(got, want)


def test_fd_audit_directions(sf_dir):
    """The schema-implied FD holds; both planted/behavioral candidates
    violate; group counts match the key cardinalities."""
    out = q_fd_audit(sf_dir).set_index("fd_name")
    assert out.loc["nationkey_determines_regionkey", "n_violating"] == 0
    assert out.loc["custkey_determines_priority", "n_violating"] > 0
    assert out.loc["orderkey_mod100_determines_priority",
                   "n_violating"] > 0
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"])
    assert out.loc["custkey_determines_priority",
                   "n_groups"] == o["o_custkey"].nunique()
    assert out.loc["orderkey_mod100_determines_priority",
                   "n_groups"] == 100
