"""Session-3 batch-3 families: debounce, Merkle tree, BFS, DQ audit.
Oracle gates pin full outputs; these pin the structural contracts."""

import hashlib

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational8 import (
    BFS_MAX_HOPS, DEBOUNCE_US, MERKLE_LEAVES, q_bfs_hop_counts,
    q_debounce_events, q_dq_constraint_audit, q_merkle_partition_tree)


def test_debounce_totals_and_nontrivial(sf_dir):
    out = q_debounce_events(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    per_type = ev["event_type"].value_counts()
    for _, r in out.iterrows():
        assert r["n_kept"] + r["n_dropped"] == per_type[r["event_type"]]
    assert out["n_dropped"].sum() > 0        # the 4h window really drops
    assert out["n_kept"].sum() > 0


def test_merkle_tree_shape_and_root_stability(sf_dir):
    """85 nodes (64+16+4+1), every digest 16 hex chars, and the root is
    reproducible from the leaves by the stated 4-ary fold — so two
    stores can compare level-by-level."""
    out = q_merkle_partition_tree(sf_dir)
    counts = out.groupby("level")["idx"].count().to_dict()
    assert counts == {0: MERKLE_LEAVES, 1: 16, 2: 4, 3: 1}
    assert out["digest"].str.fullmatch("[0-9a-f]{16}").all()
    cur = out[out["level"] == 0].sort_values("idx")["digest"].tolist()
    for lvl in (1, 2, 3):
        cur = [hashlib.md5("".join(cur[i:i + 4]).encode())
               .hexdigest()[:16] for i in range(0, len(cur), 4)]
        want = out[out["level"] == lvl].sort_values("idx")["digest"]
        assert cur == want.tolist()


def test_merkle_detects_single_row_change(sf_dir):
    """The anti-entropy property: flipping ONE row's priority changes
    exactly one leaf digest and the path above it — log-many digests,
    which is why stores exchange trees instead of rows."""
    out = q_merkle_partition_tree(sf_dir)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderpriority"])
    o = o.sort_values("o_orderkey").reset_index(drop=True)

    def tree(df):
        ck = [hashlib.md5(f"{a}|{b}|{c}".encode()).hexdigest()[:16]
              for a, b, c in zip(df["o_orderkey"], df["o_custkey"],
                                 df["o_orderpriority"])]
        leaves = {}
        for k, c in zip(df["o_orderkey"] % MERKLE_LEAVES, ck):
            leaves.setdefault(int(k), []).append(c)
        lvl0 = [hashlib.md5("".join(leaves.get(i, [])).encode())
                .hexdigest()[:16] for i in range(MERKLE_LEAVES)]
        levels = [lvl0]
        while len(levels[-1]) > 1:
            prev = levels[-1]
            levels.append([hashlib.md5("".join(prev[i:i + 4]).encode())
                           .hexdigest()[:16]
                           for i in range(0, len(prev), 4)])
        return levels

    base = tree(o)
    flat = [(lvl, i, d) for lvl, row in enumerate(base)
            for i, d in enumerate(row)]
    assert flat == list(map(tuple, out[["level", "idx", "digest"]]
                            .to_numpy()))
    o2 = o.copy()
    o2.loc[0, "o_orderpriority"] = "X-TAMPERED"
    changed = tree(o2)
    diffs = [(lvl, i) for lvl, (a, b) in enumerate(zip(base, changed))
             for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert len(diffs) == 4                   # one node per level
    assert [lvl for lvl, _ in diffs] == [0, 1, 2, 3]


def test_bfs_matches_reference_bfs(sf_dir):
    """Brute-force parity: a plain Python BFS over the derived doubling
    graph reproduces the per-hop counts, and hop counts are positive."""
    n = len(pd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"]))
    dist = {0: 0}
    frontier = [0]
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in ((2 * u) % n, (u + 1) % n):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    want = pd.Series(list(dist.values())).value_counts().sort_index()
    got = q_bfs_hop_counts(sf_dir)
    assert got["hop"].tolist() == want.index.tolist()
    assert got["n_nodes"].tolist() == want.tolist()


def test_dq_audit_planted_and_clean(sf_dir):
    """The raw fixture audits clean on 4 checks; the CDC-synth domain
    check reports exactly the planted key%5==0 (within key%4!=2)
    violations."""
    out = q_dq_constraint_audit(sf_dir).set_index("check_name")
    for name in ("orders_custkey_referential", "lineitem_qty_range",
                 "orders_orderkey_unique", "documents_nchars_consistent"):
        assert out.loc[name, "n_violations"] == 0, name
    k = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey"])["o_orderkey"] \
        .to_numpy(np.int64)
    planted = int(((k % 4 != 2) & (k % 5 == 0)).sum())
    assert out.loc["orders_priority_domain_synth",
                   "n_violations"] == planted > 0
    assert (out["n_checked"] > 0).all()


def test_dq_referential_gate_is_strategy_invariant(sf_dir):
    """Forcing gate_bytes=1 pushes the referential check through the
    bucketed-join path; the full audit output must be bit-identical to
    the broadcast path."""
    a = q_dq_constraint_audit(sf_dir)
    b = q_dq_constraint_audit(sf_dir, ref_gate_bytes=1)
    pd.testing.assert_frame_equal(a, b)
