"""Graph operators over edge datasets: connected components and dup-group
clustering.

Near-dup pair lists (MinHash/SimHash/phash) become duplicate GROUPS via
connected components. Scale path: iterative min-label propagation — each
round is one bucketed shuffle keyed by node, labels converge in
O(diameter) rounds (the groupby-iteration pattern for components; public
Pregel-style algorithm). The reference's link graph (vbpl_related_document
/ vbpl_doc_map, app/model/vbpl.py:100-145) gets the same treatment for
document families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .shuffle import bucketed_group_apply, compact_for_join


def connected_components(pairs: pd.DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_rounds: int = 50,
                         local_threshold: int = 2_000_000) -> pd.DataFrame:
    """(node, component) labeling; component id = min node id in the
    component. Distributed min-label propagation over Ray Data; below
    ``local_threshold`` edges a single-pass union-find wins — each
    distributed round costs two shuffles + a join, so the crossover sits
    in the millions of edges (a 2M-edge union-find is ~2 s; the
    distributed path exists for edge sets that exceed one machine, where
    the input arrives as a Dataset anyway)."""
    if len(pairs) == 0:
        return pd.DataFrame({"node": pd.Series(dtype=object),
                             "component": pd.Series(dtype=object)})
    if len(pairs) < local_threshold:
        return _cc_local(pairs, id_a, id_b)

    edges = pd.concat([
        pairs[[id_a, id_b]].rename(columns={id_a: "u", id_b: "v"}),
        pairs[[id_b, id_a]].rename(columns={id_b: "u", id_a: "v"}),
    ], ignore_index=True)
    init = pd.DataFrame({"node": pd.unique(edges["u"])})
    init["component"] = init["node"]
    edges_ds = rd.from_pandas(edges).materialize()
    labels_ds = rd.from_pandas(init).materialize()

    def as_cand(is_self: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            src = "v" if not is_self else "node"
            return pd.DataFrame({
                "node": df[src].to_numpy(),
                "cand": df["component"].to_numpy(),
                "is_self": np.full(len(df), is_self, dtype=np.int8)})
        return f

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        new = (g.groupby("node", as_index=False)["cand"].min()
                .rename(columns={"cand": "component"}))
        old = (g[g["is_self"] == 1][["node", "cand"]]
               .rename(columns={"cand": "old"}))
        m = new.merge(old, on="node", how="left")
        m["changed"] = (m["component"] < m["old"]).astype(np.int64)
        return m[["node", "component", "changed"]]

    for _ in range(max_rounds):
        # propagate: labels hash-join to edges (no label map in any task
        # closure — the labels themselves are a keyed dataset and only the
        # matching rows move), then per-node min via the bucketed shuffle
        prop = (edges_ds.join(labels_ds, join_type="inner", num_partitions=8,
                              on=("u",), right_on=("node",))
                        .map_batches(as_cand(0), batch_format="pandas"))
        selfs = labels_ds.map_batches(as_cand(1), batch_format="pandas")
        new_labels = bucketed_group_apply(prop.union(selfs), "node", take_min,
                                          num_buckets=8).materialize()
        changed = new_labels.sum("changed")
        # compacted: labels feed the next round's hash joins, and
        # map_groups-derived datasets carry schema-less empty blocks
        labels_ds = compact_for_join(new_labels.map_batches(
            lambda df: df[["node", "component"]], batch_format="pandas"))
        if not changed:
            break
        # pointer jumping (shortcutting): component <- component's
        # component, one self-join per round -> O(log n) convergence.
        # Every component value is itself a labeled node, so the inner
        # join is total.
        jump_to = labels_ds.map_batches(
            lambda df: df.rename(columns={"node": "jnode",
                                          "component": "jcomp"}),
            batch_format="pandas")
        labels_ds = (labels_ds.join(jump_to, join_type="inner",
                                    num_partitions=8,
                                    on=("component",), right_on=("jnode",))
                     .map_batches(lambda df: pd.DataFrame(
                         {"node": df["node"].to_numpy(),
                          "component": df["jcomp"].to_numpy()}),
                         batch_format="pandas")
                     .materialize())
    return (labels_ds.to_pandas()
            .sort_values("node").reset_index(drop=True))


def _cc_local(pairs: pd.DataFrame, id_a: str, id_b: str) -> pd.DataFrame:
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs[id_a], pairs[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pd.DataFrame({"node": nodes, "component": [find(n) for n in nodes]})


def dup_clusters(pairs: pd.DataFrame, id_a: str = "id_a",
                 id_b: str = "id_b") -> pd.DataFrame:
    """Duplicate groups from near-dup pairs: (component, size, members
    sorted) — the keep-one-representative input for dedup filtering."""
    cc = connected_components(pairs, id_a, id_b)
    if cc.empty:
        return pd.DataFrame({"component": [], "size": [], "members": []})
    g = cc.groupby("component")["node"].agg(list).reset_index()
    g["members"] = g["node"].map(lambda xs: sorted(xs))
    g["size"] = g["members"].str.len().astype("int64")
    return g[["component", "size", "members"]].sort_values("component") \
        .reset_index(drop=True)
