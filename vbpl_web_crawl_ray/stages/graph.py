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

from .shuffle import bucketed_group_apply


def connected_components(pairs: pd.DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_rounds: int = 50) -> pd.DataFrame:
    """(node, component) labeling; component id = min node id in the
    component. Distributed min-label propagation over Ray Data; falls back
    to pure pandas for tiny inputs (< 10k edges) where a shuffle per round
    costs more than the whole problem."""
    if len(pairs) == 0:
        return pd.DataFrame({"node": pd.Series(dtype=object),
                             "component": pd.Series(dtype=object)})
    if len(pairs) < 10_000:
        return _cc_local(pairs, id_a, id_b)

    edges = pd.concat([
        pairs[[id_a, id_b]].rename(columns={id_a: "u", id_b: "v"}),
        pairs[[id_b, id_a]].rename(columns={id_b: "u", id_a: "v"}),
    ], ignore_index=True)
    labels = pd.DataFrame({"node": pd.unique(edges["u"])})
    labels["component"] = labels["node"]
    edges_ds = rd.from_pandas(edges)

    for _ in range(max_rounds):
        lab_map = dict(zip(labels["node"], labels["component"]))

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            # candidate label for v = label of u
            return pd.DataFrame({"node": df["v"].to_numpy(),
                                 "cand": df["u"].map(lab_map).to_numpy()})

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["cand"].min()

        new = bucketed_group_apply(
            edges_ds.map_batches(propagate, batch_format="pandas"),
            "node", take_min, num_buckets=8).to_pandas()
        merged = labels.merge(new, on="node", how="left")
        better = merged["cand"].notna() & (merged["cand"] < merged["component"])
        if not better.any():
            break
        merged.loc[better, "component"] = merged.loc[better, "cand"]
        labels = merged[["node", "component"]]
        # path compression on the (small) label map: component chains
        # collapse to their roots, so convergence is O(log n) rounds, not
        # O(diameter) — the hash-to-min shortcutting step
        comp = dict(zip(labels["node"], labels["component"]))

        def _root(x):
            seen = []
            while comp.get(x, x) != x:
                seen.append(x)
                x = comp[x]
            for s in seen:
                comp[s] = x
            return x

        labels = pd.DataFrame({"node": labels["node"],
                               "component": [_root(n) for n in labels["node"]]})
    return labels.sort_values("node").reset_index(drop=True)


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
