"""Approximate-nearest-neighbor search over an embedding column.

Baseline: exact brute-force cosine top-k — one numpy matmul per batch
against a broadcast query matrix (zero-copy Arrow list<float> -> numpy).
Scale path: LSH-bucketed search (random-hyperplane signatures, Charikar'02)
that probes only matching buckets; recall measured against the exact
baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.numeric import round_half_away


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def brute_force_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Exact top-k by cosine vs one stored query vector.

    The corpus streams through map_batches; each batch computes its local
    scores against the broadcast query then its local top-k; the driver
    merges the tiny per-batch top-k results (tournament reduction) — no
    full-corpus materialization.
    """
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrow = emb.loc[emb["vec_id"] == query_vec_id, "embedding"]
    q = _normalize(np.stack(qrow.to_numpy()).astype(np.float64))[0]
    qref = ray.put(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ qv
        ids = df["vec_id"].to_numpy()
        mask = ids != query_vec_id
        sims, ids = sims[mask], ids[mask]
        idx = np.argsort(-round_half_away(sims, 4), kind="stable")[:k]
        return pd.DataFrame({"vec_id": ids[idx].astype(np.int64),
                             "cos_sim": round_half_away(sims[idx], 4)})

    merged = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    return (merged.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
                  .head(k).reset_index(drop=True))


class HyperplaneLSHIndex:
    """Random-hyperplane LSH over normalized embeddings.

    ``n_planes`` hyperplanes -> 2^n_planes buckets per table; ``n_tables``
    independent tables to recover recall. Built once (an actor would hold it
    in __init__); probe cost ~ corpus/2^n_planes x n_tables rows.
    """

    def __init__(self, ids: np.ndarray, mat: np.ndarray,
                 n_planes: int = 6, n_tables: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.ids = ids
        self.mat = _normalize(mat.astype(np.float64))
        self.planes = rng.standard_normal((n_tables, n_planes, mat.shape[1]))
        self.tables: list[dict[int, np.ndarray]] = []
        for t in range(n_tables):
            codes = self._codes(self.mat, t)
            table: dict[int, list[int]] = {}
            for i, c in enumerate(codes):
                table.setdefault(int(c), []).append(i)
            self.tables.append({c: np.array(v) for c, v in table.items()})

    def _codes(self, vecs: np.ndarray, t: int) -> np.ndarray:
        bits = (vecs @ self.planes[t].T) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)

    def query(self, q: np.ndarray, k: int = 10) -> pd.DataFrame:
        q = q / np.linalg.norm(q)
        cand: set[int] = set()
        for t in range(len(self.planes)):
            code = int(self._codes(q[None, :], t)[0])
            cand.update(self.tables[t].get(code, np.array([], dtype=int)).tolist())
        cand_idx = np.array(sorted(cand), dtype=int)
        if len(cand_idx) == 0:
            return pd.DataFrame({"vec_id": [], "cos_sim": []})
        sims = self.mat[cand_idx] @ q
        order = np.argsort(-sims, kind="stable")[:k]
        return pd.DataFrame({"vec_id": self.ids[cand_idx][order].astype(np.int64),
                             "cos_sim": round_half_away(sims[order], 4)})


def lsh_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """ANN top-k via the LSH index (the scale path; recall vs brute force
    is asserted in tests)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy())
    index = HyperplaneLSHIndex(ids, mat)
    q = mat[ids == query_vec_id][0]
    out = index.query(q, k=k + 1)
    return out[out["vec_id"] != query_vec_id].head(k).reset_index(drop=True)
