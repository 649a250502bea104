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


def embedding_near_dup_lsh(sf_dir: str, threshold: float = 0.45,
                           n_planes: int = 4, n_tables: int = 10,
                           seed: int = 13) -> pd.DataFrame:
    """Scale path for cosine near-dup pairs: random-hyperplane signatures →
    (table, bucket) groupby → candidate pairs within buckets → exact cosine
    verify. Only (bucket_key, vec_id) rows shuffle; the full matrix is
    broadcast once for verification only of candidates (at 100 TB the
    verify becomes a bucket-join). Recall vs the exact baseline is asserted
    in tests — LSH trades a bounded miss rate for candidate-set sparsity."""
    from .shuffle import bucketed_group_apply

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = _normalize(np.stack(emb["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, mat.shape[1]))
    mat_ref = ray.put((ids, mat, planes))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    class Signatures:
        def __init__(self):
            _, _, self.planes = ray.get(mat_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = _normalize(np.stack(df["embedding"].to_numpy())
                           .astype(np.float64))
            out_t, out_code, out_id = [], [], []
            for t in range(len(self.planes)):
                bits = (v @ self.planes[t].T) > 0
                codes = bits @ (1 << np.arange(bits.shape[1]))
                out_t.append(np.full(len(v), t, np.int64))
                out_code.append(codes.astype(np.int64))
                out_id.append(df["vec_id"].to_numpy())
            return pd.DataFrame({
                "bucket_key": np.concatenate(out_t) * (1 << n_planes)
                              + np.concatenate(out_code),
                "vec_id": np.concatenate(out_id)})

    sigs = ds.map_batches(Signatures, batch_format="pandas",
                          concurrency=(1, 4))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in g.groupby("bucket_key"):
            u = np.sort(sub["vec_id"].unique())
            if len(u) >= 2:
                a, b = np.triu_indices(len(u), k=1)
                out_a.append(u[a]); out_b.append(u[b])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = (bucketed_group_apply(sigs, "bucket_key", pairs_in_bucket,
                                 num_buckets=8)
            .to_pandas().drop_duplicates())
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64)})

    class Verify:
        def __init__(self):
            ids_, mat_, _ = ray.get(mat_ref)
            self.pos = {v: i for i, v in enumerate(ids_)}
            self.mat = mat_

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ia = df["id_a"].map(self.pos).to_numpy()
            ib = df["id_b"].map(self.pos).to_numpy()
            sims = np.einsum("ij,ij->i", self.mat[ia], self.mat[ib])
            return df[sims >= threshold]

    return (rd.from_pandas(cand)
              .map_batches(Verify, batch_format="pandas", concurrency=(1, 4))
              .to_pandas().sort_values(["id_a", "id_b"])
              .reset_index(drop=True))


class IVFIndex:
    """Inverted-file ANN index: k-means coarse quantizer (deterministic
    seeded Lloyd iterations), vectors assigned to their nearest centroid's
    posting list; queries probe the ``nprobe`` nearest cells. The classic
    IVF-Flat structure (Jégou et al., public algorithm) — at cluster scale
    each posting list is a partition and probing is a targeted read, not a
    scan."""

    def __init__(self, ids: np.ndarray, mat: np.ndarray, n_cells: int = 16,
                 iters: int = 10, seed: int = 5):
        self.ids = ids
        self.mat = _normalize(mat.astype(np.float64))
        rng = np.random.default_rng(seed)
        init = rng.choice(len(self.mat), size=min(n_cells, len(self.mat)),
                          replace=False)
        cents = self.mat[init].copy()
        for _ in range(iters):
            assign = np.argmax(self.mat @ cents.T, axis=1)
            for c in range(len(cents)):
                members = self.mat[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cents[c] = m / np.linalg.norm(m)
        self.centroids = cents
        self.assign = np.argmax(self.mat @ cents.T, axis=1)
        self.cells = {c: np.nonzero(self.assign == c)[0]
                      for c in range(len(cents))}

    def query(self, q: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        q = q / np.linalg.norm(q)
        order = np.argsort(-(self.centroids @ q))[:nprobe]
        cand = np.concatenate([self.cells[c] for c in order
                               if len(self.cells[c])])
        sims = self.mat[cand] @ q
        top = np.argsort(-sims, kind="stable")[:k]
        return pd.DataFrame({"vec_id": self.ids[cand][top].astype(np.int64),
                             "cos_sim": round_half_away(sims[top], 4)})


def ivf_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10,
             nprobe: int = 4) -> pd.DataFrame:
    """ANN top-k via the IVF index (second scale path besides LSH)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy())
    index = IVFIndex(ids, mat)
    q = mat[ids == query_vec_id][0].astype(np.float64)
    out = index.query(q, k=k + 1, nprobe=nprobe)
    return out[out["vec_id"] != query_vec_id].head(k).reset_index(drop=True)


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
