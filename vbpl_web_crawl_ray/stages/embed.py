"""Deterministic text embedding + the embed->near-dup pipeline.

A training-data pipeline embeds documents before semantic dedup /
similarity search. The container has no model runtime, so the embedder
is feature hashing (Weinberger et al., ICML'09 — public algorithm):
token 64-bit hash -> bucket h % dim with sign from one hash bit,
L2-normalized. Vocabulary-free (nothing to broadcast), deterministic at
any parallelism, and REAL in every Ray-side respect a learned encoder
would have: weights-free __init__ stands where the checkpoint load goes,
__call__ is vectorized batch inference emitting a list<float> column.

The pipeline composition (embed -> pair generation -> verify) reuses the
dedup machinery, so swapping in a learned encoder changes one class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.numeric import round_half_away


class HashingEmbedder:
    """Actor-pool embedding stage: (doc_id, text) -> (doc_id, embedding).

    Scoring is one np.add.at scatter over the batch's concatenated
    tokens — no per-token Python. A real encoder would load its
    checkpoint here in __init__ and batch its forward pass the same way.
    """

    def __init__(self, dim: int = 64, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        dim = self.dim
        mats = np.zeros((len(df), dim), dtype=np.float64)
        doc_idx, toks = [], []
        for i, t in enumerate(df[self.text_col]):
            ws = t.split(" ")
            doc_idx.extend([i] * len(ws))
            toks.extend(ws)
        if toks:
            h = hash64(toks)
            buckets = (h % np.uint64(dim)).astype(np.int64)
            signs = np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0)
            np.add.at(mats, (np.array(doc_idx), buckets), signs)
        norms = np.linalg.norm(mats, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mats = mats / norms
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "embedding": list(mats.astype(np.float64))})


def embed_documents(ds: rd.Dataset, dim: int = 64,
                    concurrency=(1, 8), batch_size: int = 512) -> rd.Dataset:
    return ds.map_batches(HashingEmbedder, batch_format="pandas",
                          fn_constructor_kwargs={"dim": dim},
                          concurrency=concurrency, batch_size=batch_size)


def doc_embedding_near_dup(sf_dir: str, threshold: float = 0.95,
                           dim: int = 64) -> pd.DataFrame:
    """End-to-end semantic dedup over raw documents: embed (actor pool)
    -> exact cosine pairs >= threshold. Identical texts embed
    identically, so the exact-duplicate pair set is a provable subset of
    this result (asserted in tests); near-identical texts surface too.

    Verify is the broadcast exact baseline — the embedded matrix is
    (n x dim) float64; LSH bucketing (ann.embedding_near_dup_lsh) is the
    scale path once the matrix outgrows broadcast."""
    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    emb = embed_documents(ds, dim=dim)
    pdf = emb.to_pandas()      # (n x dim) control-sized at test scale
    ids = pdf["doc_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy())
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    mref = ray.put((ids, mat))

    # block-partitioned pair scan: each task scores one row-block against
    # the broadcast matrix (the brute-force near-dup pattern)
    nblocks = max(1, len(ids) // 512)
    blocks = rd.range(nblocks)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_, mat_ = ray.get(mref)
        out = []
        for b in df["id"]:
            lo, hi = b * 512, min((b + 1) * 512, len(ids_)) if b < nblocks - 1 else len(ids_)
            sims = mat_[lo:hi] @ mat_.T
            for i in range(lo, hi):
                js = np.where(round_half_away(sims[i - lo], 4) >= threshold)[0]
                js = js[ids_[js] > ids_[i]]
                out.extend((ids_[i], ids_[j],
                            round_half_away(float(sims[i - lo, j]), 4))
                           for j in js)
        return pd.DataFrame(out, columns=["id_a", "id_b", "cos_sim"]).astype(
            {"id_a": np.int64, "id_b": np.int64, "cos_sim": np.float64})

    res = blocks.map_batches(pairs, batch_format="pandas").to_pandas()
    return res.sort_values(["id_a", "id_b"]).reset_index(drop=True)
