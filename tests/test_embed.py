"""Feature-hashing embedder + embed->near-dup pipeline invariants."""

import sys

import numpy as np
import pandas as pd
import ray.data as rd

sys.path.insert(0, "/root/repo")

from vbpl_web_crawl_ray.stages import embed  # noqa: E402


def test_embedder_deterministic_and_normalized(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    a = embed.embed_documents(ds, dim=32).to_pandas().sort_values("doc_id")
    b = embed.embed_documents(ds, dim=32).to_pandas().sort_values("doc_id")
    ma = np.stack(a["embedding"].to_numpy())
    mb = np.stack(b["embedding"].to_numpy())
    assert np.array_equal(ma, mb)
    assert np.allclose(np.linalg.norm(ma, axis=1), 1.0)


def test_identical_texts_embed_identically(sf_dir, tmp_path):
    """Plant exact-duplicate texts; their pairs MUST surface with cosine
    exactly 1.0 (identical text -> identical embedding is the invariant a
    learned encoder also satisfies)."""
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    dups = pdf.head(5).copy()
    dups["doc_id"] = dups["doc_id"] + 100_000
    planted = pd.concat([pdf, dups], ignore_index=True)
    planted.to_parquet(tmp_path / "documents.parquet")
    out = embed.doc_embedding_near_dup(str(tmp_path), threshold=0.95)
    got = dict(zip(zip(out["id_a"], out["id_b"]), out["cos_sim"]))
    for did in pdf.head(5)["doc_id"]:
        pair = (int(did), int(did) + 100_000)
        assert pair in got, pair
        assert got[pair] == 1.0


def test_doc_near_dup_never_materializes_corpus(sf_dir, monkeypatch):
    """With the broadcast gate forced off, the embed->near-dup pipeline
    must keep the embedding matrix fully distributed (LSH candidates +
    pair-halves verify): the only driver-side to_pandas allowed is the
    final small pair list — the r2 driver-matrix anti-pattern stays dead."""
    from vbpl_web_crawl_ray.stages import dedup

    monkeypatch.setattr(dedup, "BROADCAST_MAX_BYTES", 0)
    real = rd.Dataset.to_pandas

    def bounded(self, *a, **k):
        df = real(self, *a, **k)
        assert len(df) < 10_000, \
            f"driver materialized {len(df)} rows (corpus-sized)"
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", bounded)
    out = embed.doc_embedding_near_dup(sf_dir, threshold=0.95)
    assert {"id_a", "id_b", "cos_sim"} <= set(out.columns)
