"""Deduplication operators over document tables.

The reference deduplicates exactly, by natural-key probes against MySQL
(per-page id_set app/service/vbpl.py:133,143 + PK existence checks
app/service/vbpl.py:188-190). At 100 TB the engine needs the full family:

- exact dedup: content-hash -> hash-partitioned groupby -> first
- n-gram Jaccard with *prefix filtering* (exact, provably full recall)
- MinHash + LSH banding (approximate, scales to corpora where the exact
  pairwise verify is too big)
- SimHash (Charikar) Hamming near-dup
- embedding-cosine near-dup (blocked brute force vs broadcast matrix)

All candidate generation is expressed as map_batches (signature/emit) +
groupby (bucket) so the all-to-all moves only (bucket_key, doc_id) pairs,
never the documents themselves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.numeric import round_half_away

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keep the minimum-id representative of each distinct text.

    map_batches adds a 64-bit content hash (vectorized); the groupby
    shuffles only (hash, id) pairs. Collision-safe at the oracle level
    because representatives are re-keyed by full text within each group.
    """
    from .shuffle import bucketed_group_apply

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "content_hash": hash64(df[text_col].to_numpy()).astype(np.int64),
            id_col: df[id_col].to_numpy(),
            text_col: df[text_col].to_numpy(),
        })

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        # within one bucket, key by exact text (hash-collision guard)
        out = g.groupby(text_col, as_index=False)[id_col].min()
        return out[[id_col]]

    return bucketed_group_apply(
        ds.map_batches(add_hash, batch_format="pandas"),
        "content_hash", first_per_text, num_buckets=8)


# ---------------------------------------------------------------------------
# n-gram shingles + exact Jaccard via prefix filtering
# ---------------------------------------------------------------------------

def _shingles(tokens: list[str], n: int = 3) -> list[str]:
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, n: int = 3,
                        table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> pd.DataFrame:
    """All pairs with n-gram-shingle Jaccard >= threshold — EXACT.

    Candidate generation uses prefix filtering (SSJoin/PPJoin family,
    Chaudhuri et al. ICDE'06 — public algorithm): order each doc's shingle
    set by ascending global document frequency; if J(A,B) >= t, A and B must
    share a shingle within each one's first ``|S| - ceil(t*|S|) + 1``
    shingles. Only prefix shingles are exploded to (shingle, doc) rows, so
    hot shingles ('the quick brown'-style) mostly drop out of the shuffle.
    Verification computes exact Jaccard per candidate pair.
    """
    from .shuffle import bucketed_group_apply

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[id_col, text_col])

    def to_shingle_sets(df: pd.DataFrame) -> pd.DataFrame:
        sets = [sorted(set(_shingles(t.split(" "), n))) for t in df[text_col]]
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "shingles": sets})

    # reused by three consumers (freq, prefix emit, verify) -> pin once
    sets_ds = ds.map_batches(to_shingle_sets, batch_format="pandas").materialize()

    # pass 1: global shingle document frequencies via the coarse-bucket
    # shuffle (per-batch dict combiner first, so each shingle ships once
    # per batch, not once per occurrence)
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for s in df["shingles"]:
            for sh in s:
                counts[sh] = counts.get(sh, 0) + 1
        return pd.DataFrame({"shingle": list(counts), "c": list(counts.values())})

    # partials merge on the driver: the distinct-shingle vocabulary must
    # reach the driver anyway (it becomes the broadcast rank dictionary),
    # so a dict merge over the combiner outputs beats a shuffle here; at a
    # vocabulary too big for one machine this becomes the bucketed groupby
    counts: dict[str, int] = {}
    for b in sets_ds.map_batches(df_partial, batch_format="pandas") \
                    .iter_batches(batch_format="pandas"):
        for s, c in zip(b["shingle"], b["c"]):
            counts[s] = counts.get(s, 0) + int(c)
    # canonical global order: ascending df, then shingle text
    order = {s: i for i, s in enumerate(
        sorted(counts, key=lambda s: (counts[s], s)))}
    order_ref = ray.put(order)

    # pass 2: emit prefix (shingle_rank, doc) pairs only
    def emit_prefix(df: pd.DataFrame) -> pd.DataFrame:
        rank = ray.get(order_ref)
        rows_sh, rows_id = [], []
        for did, s in zip(df[id_col], df["shingles"]):
            s = sorted(s, key=rank.__getitem__)
            prefix_len = len(s) - int(np.ceil(threshold * len(s))) + 1
            for sh in s[:prefix_len]:
                rows_sh.append(rank[sh])
                rows_id.append(did)
        return pd.DataFrame({"shingle_rank": np.array(rows_sh, dtype=np.int64),
                             id_col: np.array(rows_id, dtype=np.int64)})

    prefix = sets_ds.map_batches(emit_prefix, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # drop singleton ranks vectorized, then pair per surviving rank
        g = g[g.groupby("shingle_rank")["shingle_rank"].transform("size") >= 2]
        out_a, out_b = [], []
        for _, sub in g.groupby("shingle_rank"):
            ids = np.sort(sub[id_col].unique())
            if len(ids) >= 2:
                a, b = np.triu_indices(len(ids), k=1)
                out_a.append(ids[a]); out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = (bucketed_group_apply(prefix, "shingle_rank", pairs_in_bucket,
                                 num_buckets=16)
            .to_pandas().drop_duplicates())
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})

    # exact size-ratio prefilter: J(A,B) >= t requires min|.|/max|.| >= t —
    # vectorized over the candidate list, prunes before any set intersection
    sets_pdf = sets_ds.to_pandas()
    size_of = dict(zip(sets_pdf[id_col],
                       (len(s) for s in sets_pdf["shingles"])))
    la = cand["id_a"].map(size_of).to_numpy(dtype=np.float64)
    lb = cand["id_b"].map(size_of).to_numpy(dtype=np.float64)
    cand = cand[np.minimum(la, lb) >= threshold * np.maximum(la, lb)]
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})

    # verify distributed: shingle sets broadcast once, exact Jaccard per
    # candidate pair inside map_batches (at 100 TB this broadcast becomes a
    # bucket-join keyed by id_a; the verify math is unchanged)
    sets_ref = ray.put(dict(zip(sets_pdf[id_col],
                                (set(s) for s in sets_pdf["shingles"]))))

    class Verify:
        def __init__(self):
            self.sets = ray.get(sets_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for ia, ib in zip(df["id_a"], df["id_b"]):
                sa, sb = self.sets[ia], self.sets[ib]
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    rows.append((ia, ib, round_half_away(j, 4)))
            return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
                {"id_a": np.int64, "id_b": np.int64})

    return (rd.from_pandas(cand)
              .map_batches(Verify, batch_format="pandas", batch_size=8192,
                           concurrency=(1, 8))
              .to_pandas())


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Stateful minhash signature stage: permutation parameters are built once
    per actor in __init__ (the actor-pool pattern, SURVEY.md §2.3)."""

    def __init__(self, num_perm: int = 128, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id", seed: int = 7):
        rng = np.random.default_rng(seed)
        m = np.uint64(((1 << 61) - 1))
        self.a = rng.integers(1, m, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, m, size=num_perm, dtype=np.uint64)
        self.m = m
        self.n = n
        self.text_col, self.id_col = text_col, id_col
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = list(set(_shingles(text.split(" "), self.n)))
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = hash64(sh).astype(np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal-hash matrix -> min per row
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % self.m
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in df[self.text_col]])
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "signature": list(sigs)})


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, num_perm: int = 128,
                      bands: int = 32, n: int = 3) -> pd.DataFrame:
    """Near-dup candidate pairs via MinHash-LSH banding, verified by
    estimated Jaccard (signature agreement) >= threshold.

    shingle -> minhash (actor pool) -> explode (band_id, band_hash, doc_id)
    -> groupby band bucket -> pairs -> verify. The shuffle carries only the
    banded hashes; documents never move.
    """
    rows = num_perm // bands
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 8),
                          batch_size=256,
                          fn_constructor_kwargs={"num_perm": num_perm, "n": n}
                          ).materialize()

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_id = [], [], []
        for did, sig in zip(df["doc_id"], df["signature"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                out_band.append(b)
                out_hash.append(int(hash64([sig[b * rows:(b + 1) * rows].tobytes()])[0]))
                out_id.append(did)
        return pd.DataFrame({"band": np.array(out_band, dtype=np.int32),
                             "band_hash": np.array(out_hash, dtype=np.uint64),
                             "doc_id": np.array(out_id, dtype=np.int64)})

    banded = sigs.map_batches(to_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # within one band value, all docs sharing the band hash are candidates
        out_a, out_b = [], []
        for _, sub in g.groupby("band_hash"):
            ids = np.sort(sub["doc_id"].unique())
            if len(ids) >= 2:
                a, b = np.triu_indices(len(ids), k=1)
                out_a.extend(ids[a]); out_b.extend(ids[b])
        return pd.DataFrame({"id_a": np.array(out_a, dtype=np.int64),
                             "id_b": np.array(out_b, dtype=np.int64)})

    cand = (banded.groupby("band").map_groups(bucket_pairs, batch_format="pandas")
                  .to_pandas().drop_duplicates())

    sig_pdf = sigs.to_pandas()
    sig_map = {d: np.asarray(s, dtype=np.uint64)
               for d, s in zip(sig_pdf["doc_id"], sig_pdf["signature"])}
    out = []
    for ia, ib in cand.itertuples(index=False):
        est = float((sig_map[ia] == sig_map[ib]).mean())
        if est >= threshold:
            out.append((ia, ib, round_half_away(est, 4)))
    return pd.DataFrame(out, columns=["id_a", "id_b", "est_jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(ds: rd.Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> rd.Dataset:
    """64-bit SimHash (Charikar'02) over whitespace tokens, vectorized:
    per doc, sum +-1 contributions of token-hash bits weighted by count."""
    def sim(df: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(df), dtype=np.uint64)
        for i, t in enumerate(df[text_col]):
            toks = t.split(" ")
            if not toks:
                continue
            h = hash64(toks).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0)[::-1]).view(">u8")[0]
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "simhash": out})
    return ds.map_batches(sim, batch_format="pandas")


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit hash into (max_hamming+1) chunks —
    two hashes within distance d must agree on at least one chunk
    (pigeonhole) -> groupby (chunk_id, chunk_value) buckets, verify popcount.
    """
    k = max_hamming + 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = simhash_signatures(ds).materialize()

    def to_chunks(df: pd.DataFrame) -> pd.DataFrame:
        chunk_bits = 64 // k
        rows = {"chunk": [], "chunk_val": [], "doc_id": [], "simhash": []}
        for did, sh in zip(df["doc_id"], df["simhash"]):
            sh = np.uint64(sh)
            for c in range(k):
                val = int((sh >> np.uint64(c * chunk_bits))
                          & np.uint64((1 << chunk_bits) - 1))
                rows["chunk"].append(c); rows["chunk_val"].append(val)
                rows["doc_id"].append(did); rows["simhash"].append(int(sh))
        # explicit dtypes: np.array() of Python ints straddling 2^63 would
        # silently promote to float64 and corrupt the hashes
        return pd.DataFrame({
            "chunk": np.array(rows["chunk"], dtype=np.int32),
            "chunk_val": np.array(rows["chunk_val"], dtype=np.int64),
            "doc_id": np.array(rows["doc_id"], dtype=np.int64),
            "simhash": np.array(rows["simhash"], dtype=np.uint64),
        })

    chunked = sigs.map_batches(to_chunks, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        x = hs[a] ^ hs[b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep],
                             "hamming": ham[keep]})

    return (chunked.groupby(["chunk", "chunk_val"])
                   .map_groups(verify, batch_format="pandas")
                   .to_pandas().drop_duplicates(["id_a", "id_b"])
                   .reset_index(drop=True))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """All embedding pairs with cosine >= threshold.

    The full matrix is broadcast once (ray.put) and each batch does one
    numpy matmul against it — O(batch x corpus) FLOPs, zero Python loops.
    At 100 TB the broadcast side becomes the IVF/LSH-bucketed index in
    ann.py; this is the exact baseline.
    """
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    ref = ray.put((ids, mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.pos = {v: i for i, v in enumerate(self.ids)}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ self.mat.T                    # (batch, corpus)
            qi = df["vec_id"].to_numpy()
            r, c = np.nonzero(sims >= threshold)
            ia, ib = qi[r], self.ids[c]
            keep = ia < ib                            # each pair once, no self
            return pd.DataFrame({"id_a": ia[keep].astype(np.int64),
                                 "id_b": ib[keep].astype(np.int64)})

    return (ds.map_batches(PairFinder, batch_format="pandas", concurrency=(1, 2))
              .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
