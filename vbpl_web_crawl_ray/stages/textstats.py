"""Text-analysis stages: token counts, quality scores, language-ID,
document fingerprints.

The reference's text handling is parse-and-store (SURVEY.md §2.2); a
training-data pipeline additionally needs per-document statistics. All
stages are vectorized pandas/pyarrow batch transforms; the semantics are
chosen to be expressible in ANSI SQL so each has a DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.numeric import round_half_away

# stopword set used by the lang-ID heuristic; pattern form must stay in
# sync with the oracle SQL in __ray_entry__
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_PATTERN = r"(?:^| )(?:" + "|".join(EN_STOPWORDS) + r")(?= |$)"


def token_count(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Whitespace token count per document (BPE-ish splitting belongs in the
    same stage; semantics here = split on single space, like SQL
    string_split)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": df[text_col].str.split(" ").str.len().astype("int64"),
        })
    return ds.map_batches(f, batch_format="pandas")


_BPE_TOKEN = r"\w+|[^\w\s]"  # GPT-style pre-tokenizer shape; RE2-compatible


def regex_token_count(ds: rd.Dataset, text_col: str = "text",
                      id_col: str = "doc_id") -> rd.Dataset:
    """BPE-ish regex token count (words + punctuation marks) — the
    second tokenizer of the token-counting family; vectorized str.count."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_regex_tokens": df[text_col].str.count(_BPE_TOKEN)
                                         .astype("int64"),
        })
    return ds.map_batches(f, batch_format="pandas")


def quality_score(ds: rd.Dataset, text_col: str = "text",
                  id_col: str = "doc_id") -> rd.Dataset:
    """Length/avg-token-length quality features, all vectorized str kernels."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df[text_col].str.split(" ").str.len().astype("int64")
        n_char = df[text_col].str.len().astype("int64")
        avg_tok = round_half_away(((n_char - (n_tok - 1)) / n_tok).to_numpy(), 4)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_tokens": n_tok, "n_chars_text": n_char,
                             "avg_token_len": avg_tok})
    return ds.map_batches(f, batch_format="pandas")


def lang_id(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
            min_hits: int = 3) -> rd.Dataset:
    """Heuristic language ID: count English stopword tokens (vectorized
    regex count); >= min_hits -> 'en', else 'other'. The n-gram-heuristic
    slot of the training-data stage family."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        hits = df[text_col].str.count(_STOP_PATTERN).astype("int64")
        pred = np.where(hits >= min_hits, "en", "other")
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "stop_hits": hits, "pred_lang": pred})
    return ds.map_batches(f, batch_format="pandas")


def md5_fingerprint(ds: rd.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> rd.Dataset:
    """Cryptographic content fingerprint (md5 hex) — the exact-identity key
    for cross-run dedup manifests."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.md5(t.encode()).hexdigest() for t in df[text_col]]
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "fingerprint": fp})
    return ds.map_batches(f, batch_format="pandas")


def rolling_fingerprint(ds: rd.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 8,
                        hash_fn=None) -> rd.Dataset:
    """Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03):
    min of rolling-window shingle hashes — robust to local edits. The
    siphash default is rows-only (pytest determinism); passing
    ``md5_hash64`` gives the oracle-backed twin — MIN over window-grams
    is order-free, so DuckDB restates it as a plain MIN over the
    unnested gram hashes."""
    if hash_fn is None:
        hash_fn = hash64

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.zeros(len(df), dtype=np.uint64)
        for i, t in enumerate(df[text_col]):
            toks = t.split(" ")
            grams = [" ".join(toks[j:j + window])
                     for j in range(max(1, len(toks) - window + 1))]
            fps[i] = hash_fn(grams).min()
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "rolling_fp": fps})
    return ds.map_batches(f, batch_format="pandas")


class QualityModel:
    """Batched model inference as an actor-pool stage: a logistic
    quality classifier whose weights load ONCE per actor in __init__
    (the model-load-in-init pattern — at scale this is where a real
    checkpoint deserializes; here the weights are fixed constants so the
    score is reproducible and SQL-oracle-checkable). __call__ is one
    vectorized feature extraction + one matmul + a sigmoid per batch —
    no per-row Python in the scoring path.

    Features (chosen to be ANSI-SQL-expressible for the oracle):
      x1 = token count / 100
      x2 = stopword-token fraction
      x3 = mean word length / 10
    score = sigmoid(w . x + b), rounded half-away to 6.
    """

    WEIGHTS = np.array([0.8, 2.5, -1.2])
    BIAS = -0.6

    def __init__(self):
        # stands in for checkpoint load / tokenizer init: done once per
        # actor, reused across every batch the actor scores
        self.w = np.asarray(self.WEIGHTS, dtype=np.float64)
        self.b = float(self.BIAS)
        self.stop_pattern = _STOP_PATTERN

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = (df["text"].str.count(" ") + 1).to_numpy(np.float64)
        stops = df["text"].str.count(self.stop_pattern).to_numpy(np.float64)
        chars = df["text"].str.len().to_numpy(np.float64)
        # mean word length: (chars - separators) / tokens
        mwl = (chars - (toks - 1)) / toks
        x = np.stack([toks / 100.0, stops / toks, mwl / 10.0], axis=1)
        z = x @ self.w + self.b
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "quality_prob": round_half_away(1.0 / (1.0 + np.exp(-z)), 4)})


def model_quality_scores(ds: rd.Dataset, concurrency=(1, 8),
                         batch_size: int = 512) -> rd.Dataset:
    """Score every document with the actor-pool quality model."""
    return ds.map_batches(QualityModel, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)
