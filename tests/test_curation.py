"""Curation operators (sampling / decontamination / packing) vs oracles."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from util_compare import assert_match  # noqa: E402

import __ray_entry__ as em  # noqa: E402
from vbpl_web_crawl_ray.pipelines import curation as CU  # noqa: E402

ORACLE_NAMES = ["hash_sample", "dup_ngram_fraction", "decontaminate",
                "pack_sequences", "mixture_weights"]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_curation_query_matches_oracle(name, sf_dir):
    qs, oracles = em.queries(), em.oracle_sql()
    assert_match(qs[name](sf_dir), oracles[name], sf_dir, name)


def test_hash_sample_rate_and_determinism(sf_dir):
    a = CU.q_hash_sample(sf_dir)
    b = CU.q_hash_sample(sf_dir)
    assert a.equals(b)
    import pandas as pd
    n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"]))
    # Bernoulli(0.1): binomial 5-sigma bounds around the mean
    lo = 0.1 * n_docs - 5 * np.sqrt(n_docs * 0.1 * 0.9)
    hi = 0.1 * n_docs + 5 * np.sqrt(n_docs * 0.1 * 0.9)
    assert lo <= len(a) <= hi


def test_pack_sequences_invariants(sf_dir):
    out = CU.q_pack_sequences(sf_dir)
    # contiguous token stream: each doc starts where the previous ended
    out = out.sort_values("doc_id").reset_index(drop=True)
    pos = (out["seq_start"].to_numpy() * CU.PACK_BUDGET
           + out["offset_in_seq"].to_numpy())
    assert (np.diff(pos) == out["n_tokens"].to_numpy()[:-1]).all()
    # seq_end consistent with the doc's own span
    end = pos + out["n_tokens"].to_numpy() - 1
    assert (out["seq_end"].to_numpy() == end // CU.PACK_BUDGET).all()
    # every sequence index up to the last is populated by some doc span
    assert set(range(int(out["seq_end"].max()) + 1)) == set(
        s for a, b in zip(out["seq_start"], out["seq_end"])
        for s in range(int(a), int(b) + 1))


def test_decontaminate_flags_only_train_docs(sf_dir):
    out = CU.q_decontaminate(sf_dir)
    assert (out["doc_id"] % CU.EVAL_MOD != 0).all()
    assert (out["n_hits"] >= 1).all()
