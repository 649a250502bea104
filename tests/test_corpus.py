"""Corpus-level training-data operators vs their DuckDB oracles."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from util_compare import assert_match  # noqa: E402

import __ray_entry__ as em  # noqa: E402
from vbpl_web_crawl_ray.pipelines import corpus as CP  # noqa: E402

ORACLE_NAMES = ["corpus_stats", "split_counts", "bigram_topk",
                "quality_filter_counts", "tfidf_topk", "rollup_revenue"]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_corpus_query_matches_oracle(name, sf_dir):
    qs, oracles = em.queries(), em.oracle_sql()
    assert_match(qs[name](sf_dir), oracles[name], sf_dir, name)


def test_split_is_pure_function_of_key(sf_dir):
    """The split must not depend on partitioning/run: two runs agree and
    per-source totals equal the source totals."""
    a = CP.q_split_counts(sf_dir)
    b = CP.q_split_counts(sf_dir)
    assert a.equals(b)
    per_source = a.groupby("source")["n"].sum()
    import pandas as pd
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source"])
    want = docs.groupby("source").size()
    assert (per_source.sort_index() == want.sort_index()).all()


def test_bigram_topk_deterministic_ties(sf_dir):
    out = CP.q_bigram_topk(sf_dir, k=10)
    assert len(out) == 10
    # sorted by (n desc, bigram asc) — deterministic under ties
    rows = list(zip(out["n"], out["bigram"]))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


def test_compression_ratio_deterministic_and_sane(sf_dir):
    from vbpl_web_crawl_ray.pipelines.corpus import (
        q_compression_ratio_by_source,
    )

    a = q_compression_ratio_by_source(sf_dir)
    b = q_compression_ratio_by_source(sf_dir)
    assert a.equals(b)
    assert (a["comp_bytes"] > 0).all()
    # natural-language synth text must compress but not vanish
    assert ((a["ratio"] > 0.05) & (a["ratio"] < 1.0)).all()
