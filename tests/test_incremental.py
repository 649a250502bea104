"""Incremental aggregate-maintenance store semantics."""

import pandas as pd
import pytest
import ray.data as rd

from vbpl_web_crawl_ray.pipelines import incremental as inc

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "lang", "n_chars"])


def test_incremental_equals_one_shot(tmp_path, ray_session):
    """Folding increments one at a time must equal aggregating the whole
    table at once (the additive-moments contract)."""
    store = str(tmp_path / "store")
    docs = _docs()
    for k in range(4):
        inc.update_stats(store, docs.map_batches(
            lambda df, _k=k: df[df["doc_id"] % 4 == _k],
            batch_format="pandas"), version=k)
    got = inc.read_stats(store).sort_values(inc.GROUP_COLS).reset_index(drop=True)

    one = str(tmp_path / "oneshot")
    inc.update_stats(one, docs, version=0)
    want = inc.read_stats(one).sort_values(inc.GROUP_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_update_is_idempotent_per_version(tmp_path, ray_session):
    """Re-running an increment overwrites its own partial — never
    double-counts (rounds-as-versions, same rule as the crawl sink)."""
    store = str(tmp_path / "store")
    docs = _docs()
    inc.update_stats(store, docs, version=0)
    before = inc.read_stats(store)
    inc.update_stats(store, docs, version=0)   # replay
    after = inc.read_stats(store)
    pd.testing.assert_frame_equal(before, after)
    # a DIFFERENT version with the same data does double-count (append-only
    # increments are the caller's contract)
    inc.update_stats(store, docs, version=1)
    doubled = inc.read_stats(store)
    assert (doubled["n_docs"] == 2 * before["n_docs"]).all()


def test_empty_store_reads_empty_frame(tmp_path):
    out = inc.read_stats(str(tmp_path / "nope"))
    assert len(out) == 0 and "n_docs" in out.columns
