"""Relational conformance: every oracle-backed queries() entry vs DuckDB,
mirroring the driver's CORRECTNESS gate (at sf0.001 for speed; the driver
re-runs at sf0.01)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

from util_compare import assert_match, to_pandas  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
SQL_BACKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(name, sf_dir):
    result = QUERIES[name](sf_dir)
    assert_match(result, ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, sf_dir):
    df = to_pandas(QUERIES[name](sf_dir))
    assert df is not None and len(df) >= 0


def test_entry_smoke():
    ds = entrymod.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    # flagship returns the crawled payload table (input_hint schema)
    assert {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"} \
        <= set(df.columns)
