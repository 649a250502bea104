"""Driver-fidelity gate: every oracle-backed query, at the DRIVER'S scale
factor (sf0.01), under the DRIVER'S comparison (bit-exact value equality,
not a float tolerance).

Why this exists: test_conformance.py runs sf0.001 with a 1e-9 tolerance,
which is the right default for fast iteration but hid a real gate
failure — event_gap differed from DuckDB by 1 ulp in the 4th rounded
decimal on 2 of 10,000 rows at sf0.01 (EPOCH(interval)'s days+micros
float decomposition vs a single ns/1e9 division). The external
CORRECTNESS gate hashes values exactly, so a last-ulp drift IS a
failure; this module makes that class of bug a local test failure
instead of a per-round surprise. If a query ever flakes here
run-to-run, that is itself signal the gate can flake on it.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

from util_compare import canonicalize, run_oracle, to_pandas  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"      # the driver's correctness scale
QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_bit_exact_at_driver_sf(name, ray_session):
    got = canonicalize(to_pandas(QUERIES[name](SF_DIR)))
    want = canonicalize(run_oracle(ORACLES[name], SF_DIR))
    assert len(got) == len(want), \
        f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if pd.api.types.is_float_dtype(want[c]):
            ok = np.array_equal(a, b, equal_nan=True)
        else:
            ok = got[c].astype(str).equals(want[c].astype(str))
        assert ok, f"{name}: column {c} not bit-exact"
