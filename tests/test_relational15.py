"""Session-3 batch-10 families: histogram-selection p99 + range plan."""

import numpy as np
import pandas as pd

from vbpl_web_crawl_ray.pipelines.relational15 import (
    N_PARTS, q_p99_outlier_counts, q_range_partition_plan)


def test_p99_threshold_is_exact_order_statistic(sf_dir):
    """The histogram-derived threshold equals the literal sorted-array
    k-th smallest, and ~1% of rows sit strictly above it."""
    out = q_p99_outlier_counts(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    cents = np.sort(np.round(ev["value"].to_numpy(np.float64) * 100)
                    .astype(np.int64))
    n = len(cents)
    k = (99 * n + 99) // 100
    assert out["threshold_cents"].iloc[0] == cents[k - 1]
    assert out["threshold_cents"].nunique() == 1      # one global thr
    frac = out["n_above"].sum() / n
    assert 0.0 <= frac <= 0.01 + 1e-9                  # ceil rank rule


def test_range_partitions_are_near_equal_and_ordered(sf_dir):
    """Partitions cover every row, sizes are near-equal (the planner's
    point), and cents ranges are non-overlapping in partition order
    except at shared boundary values."""
    out = q_range_partition_plan(sf_dir)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    n = len(li)
    assert out["n_rows"].sum() == n
    assert len(out) == N_PARTS
    assert out["n_rows"].min() >= n // N_PARTS - n // 100 - 2
    o = out.sort_values("partition")
    # a partition's max never exceeds the next partition's min except
    # by boundary-value ties (equal rows go left)
    assert (o["c_max"].to_numpy()[:-1]
            <= o["c_min"].to_numpy()[1:]).all()
