"""Small reference-parity items: 3-valued effect state, preview export."""

import zipfile
from datetime import datetime

import pandas as pd

from vbpl_web_crawl_ray.stages.enrich import (derive_effect_state,
                                              derive_effect_state_batch)


def test_effect_state_scalar():
    now = datetime(2024, 6, 1)
    assert derive_effect_state(datetime(2025, 1, 1), None, now) == \
        "Chưa có hiệu lực"
    assert derive_effect_state(datetime(2020, 1, 1), datetime(2023, 1, 1),
                               now) == "Hết hiệu lực"
    assert derive_effect_state(datetime(2020, 1, 1), None, now) == \
        "Có hiệu lực"
    assert derive_effect_state(None, None, now) == "Có hiệu lực"


def test_effect_state_batch():
    now = pd.Timestamp("2024-06-01")
    df = pd.DataFrame({
        "eff": ["2025-01-01", "2020-01-01", "2020-01-01", None],
        "exp": [None, "2023-01-01", None, None],
    })
    out = derive_effect_state_batch(df, "eff", "exp", now)
    assert list(out) == ["Chưa có hiệu lực", "Hết hiệu lực",
                        "Có hiệu lực", "Có hiệu lực"]


def test_export_preview(tmp_path):
    from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
    from vbpl_web_crawl_ray.pipelines.lookup import export_preview
    from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig

    cfg = SimWebConfig(n_hosts=2, pages_per_host=1, docs_per_page=3,
                       captions=("văn bản",), flaky_rate=0.0, missing_rate=0.0)
    out = str(tmp_path / "c")
    eng = CrawlEngine(cfg, out, num_partitions=1)
    eng.seed(SimWeb(cfg).seed_urls())
    eng.run(max_rounds=8)
    archive = export_preview(out, str(tmp_path / "preview.zip"), limit=3)
    with zipfile.ZipFile(archive) as z:
        sql = z.read("preview.sql").decode()
    assert sql.count("INSERT INTO vbpl") == 3
    assert "serial_number" in sql


def test_driver_window_integrity():
    """The rotation list must resolve exactly: 50 slots, every name a
    real queries() entry, the window actually leads the dict the driver
    iterates, EVERY in-window entry is an oracle twin (zero rows-only —
    the round-5 contract), and none of them ever had a driver
    CORRECTNESS row in rounds 1-4."""
    import json
    import os

    import __ray_entry__ as em

    q = list(em.queries())
    w = em._WINDOW_R5
    assert len(w) == 50 and len(set(w)) == 50
    assert q[:50] == w
    # slots 1-4: the session-3 families (never driver-checked); slot 5:
    # simhash_pairs, newly oracle-backed this round
    assert w[:5] == ["edit_distance_pairs", "kmv_distinct_md5",
                     "cdc_snapshot_diff", "leakage_safe_split",
                     "simhash_pairs"]
    twins = set(em.oracle_sql())
    assert all(n in twins for n in w)
    # "never checked" = no prior round ever recorded a hash-matched row
    # (simhash_pairs had a rows-only r4 row before it grew its oracle)
    hash_checked: set = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(os.path.dirname(em.__file__),
                            f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                for name, row in json.load(f).items():
                    if isinstance(row, dict) and row.get("hash_match"):
                        hash_checked.add(name)
    assert not (set(w) & hash_checked), sorted(set(w) & hash_checked)
