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
