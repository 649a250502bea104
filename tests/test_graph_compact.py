"""Connected components / dup clusters and crawl-output compaction."""

import glob

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.graph import connected_components, dup_clusters
from vbpl_web_crawl_ray.stages.upsert import compact_crawl_output


def test_connected_components_small():
    pairs = pd.DataFrame({"id_a": [1, 2, 5, 9], "id_b": [2, 3, 6, 1]})
    cc = connected_components(pairs)
    lab = dict(zip(cc["node"], cc["component"]))
    assert lab[1] == lab[2] == lab[3] == lab[9] == 1
    assert lab[5] == lab[6] == 5


def test_connected_components_distributed_path():
    # chain of 30k edges through the label-propagation path (forced via
    # local_threshold=0 — the production crossover sits at 2M edges)
    n = 15_000
    pairs = pd.DataFrame({
        "id_a": list(range(0, n)) + list(range(n + 10, n + 10 + n)),
        "id_b": list(range(1, n + 1)) + list(range(n + 11, n + 11 + n)),
    })
    cc = connected_components(pairs, local_threshold=0)
    lab = dict(zip(cc["node"], cc["component"]))
    assert lab[n] == 0            # end of first chain reaches root 0
    assert lab[n + 10 + n] == n + 10


def test_dup_clusters():
    pairs = pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 3, 8]})
    g = dup_clusters(pairs)
    assert list(g["size"]) == [3, 2]
    assert g.loc[0, "members"] == [1, 2, 3]


def test_compact_crawl_output(tmp_path):
    cfg = SimWebConfig(n_hosts=2, pages_per_host=1, docs_per_page=4,
                       captions=("văn bản a", "văn bản b"),
                       flaky_rate=0.0, missing_rate=0.0)
    out = str(tmp_path / "c")
    eng = CrawlEngine(cfg, out, num_partitions=2)
    eng.seed(SimWeb(cfg).seed_urls())
    eng.run(max_rounds=16)
    compacted = compact_crawl_output(out, "payload", "image_id")
    t = rd.read_parquet(compacted).to_pandas()
    raw = pq.read_table(sorted(glob.glob(f"{out}/payload/round=*/*.parquet")),
                        columns=["image_id"])
    assert sorted(t["image_id"]) == sorted(set(raw["image_id"].to_pylist()))
    # idempotent: compact again, same content
    compact_crawl_output(out, "payload", "image_id")
    t2 = rd.read_parquet(compacted).to_pandas()
    assert sorted(t2["image_id"]) == sorted(t["image_id"])
