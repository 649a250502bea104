"""Cuckoo-deletion re-crawl and real-time politeness enforcement."""

import time

import pytest

from oracle_crawler import oracle_crawl
from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig

CFG = SimWebConfig(n_hosts=2, pages_per_host=1, docs_per_page=3,
                   captions=tuple(f"tài liệu {i}" for i in range(10)),
                   flaky_rate=0.0, missing_rate=0.0)


def test_forget_and_recrawl(tmp_path):
    eng = CrawlEngine(CFG, str(tmp_path / "c"), num_partitions=2,
                      allow_deletions=True, track_seen=True)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    n_first = len(eng.crawl_log)
    doc_url = next(u for (*_, u) in eng.crawl_log if "/doc.aspx" in u)

    # without forget: re-offer is deduped, nothing refetched
    eng._offer([(doc_url, 0, 0)])
    assert not eng.run_round()

    # forget -> re-offer -> the document is fetched again
    assert eng.forget([doc_url]) == 1
    eng._offer([(doc_url, 0, 0)])
    assert eng.run_round()
    assert len(eng.crawl_log) == n_first + 1
    assert eng.crawl_log[-1][-1] == doc_url


def test_forget_requires_cuckoo(tmp_path):
    eng = CrawlEngine(CFG, str(tmp_path / "b"), num_partitions=1)
    eng.seed(SimWeb(CFG).seed_urls())
    with pytest.raises(Exception):  # surfaced RuntimeError from the actor
        eng.forget(["http://host0.test/listing.aspx?Page=1"])


def test_cuckoo_frontier_matches_oracle(tmp_path):
    """The deletion-capable filter must not change crawl semantics."""
    eng = CrawlEngine(CFG, str(tmp_path / "k"), num_partitions=2,
                      allow_deletions=True)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    assert [(t, h, d, o, u) for (_, t, h, d, o, u) in eng.crawl_log] \
        == oracle_crawl(CFG)["log"]


def test_refresh_cycles(tmp_path):
    """main.py-loop analogue: two full cycles fetch the same URL set twice;
    payload output replays identically (idempotent upsert semantics)."""
    eng = CrawlEngine(CFG, str(tmp_path / "rc"), num_partitions=2,
                      allow_deletions=True, track_seen=True)
    seeds = SimWeb(CFG).seed_urls()
    eng.run_refresh_cycles(seeds, cycles=2)
    urls = [u for (*_, u) in eng.crawl_log]
    half = len(urls) // 2
    assert len(urls) == 2 * half
    assert sorted(urls[:half]) == sorted(urls[half:])


def test_real_time_politeness(tmp_path):
    """With real_time=True the wall clock respects the virtual schedule:
    the crawl cannot finish before the last scheduled fetch_time."""
    cfg = SimWebConfig(n_hosts=1, pages_per_host=1, docs_per_page=4,
                       captions=("a",), crawl_delays=(0.4,),
                       flaky_rate=0.0, missing_rate=0.0)
    eng = CrawlEngine(cfg, str(tmp_path / "rt"), num_partitions=1,
                      default_delay=0.4, real_time=True)
    eng.seed(SimWeb(cfg).seed_urls())
    t0 = time.time()
    eng.run(max_rounds=8)
    wall = time.time() - t0
    max_ft = max(t for (_, t, *_rest) in eng.crawl_log)
    assert max_ft > 0
    assert wall >= max_ft  # politeness budget enforced in wall time
