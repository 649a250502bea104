"""External fuzzy full-text recovery wired INTO the crawl (M10/J5): docs
whose page lacks the toanvan div recover their sections from the
search.test secondary host by first-match-wins fuzzy title lookup
(reference app/service/vbpl.py:459-470, 922-988)."""

import glob

import pyarrow.parquet as pq
import pytest

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.fulltext import parse_fulltext
from vbpl_web_crawl_ray.stages.parse import ParseStage

CFG = SimWebConfig(n_hosts=2, pages_per_host=2, docs_per_page=4,
                   captions=tuple(f"Quy định quản lý chuyên ngành số {i} "
                                  f"về lĩnh vực thử nghiệm {i}"
                                  for i in range(40)),
                   flaky_rate=0.1, missing_rate=0.0,
                   missing_fulltext_rate=0.5)


def _phapquy_ids(cfg):
    web = SimWeb(cfg)
    return [k * cfg.doc_base + j for k in range(cfg.n_hosts)
            if web.flavor_of_host(k) == "phapquy"
            for j in range(cfg.docs_per_host(k))]


def _crawl(tmp_path, name, **engine_kw):
    out = str(tmp_path / name)
    eng = CrawlEngine(CFG, out, num_partitions=2, **engine_kw)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    return out


def _sections_by_doc(out):
    files = sorted(glob.glob(f"{out}/sections/round=*/*.parquet"))
    by_doc: dict[str, list] = {}
    if files:
        for r in pq.read_table(files).to_pylist():
            by_doc.setdefault(r["vbpl_id"], []).append(r)
    return by_doc


def test_missing_fulltext_docs_exist():
    web = SimWeb(CFG)
    missing = [d for d in _phapquy_ids(CFG) if web.missing_fulltext(d)]
    assert missing, "rate=0.5 must hit some docs"
    _, _, body = web.get(f"http://host0.test/doc.aspx?ItemID={missing[0]}",
                         attempt=1)
    assert b"toanvancontent" not in body


def test_crawl_recovers_missing_fulltext(tmp_path):
    out = _crawl(tmp_path, "enriched")
    by_doc = _sections_by_doc(out)
    web = SimWeb(CFG)
    missing = [d for d in _phapquy_ids(CFG) if web.missing_fulltext(d)]
    for did in missing:
        rows = by_doc.get(str(did))
        assert rows, f"doc {did} should have recovered sections"
        want, _ = parse_fulltext(did, web._fulltext_block(did).split("\n"))
        got = sorted((r["section_number"], r["section_name"],
                      r["section_content"]) for r in rows)
        assert got == sorted((s["section_number"], s["section_name"],
                              s["section_content"]) for s in want)


def test_enrichment_off_leaves_gaps(tmp_path):
    out = _crawl(tmp_path, "plain", enrich=False)
    by_doc = _sections_by_doc(out)
    web = SimWeb(CFG)
    missing = [d for d in _phapquy_ids(CFG) if web.missing_fulltext(d)]
    assert all(str(d) not in by_doc for d in missing)
    present = [d for d in _phapquy_ids(CFG) if not web.missing_fulltext(d)]
    assert any(str(d) in by_doc for d in present)


def test_decoy_and_unknown_titles_rejected():
    stage = ParseStage(CFG)
    # unknown caption: search returns only the low-similarity decoy
    assert stage._recover_fulltext("hoàn toàn không tồn tại") is None
    assert stage._recover_fulltext(None) is None
    # known caption: recovered lines equal the doc's own fulltext block
    web = SimWeb(CFG)
    did = _phapquy_ids(CFG)[0]
    lines = stage._recover_fulltext(web._caption(did))
    assert lines == web._fulltext_block(did).split("\n")
