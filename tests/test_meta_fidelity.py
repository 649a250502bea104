"""Full metadata-fidelity conformance (reference app/model/vbpl.py:7-27).

The meta table must carry the reference's complete persisted surface:
serial/dates (issuance, effective, expiration, gazette), state,
applicable_information, title + sub_title — extracted from the
vbProperties table, the div.vbInfo block and the box-map breadcrumb
(vbpl.py:594-648), with the concetti JSON-API recovery (vbpl.py:806-920)
filling dates+state for pages that omit them. Expectations here are
re-derived from the SimWeb data model, not from the parse code.
"""

import glob

import pyarrow.parquet as pq
import pytest

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.simweb import SIM_NOW, SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.parse import ParseStage

CAPS = tuple(f"Văn bản quy phạm mẫu {i} điều chỉnh lĩnh vực {i % 5}"
             for i in range(12))
CFG = SimWebConfig(n_hosts=2, pages_per_host=2, docs_per_page=4,
                   captions=CAPS, flavors=("phapquy",),
                   flaky_rate=0.1, missing_rate=0.05,
                   missing_dates_rate=0.4)


def _iso(d):
    return d.isoformat() if d is not None else None


def _expected(web: SimWeb, did: int) -> dict:
    """Independent expectation: portal dates when served; otherwise the
    concetti result — the FIRST doc sharing the caption (the decoy item
    fails the 3-key fuzzy acceptance; the first real item's name equals
    the search key exactly)."""
    if not web.missing_dates(did):
        dd = web.doc_dates(did)
        return {"effective_date": _iso(dd["effective"]),
                "expiration_date": _iso(dd["expiration"]),
                "gazette_date": _iso(dd["gazette"]),
                "state": dd["state"],
                "applicable_information": dd["applicable_information"]}
    cap = web._caption(did)
    hit = web.doc_dates(web._docs_with_caption(cap)[0])
    eff, exp = hit["effective"], hit["expiration"]
    if SIM_NOW < eff:
        state = "Chưa có hiệu lực"
    elif exp is not None and SIM_NOW >= exp:
        state = "Hết hiệu lực"
    else:
        state = "Có hiệu lực"
    return {"effective_date": _iso(eff), "expiration_date": _iso(exp),
            "gazette_date": None, "state": state,
            "applicable_information": web.doc_dates(did)
            ["applicable_information"]}


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("meta_fid"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    return out


def test_full_meta_surface_matches_data_model(crawl_out):
    web = SimWeb(CFG)
    t = pq.read_table(sorted(glob.glob(f"{crawl_out}/meta/round=*/*.parquet")))
    rows = {int(r["doc_id"]): r for r in t.to_pylist()}
    assert rows, "no meta rows crawled"
    served = {did for did in rows if not web.missing_dates(did)}
    missing = {did for did in rows if web.missing_dates(did)}
    assert served and missing, "config must exercise both date paths"
    for did, r in rows.items():
        want = _expected(web, did)
        got = {k: r[k] for k in want}
        assert got == want, (did, got, want)
        cap = web._caption(did)
        assert r["title"] == cap          # box-map breadcrumb
        assert r["sub_title"] == cap      # td.title (reference sub_title)
        dd = web.doc_dates(did)
        assert r["issuance_date"] == _iso(dd["issuance"])
        assert r["serial_number"] == f"{did}/QĐ-TTg"


def test_concetti_serial_key_path():
    """3-key acceptance order: with no usable title keys, the serial
    number resolves through the API's `number` field (ratio 1.0)."""
    stage = ParseStage(CFG, enrich=True)
    web = SimWeb(CFG)
    did = 1
    it = stage._concetti_lookup(None, None, f"{did}/QĐ-TTg", None)
    assert it is not None and it["number"] == f"{did}/QĐ-TTg"
    assert it["effectiveDate"] == web.doc_dates(did)["effective"].isoformat()


def test_concetti_decoy_and_miss_rejected():
    stage = ParseStage(CFG, enrich=True)
    assert stage._concetti_lookup("hoàn toàn không liên quan", None,
                                  None, None) is None
    assert stage._concetti_lookup(None, None, None, None) is None


def test_vbinfo_only_on_phapquy_pages():
    """The phapquy div.vbInfo marker must not collide with the hopnhat
    flavor marker (class=\"vbInfo hopnhat\") — each flavor dispatches to
    its own extractor config."""
    cfg = SimWebConfig(n_hosts=3, pages_per_host=1, docs_per_page=2,
                       captions=CAPS,
                       flavors=("phapquy", "anle", "hopnhat"),
                       flaky_rate=0.0, missing_rate=0.0)
    web = SimWeb(cfg)
    pq_body = web.get(f"http://host0.test/doc.aspx?ItemID=0")[2].decode()
    hn_body = web.get(
        f"http://host2.test/doc.aspx?ItemID={2 * cfg.doc_base}")[2].decode()
    assert 'class="vbInfo"' in pq_body
    assert 'class="vbInfo hopnhat"' not in pq_body
    assert 'class="vbInfo hopnhat"' in hn_body
