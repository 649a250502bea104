"""Third document flavor: hợp nhất / consolidated docs (reference
vbpl.py:514-573) — vbInfo attribute list, full text behind a PDF <object>
discovered on the main tab or the second tab URL (vbpl.py:474-512),
decoded through the pluggable PDF codec."""

import glob

import pyarrow.parquet as pq
import pytest

from oracle_crawler import oracle_crawl
from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.pdfcodec import decode_pdf_binary, decode_simpdf
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.fulltext import parse_fulltext
from vbpl_web_crawl_ray.stages.parse import ParseStage

CFG = SimWebConfig(n_hosts=3, pages_per_host=2, docs_per_page=4,
                   captions=tuple(f"Văn bản hợp nhất mẫu {i} điều khoản {i}"
                                  for i in range(30)),
                   flavors=("phapquy", "anle", "hopnhat"),
                   flaky_rate=0.1, missing_rate=0.05)


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hopnhat_out"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    return eng, out


def _hopnhat_ids():
    web = SimWeb(CFG)
    return [k * CFG.doc_base + j for k in range(CFG.n_hosts)
            if web.flavor_of_host(k) == "hopnhat"
            for j in range(CFG.docs_per_host(k))
            if not web._is_missing_doc(k * CFG.doc_base + j)]


def test_three_flavor_crawl_matches_oracle(crawl_out):
    eng, _ = crawl_out
    oracle = oracle_crawl(CFG)
    assert [(t, h, d, o, u) for (_, t, h, d, o, u) in eng.crawl_log] \
        == oracle["log"]


def test_hopnhat_payload_rows(crawl_out):
    """hopnhat pages carry the image payload like the other flavors."""
    _, out = crawl_out
    t = pq.read_table(sorted(glob.glob(f"{out}/payload/round=*/*.parquet")),
                      columns=["image_id"])
    ids = {int(i[3:]) for i in t["image_id"].to_pylist()}
    assert set(_hopnhat_ids()) <= ids


def test_hopnhat_meta_config(crawl_out):
    _, out = crawl_out
    t = pq.read_table(sorted(glob.glob(f"{out}/meta/round=*/*.parquet")))
    rows = [r for r in t.to_pylist()
            if r["doc_type"] == "Văn bản hợp nhất"]
    assert {int(r["doc_id"]) for r in rows} == set(_hopnhat_ids())
    web = SimWeb(CFG)
    for r in rows:
        assert r["serial_number"].endswith("/VBHN-BCT")
        # reference hợp nhất dict (vbpl.py:542-548) has NO issuance field:
        # 'Ngày xác thực' -> effective_date, plus gazette_date
        assert r["issuance_date"] is None
        assert len(r["effective_date"]) == 10
        gaz = web.doc_dates(int(r["doc_id"]))["gazette"]
        assert r["gazette_date"] == (gaz.isoformat() if gaz else None)
        assert ".pdf" in (r["file_link"] or "")


def test_hopnhat_sections_via_both_tabs(crawl_out):
    """Docs with the PDF object on the main tab AND docs needing the
    second tab both yield sections equal to a direct parse of the PDF
    text."""
    _, out = crawl_out
    t = pq.read_table(sorted(glob.glob(f"{out}/sections/round=*/*.parquet")))
    by_doc = {}
    for r in t.to_pylist():
        by_doc.setdefault(int(r["vbpl_id"]), []).append(r)
    web = SimWeb(CFG)
    main_tab = [d for d in _hopnhat_ids() if web.hopnhat_pdf_on_main(d)]
    second_tab = [d for d in _hopnhat_ids() if not web.hopnhat_pdf_on_main(d)]
    assert main_tab and second_tab, "both tab variants must occur"
    for did in main_tab + second_tab:
        want, _ = parse_fulltext(did, web._fulltext_block(did).split("\n"))
        got = sorted((r["section_number"], r["section_name"],
                      r["section_content"]) for r in by_doc[did])
        assert got == sorted((s["section_number"], s["section_name"],
                              s["section_content"]) for s in want), did


def test_pdf_codec_seam():
    """The decode seam is pluggable: the SIMPDF codec round-trips, the
    real-binary codec is an honest stub, and a stage built with the stub
    still produces meta (graceful degradation, no crash)."""
    web = SimWeb(CFG)
    did = _hopnhat_ids()[0]
    _, _, data = web.get(f"http://host2.test/pdf/{did}.pdf", attempt=1)
    assert decode_simpdf(data)  # text extracted
    from vbpl_web_crawl_ray.sources.pdfcodec import HAVE_PDFPLUMBER
    with pytest.raises(NotImplementedError if not HAVE_PDFPLUMBER
                       else Exception):
        decode_pdf_binary(data)  # SIMPDF bytes are not a real PDF
    stage = ParseStage(CFG, pdf_codec=decode_pdf_binary)
    out = {k: [] for k in ("edges", "meta", "sections", "sub_parts",
                           "anle_sections", "fails")}
    _, _, body = web.get(f"http://host2.test/doc.aspx?ItemID={did}",
                         attempt=1)
    rec = {"url": f"http://host2.test/doc.aspx?ItemID={did}", "depth": 1,
           "discovery_order": 1}
    stage._parse_doc(rec, body.decode(), [], [], out)
    assert out["meta"] and not out["sections"]
