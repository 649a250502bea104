"""Crawl emits the reference's full table set: sections (≅ vbpl_toan_van),
anle_sections (≅ anle_section), meta (≅ vbpl/anle), edges, payload."""

import glob

import pyarrow.parquet as pq
import pytest

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.fulltext import parse_fulltext

CFG = SimWebConfig(n_hosts=4, pages_per_host=1, docs_per_page=4,
                   captions=tuple(
                       f"văn bản điều hành số {i} nội dung quy định chi tiết "
                       f"thi hành một số điều khoản mục tiêu phát triển {i}"
                       for i in range(20)),
                   flaky_rate=0.0, missing_rate=0.0)


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sections_out"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=16)
    return out


def _read(out, sub):
    files = sorted(glob.glob(f"{out}/{sub}/round=*/*.parquet"))
    return pq.read_table(files) if files else None


def test_sections_match_offline_parse(crawl_out):
    t = _read(crawl_out, "sections")
    assert t is not None and t.num_rows > 0
    by_doc = {}
    for r in t.to_pylist():
        by_doc.setdefault(r["vbpl_id"], []).append(r)
    web = SimWeb(CFG)
    # doc 0 is on host 0 (phapquy): reparse its fulltext block offline
    some_doc = sorted(by_doc)[0]
    block = web._fulltext_block(int(some_doc))
    secs, subs = parse_fulltext(int(some_doc), block.split("\n"))
    got = sorted((r["section_number"], r["section_name"])
                 for r in by_doc[some_doc])
    want = sorted((s["section_number"], s["section_name"]) for s in secs)
    assert got == want
    # hierarchy context flowed through
    assert all(r["chapter_number"] for r in by_doc[some_doc])


def test_full_hierarchy_columns_persisted(crawl_out):
    """All 8 hierarchy columns of the reference's vbpl_toan_van model
    (app/model/vbpl.py:77-97) survive to the crawl sink."""
    t = _read(crawl_out, "sections")
    cols = set(t.schema.names)
    assert {"big_part_number", "big_part_name", "part_number", "part_name",
            "mini_part_number", "mini_part_name", "chapter_number",
            "chapter_name"} <= cols
    # the crawled rows equal a direct parse INCLUDING hierarchy context
    web = SimWeb(CFG)
    rows = t.to_pylist()
    some_doc = sorted({r["vbpl_id"] for r in rows})[0]
    secs, _ = parse_fulltext(int(some_doc),
                             web._fulltext_block(int(some_doc)).split("\n"))
    want = sorted((s["section_number"], s["chapter_number"], s["part_number"],
                   s["big_part_number"]) for s in secs)
    got = sorted((r["section_number"], r["chapter_number"], r["part_number"],
                  r["big_part_number"]) for r in rows
                 if r["vbpl_id"] == some_doc)
    assert got == want


def test_appendix_rows_in_sub_part_table(crawl_out):
    """Appendices land in the separate sub_parts table (reference
    vbpl_sub_part, app/model/vbpl.py:148-166), not overloaded into
    sections."""
    t = _read(crawl_out, "sub_parts")
    assert t is not None and t.num_rows > 0
    rows = t.to_pylist()
    # docs with id % 7 == 0 carry an appendix with part number I
    assert any(r["sub_section_part_number"] == "I" for r in rows)
    assert all({"vbpl_id", "sub_section_title", "sub_section_part_number",
                "sub_section_part_title"} <= set(r) for r in rows[:3])
    # sections table no longer carries the sub-part overload rows
    s = _read(crawl_out, "sections")
    assert all(r["section_number"] > 0 for r in s.to_pylist())


def test_anle_sections_from_odd_hosts(crawl_out):
    t = _read(crawl_out, "anle_sections")
    assert t is not None and t.num_rows > 0
    rows = t.to_pylist()
    for r in rows[:5]:
        assert CFG.host_of_doc(int(r["anle_id"])) % 2 == 1
        assert r["context"] and r["solution"] and r["content"].startswith("\n[1]")


def test_meta_flavors(crawl_out):
    t = _read(crawl_out, "meta")
    rows = t.to_pylist()
    phapquy = [r for r in rows if r["doc_type"] == "Quyết định"]
    anle = [r for r in rows if r["doc_type"] == "Án lệ"]
    assert phapquy and anle
    assert all(r["serial_number"].endswith("/QĐ-TTg") for r in phapquy)
    assert all(r["serial_number"].endswith("/AL") for r in anle)
    # full anle attribute surface (reference regex dict anle.py:75-84,
    # unified-meta mapping: adoption->issuance, application->effective,
    # publication->gazette); anle rows have no issuing authority
    for r in anle:
        assert r["issuing_authority"] is None
        assert r["sector"].startswith("Dân sự")
        assert r["title"].startswith("Án lệ số")
        assert r["publication_decision"].endswith("/QĐ-CA")
        assert len(r["effective_date"]) == 10   # Ngày áp dụng
        assert r["state"] in ("Có hiệu lực", "Hết hiệu lực",
                              "Chưa có hiệu lực")
