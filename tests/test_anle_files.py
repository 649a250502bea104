"""Anle multi-file re-association conformance (reference
app/service/anle.py:107-120,193-215,260-287).

One case page carries N>=2 div#filetaive attachment links; the crawler
downloads every file, space-joins file_link, and a decoupled pass parses
the doc id back OUT OF THE FILENAME (r'\\((.*?)\\)-'), transcodes non-PDF
containers (watermark injected then stripped), extracts the three anle
sections and re-keys them per doc with last-file-wins upsert order.
Expectations are re-derived from the SimWeb data model, not the code.
"""

import glob

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.sources.pdfcodec import decode_document
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.fulltext import (
    ANLE_CONTENT, ANLE_CONTEXT, ANLE_SOLUTION, ASPOSE_WATERMARK,
    extract_pdf_section, reassociate_anle_files)

CAPS = tuple(f"Án lệ mẫu số {i} về tranh chấp đất đai loại {i % 4}"
             for i in range(9))
CFG = SimWebConfig(n_hosts=2, pages_per_host=2, docs_per_page=3,
                   captions=CAPS, flavors=("anle",),
                   flaky_rate=0.1, missing_rate=0.0,
                   anle_files_per_doc=3)


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("anle_files"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=8)
    return out


def _expected_sections(web: SimWeb, did: int) -> dict:
    """Oracle: the LAST attachment's text (sequential upsert order),
    sections extracted the reference way."""
    last = web.n_anle_files(did) - 1
    text = web._anle_text_block(did, part=last)
    return {"context": extract_pdf_section(ANLE_CONTEXT, text),
            "solution": extract_pdf_section(ANLE_SOLUTION, text),
            "content": extract_pdf_section(ANLE_CONTENT, text)}


def test_sections_match_last_file_per_case(crawl_out):
    web = SimWeb(CFG)
    t = pq.read_table(sorted(glob.glob(
        f"{crawl_out}/anle_sections/round=*/*.parquet")),
        columns=["anle_id", "context", "solution", "content"])
    rows = {int(r["anle_id"]): r for r in t.to_pylist()}
    n_docs = sum(CFG.docs_per_host(k) for k in range(CFG.n_hosts))
    assert len(rows) == t.num_rows == n_docs  # one row per case, all cases
    for did, r in rows.items():
        assert web.n_anle_files(did) >= 2
        want = _expected_sections(web, did)
        got = {k: r[k] for k in want}
        assert got == want, (did, got, want)
        assert ASPOSE_WATERMARK not in r["content"]


def test_file_table_and_meta_links(crawl_out):
    web = SimWeb(CFG)
    files = pq.read_table(sorted(glob.glob(
        f"{crawl_out}/anle_files/round=*/part-*.parquet")))
    names = sorted(files["file_name"].to_pylist())
    assert len(names) == len(set(names))
    meta = {int(r["doc_id"]): r for r in pq.read_table(sorted(glob.glob(
        f"{crawl_out}/meta/round=*/*.parquet"))).to_pylist()}
    for did, r in meta.items():
        nf = web.n_anle_files(did)
        k = CFG.host_of_doc(did)
        parts = [f"({did})-p{i}.{'doc' if i % 2 else 'pdf'}"
                 for i in range(nf)]
        # reference anle.py:117-120: file_link = local names,
        # org_pdf_link = source URLs, both space-joined
        assert r["file_link"] == " ".join(parts)
        assert r["org_pdf_link"] == " ".join(
            f"http://host{k}.test/anle-file/{p}" for p in parts)
    # every harvested blob decodes to its page's per-part text
    got = {n: bytes(d) for n, d in
           zip(files["file_name"].to_pylist(), files["data"].to_pylist())}
    assert set(got) == {n for did in meta
                        for n in meta[did]["file_link"].split(" ")}
    name = f"(0)-p1.doc"
    assert got[name].startswith(b"%SIMDOC%")
    text = decode_document(got[name])
    assert text.startswith(ASPOSE_WATERMARK)  # transcode injects it
    assert "bản đính kèm 1" in text


def test_reassociation_is_filename_driven():
    """The stage never sees a doc id column — identity and order both
    come from the filename; unparseable names are dropped."""
    body = ("Tình huống án lệ:\nbối cảnh A\nGiải pháp pháp lý:\n"
            "giải pháp B\nGhi chú: hết\nNỘI DUNG ÁN LỆ\n[1] nội dung C\n")
    rows = [
        {"file_name": "(77)-p0.pdf",
         "data": b"%SIMPDF%" + body.replace("C", "cũ").encode()},
        {"file_name": "(77)-p1.doc", "data": b"%SIMDOC%" + body.encode()},
        {"file_name": "garbage.pdf", "data": b"%SIMPDF%x\n"},
    ]
    out = reassociate_anle_files(rd.from_items(rows)).to_pandas()
    assert list(out["anle_id"]) == ["77"]
    assert out.iloc[0]["context"] == "bối cảnh A"
    assert out.iloc[0]["solution"] == "giải pháp B"
    assert out.iloc[0]["content"] == "\n[1] nội dung C"  # p1 (last) wins


def test_rerun_into_same_out_is_idempotent(crawl_out):
    """A second drain rebuilds round=reassoc from the accumulated file
    parts without duplicating section rows."""
    before = pq.read_table(sorted(glob.glob(
        f"{crawl_out}/anle_sections/round=*/*.parquet")))
    eng = CrawlEngine(CFG, crawl_out, num_partitions=2)
    eng._reassociate_anle_files()
    after = pq.read_table(sorted(glob.glob(
        f"{crawl_out}/anle_sections/round=*/*.parquet")))
    assert after.num_rows == before.num_rows
