"""Metadata extraction, link-driven pagination, point lookup / preview,
re-crawl idempotence, total-count parse."""

import glob

import pyarrow.parquet as pq
import pytest

from oracle_crawler import oracle_crawl
from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.pipelines.lookup import fetch_doc_by_id, preview_latest
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig

CFG = SimWebConfig(n_hosts=3, pages_per_host=2, docs_per_page=4,
                   captions=tuple(f"Văn bản mẫu {i}" for i in range(30)),
                   flaky_rate=0.1, missing_rate=0.05)


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extras_out"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=32)
    return eng, out


def test_meta_table_written(crawl_out):
    _, out = crawl_out
    files = sorted(glob.glob(f"{out}/meta/round=*/*.parquet"))
    assert files
    t = pq.read_table(files)
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert len(rows) > 0
    some = next(iter(rows.values()))
    # M2-config extraction + d/m/Y -> ISO date conversion
    assert some["serial_number"].endswith("/QĐ-TTg")
    assert some["doc_type"] == "Quyết định"
    assert some["issuance_date"] is None or len(some["issuance_date"]) == 10


def test_fetch_doc_by_id(crawl_out):
    eng, out = crawl_out
    # pick a doc that produced a payload
    t = pq.read_table(sorted(glob.glob(f"{out}/payload/round=*/*.parquet")),
                      columns=["image_id"])
    doc_id = int(t["image_id"][0].as_py()[3:])
    row = fetch_doc_by_id(out, doc_id)
    assert row is not None
    assert row["meta"]["doc_id"] == str(doc_id)
    assert isinstance(row["related"], list)
    if row["related"]:
        assert {"doc_id", "label", "title"} <= set(row["related"][0])
    assert fetch_doc_by_id(out, 99_999_999) is None


def test_preview_latest(crawl_out):
    _, out = crawl_out
    df = preview_latest(out, limit=5).to_pandas()
    assert 0 < len(df) <= 5
    dates = list(df["issuance_date"])
    assert dates == sorted(dates, reverse=True)


def test_pagination_via_links_same_coverage(tmp_path):
    """anle-style unknown-length pagination: seeding only page 1 discovers
    every page through 'next' links; final fetched set identical to the
    all-seeds mode, ordering still matches the oracle."""
    cfg_pag = SimWebConfig(**{**CFG.__dict__, "paginate_via_links": True})
    eng = CrawlEngine(cfg_pag, str(tmp_path / "pag"), num_partitions=2)
    eng.seed(SimWeb(cfg_pag).seed_urls())
    eng.run(max_rounds=64)
    oracle = oracle_crawl(cfg_pag)
    assert [(t, h, d, o, u) for (_, t, h, d, o, u) in eng.crawl_log] \
        == oracle["log"]
    urls = {u for (*_, u) in eng.crawl_log}
    base = oracle_crawl(CFG)
    assert urls == {u for (*_, u) in base["log"]}
    assert eng.round > 3  # page chain forces extra rounds


def test_recrawl_idempotent(crawl_out, tmp_path):
    """Reference semantics: re-running the whole crawl (fresh frontier)
    produces identical payload bytes — resume-by-replay (§2.8)."""
    _, out1 = crawl_out
    out2 = str(tmp_path / "again")
    eng = CrawlEngine(CFG, out2, num_partitions=3)  # different partitioning
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=32)
    t1 = pq.read_table(sorted(glob.glob(f"{out1}/payload/round=*/*.parquet")))
    t2 = pq.read_table(sorted(glob.glob(f"{out2}/payload/round=*/*.parquet")))
    r1 = {r["image_id"]: r["bytes"] for r in t1.to_pylist()}
    r2 = {r["image_id"]: r["bytes"] for r in t2.to_pylist()}
    assert r1 == r2


def test_get_total_docs():
    assert SimWeb(CFG).get_total_docs(0) == CFG.docs_per_host(0)


def test_store_html_blob_table(tmp_path):
    """store_html persists the raw full-text node verbatim per doc (the
    reference's vbpl.html LONGTEXT column, app/model/vbpl.py:23 set at
    vbpl.py:458) in its own content table, off by default."""
    cfg = SimWebConfig(n_hosts=1, pages_per_host=2, docs_per_page=4,
                       captions=tuple(f"Văn bản mẫu {i}" for i in range(9)),
                       flavors=("phapquy",), flaky_rate=0.0, missing_rate=0.0)
    out = str(tmp_path / "html_out")
    eng = CrawlEngine(cfg, out, num_partitions=1, store_html=True)
    eng.seed(SimWeb(cfg).seed_urls())
    eng.run(max_rounds=8)
    t = pq.read_table(sorted(glob.glob(f"{out}/html/round=*/part-*.parquet")))
    rows = {int(r["doc_id"]): r["html"] for r in t.to_pylist()}
    assert len(rows) == t.num_rows == 8        # one blob per doc
    web = SimWeb(cfg)
    for did, html in rows.items():
        want = (f'<div class="toanvancontent">\n'
                f'{web._fulltext_block(did)}</div>')
        assert html == want, did
    # off by default: the flagship crawl writes no html parts
    out2 = str(tmp_path / "nohtml_out")
    eng2 = CrawlEngine(cfg, out2, num_partitions=1)
    eng2.seed(SimWeb(cfg).seed_urls())
    eng2.run(max_rounds=8)
    assert not glob.glob(f"{out2}/html/round=*/part-*.parquet")


def test_point_lookup_prunes_by_footer_stats(crawl_out, tmp_path):
    """Zone-map pruning: the point lookup must open only files whose
    parquet footer [min,max] can contain the key. Build a store with two
    disjoint-key-range payload files; looking up a key from file A must
    never read file B's data pages, and results must equal the unpruned
    read."""
    import pandas as pd
    from unittest import mock
    from vbpl_web_crawl_ray.pipelines import lookup as lk

    out = str(tmp_path / "zstore")
    for rnd, ids in ((1, range(0, 50)), (2, range(1000, 1050))):
        d = f"{out}/payload/round={rnd}"
        import os
        os.makedirs(d)
        pd.DataFrame({
            "image_id": [f"img{i:08d}" for i in ids],
            "caption": [f"cap {i}" for i in ids],
        }).to_parquet(f"{d}/part-0.parquet", index=False)

    files = lk._files(out, "payload")
    assert len(files) == 2
    pruned = lk.prune_files_by_stats(files, "image_id", ["img00001010"])
    assert pruned == [f for f in files if "round=2" in f]
    # keys outside every range prune everything
    assert lk.prune_files_by_stats(files, "image_id", ["img09999999"]) == []

    # physical-type mismatch (int stats vs string probe) must KEEP the
    # file conservatively, not raise TypeError (ADVICE r4)
    intdir = f"{out}/payload/round=3"
    import os
    os.makedirs(intdir)
    pd.DataFrame({"image_id": [1, 2, 3],
                  "caption": ["a", "b", "c"]}).to_parquet(
        f"{intdir}/part-0.parquet", index=False)
    files3 = lk._files(out, "payload")
    kept = lk.prune_files_by_stats(files3, "image_id", ["img00001010"])
    assert any("round=3" in f for f in kept)
    assert any("round=2" in f for f in kept)
    import shutil
    shutil.rmtree(intdir)   # restore the two-file store for the e2e part

    # end-to-end: lookup reads ONLY the matching file's data
    opened = []
    real_read = lk.pq.read_table
    with mock.patch.object(lk.pq, "read_table",
                           side_effect=lambda fs, **kw:
                           (opened.extend(fs if isinstance(fs, list) else [fs])
                            or real_read(fs, **kw))):
        row = lk.fetch_doc_by_id(out, 1010)
    assert row is not None and row["caption"] == "cap 1010"
    assert all("round=2" in f for f in opened), opened
    assert lk.fetch_doc_by_id(out, 777) is None  # in-gap key: no read at all
