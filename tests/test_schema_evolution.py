"""Versioned-schema reader conformance (the Alembic analogue; reference
alembic/versions/ x12 — tables grew columns over time).

Migration scenario the verdict asked for: a store crawled under the old
15-column META layout, then "upgraded" (engine now writes the 16-column
surface) and re-crawled — the reader must union both layouts with typed
nulls for the added columns, and the S9 point-lookup/preview surface must
keep working over the mixed store."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vbpl_web_crawl_ray.pipelines.crawl import CrawlEngine
from vbpl_web_crawl_ray.pipelines.lookup import fetch_doc_by_id, preview_latest
from vbpl_web_crawl_ray.sources.schema_evolution import (
    CURRENT_META_VERSION, META_V1, META_V2, META_VERSIONS, evolve_table,
    group_files_by_schema, read_meta_versioned, read_versioned_dataset)
from vbpl_web_crawl_ray.sources.simweb import SimWeb, SimWebConfig
from vbpl_web_crawl_ray.stages.parse import META_SCHEMA

CAPS = tuple(f"Văn bản mẫu số {i} về quản lý đất đai cấp {i % 3}"
             for i in range(12))
CFG = SimWebConfig(n_hosts=2, pages_per_host=2, docs_per_page=3,
                   captions=CAPS, flaky_rate=0.0, missing_rate=0.0)


@pytest.fixture(scope="module")
def mixed_store(tmp_path_factory):
    """Crawl once (current schema), then rewrite the meta store as three
    era slices: round=1 in the initial 7-column layout, round=2 in the
    round-2 15-column layout, round=3 in the current 16-column one — a
    store that was crawled, migrated, re-crawled, migrated, re-crawled."""
    out = str(tmp_path_factory.mktemp("evo"))
    eng = CrawlEngine(CFG, out, num_partitions=2)
    eng.seed(SimWeb(CFG).seed_urls())
    eng.run(max_rounds=8)
    orig = sorted(glob.glob(f"{out}/meta/round=*/*.parquet"))
    assert orig, "crawl produced no meta"
    t = pa.concat_tables(
        pq.read_table(f).select([fld.name for fld in META_SCHEMA])
        for f in orig)
    assert t.num_rows >= 3
    for f in orig:
        os.remove(f)
    shutil.rmtree(f"{out}/meta", ignore_errors=True)
    cut1, cut2 = t.num_rows // 3, 2 * (t.num_rows // 3)
    eras = {1: (t.slice(0, cut1), META_V1),
            2: (t.slice(cut1, cut2 - cut1), META_V2),
            3: (t.slice(cut2), META_SCHEMA)}
    downgraded = {}
    for rnd, (slc, schema) in eras.items():
        d = f"{out}/meta/round={rnd}"
        os.makedirs(d, exist_ok=True)
        f = f"{d}/part-era{rnd}.parquet"
        pq.write_table(slc.select([fld.name for fld in schema]), f)
        if schema is not META_SCHEMA:
            downgraded[f] = schema
    files = sorted(glob.glob(f"{out}/meta/round=*/*.parquet"))
    return out, files, downgraded


def test_evolve_table_fills_casts_drops():
    t = pa.table({"doc_id": pa.array(["1", "2"]),
                  "title": pa.array(["a", "b"]),
                  "extra_hive_round": pa.array([1, 1])})
    target = pa.schema([("doc_id", pa.string()), ("title", pa.string()),
                        ("state", pa.string()), ("rank", pa.int64())])
    got = evolve_table(t, target, defaults={"rank": 7})
    assert got.schema == target
    assert got.column("state").null_count == 2      # typed null fill
    assert got.column("rank").to_pylist() == [7, 7]  # registered default
    assert "extra_hive_round" not in got.column_names


def test_versions_are_append_only_prefixes():
    names = [f.name for f in META_SCHEMA]
    for v, schema in META_VERSIONS.items():
        assert [f.name for f in schema] == names[:len(schema)]
    assert META_VERSIONS[CURRENT_META_VERSION] == META_SCHEMA


def test_mixed_store_reads_as_one_current_table(mixed_store):
    out, files, downgraded = mixed_store
    groups = group_files_by_schema(files)
    assert len(groups) >= 2  # the store genuinely spans layouts
    ds = read_meta_versioned(out)
    df = ds.to_pandas()
    assert list(df.columns) == [f.name for f in META_SCHEMA]
    # every meta row from every round survives the union
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert len(df) == total > 0
    # rows from downgraded rounds carry typed nulls in the added columns;
    # v1 rounds lack sub_title, v2 rounds lack org_pdf_link
    v1_rows = sum(pq.read_metadata(f).num_rows
                  for f, s in downgraded.items() if s is META_V1)
    assert (df["sub_title"].isna().sum() >= v1_rows > 0)
    assert df["org_pdf_link"].isna().sum() >= len(downgraded)
    # surviving old columns keep their values (spot check: no doc_id lost)
    assert df["doc_id"].notna().all()


def test_point_lookup_and_preview_over_mixed_store(mixed_store):
    out, _, _ = mixed_store
    row = fetch_doc_by_id(out, 0)
    assert row is not None and row["meta"] is not None
    assert set(row["meta"]) >= {f.name for f in META_SCHEMA}
    prev = preview_latest(out, limit=5).to_pandas()
    assert 0 < len(prev) <= 5
    assert prev["issuance_date"].notna().all()


def test_empty_store_yields_typed_empty_dataset():
    # contract: downstream stages see a stable SCHEMA even with no rows
    # (Ray's to_pandas collapses 0-row datasets, so assert on the dataset)
    ds = read_versioned_dataset([], META_SCHEMA)
    assert ds.schema().names == [f.name for f in META_SCHEMA]
    assert ds.count() == 0


def test_old_reader_version_projects_new_files(mixed_store):
    """Reading AT an old version (a v2-era consumer over a store that
    already has v3 files) projects away the newer columns — both
    directions of the migration work."""
    out, _, _ = mixed_store
    df = read_meta_versioned(out, version=2).to_pandas()
    assert list(df.columns) == [f.name for f in META_V2]
    assert len(df) > 0
