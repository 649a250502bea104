"""Correctness (not just rows-only) checks for the payload/parser queries."""

import numpy as np

from vbpl_web_crawl_ray.pipelines import payloads as P
from vbpl_web_crawl_ray.sources.imaging import decode_image, gen_pixels
from vbpl_web_crawl_ray.stages.fulltext import parse_fulltext


def test_fulltext_sections_query_correct(sf_dir):
    out = P.q_fulltext_sections(sf_dir).to_pandas()
    # every doc parses to exactly 2 (appendix docs, did%5==0, delegate
    # after section 2) or 3 sections
    per_doc = out[out["section_number"] > 0].groupby("vbpl_id").size()
    assert set(per_doc.unique()) <= {2, 3}
    # spot-check one doc against a direct parse of the same pseudo-doc
    docs = P.vbpl_style_docs(sf_dir).to_pandas()
    row = docs[docs["doc_id"] == 1].iloc[0]
    secs, _ = parse_fulltext(1, row["text"].split("\n"))
    got = out[(out["vbpl_id"] == 1) & (out["section_number"] > 0)] \
        .sort_values("section_number")
    assert list(got["section_name"]) == [s["section_name"] for s in secs]
    assert list(got["section_content"]) == [s["section_content"] for s in secs]


def test_pdf_sections_query_correct(sf_dir):
    out = P.q_pdf_sections(sf_dir).to_pandas()
    assert (out["content"].str.startswith("\n[1]")).all()
    assert (out["context"].str.len() > 0).all()


def test_payload_table_invariant(sf_dir):
    t = P.payload_table(sf_dir).to_pandas()
    assert len(t) > 0
    r = t.iloc[0]
    px = decode_image(r["bytes"])
    assert px.shape == (r["h"], r["w"])
    ref = gen_pixels(r["image_id"], r["w"], r["h"])
    if r["fmt"] == "png":
        assert np.array_equal(px, ref)
    else:
        assert np.abs(px.astype(int) - ref.astype(int)).max() <= 2


def test_image_features_sane(sf_dir):
    f = P.q_image_features(sf_dir).to_pandas()
    assert (f["px_std"] > 0).all()
    assert ((f["px_mean"] > 0) & (f["px_mean"] < 255)).all()
    # phash from features equals the generator-side phash
    t = P.payload_table(sf_dir).to_pandas()[["image_id", "phash"]]
    m = f.merge(t, on="image_id", suffixes=("_f", "_t"))
    assert (m["phash_f"] == m["phash_t"]).all()
