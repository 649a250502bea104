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


def test_image_patches_grid_and_known_signal(sf_dir):
    import pandas as pd
    from vbpl_web_crawl_ray.sources.imaging import encode_image
    from vbpl_web_crawl_ray.stages.multimodal import ImagePatches

    # constant 40x56 image, 16px patches -> 2x3 grid, mean=c, std=0
    px = np.full((40, 56), 77, np.uint8)
    df = pd.DataFrame({"image_id": ["x"],
                       "bytes": [encode_image(px, "png")]})
    out = ImagePatches(patch=16)(df)
    assert len(out) == 2 * 3
    assert set(zip(out["py"], out["px"])) == {(y, x)
                                              for y in range(2)
                                              for x in range(3)}
    assert (out["patch_mean"] == 77.0).all()
    assert (out["patch_std"] == 0.0).all()
    # smaller than one patch -> zero rows, typed empty
    tiny = pd.DataFrame({"image_id": ["t"],
                         "bytes": [encode_image(px[:8, :8], "png")]})
    empty = ImagePatches(patch=16)(tiny)
    assert len(empty) == 0 and list(empty.columns) == list(out.columns)


def test_image_patches_query_deterministic(sf_dir):
    a = P.q_image_patches(sf_dir).to_pandas().sort_values(
        ["image_id", "py", "px"]).reset_index(drop=True)
    b = P.q_image_patches(sf_dir).to_pandas().sort_values(
        ["image_id", "py", "px"]).reset_index(drop=True)
    assert a.equals(b)
    # grid count per image == (h//16)*(w//16) from the payload metadata
    t = P.payload_table(sf_dir).to_pandas()
    want = ((t["h"] // 16) * (t["w"] // 16)).sum()
    assert len(a) == want


def test_dominant_levels_constant_and_tie_break(sf_dir):
    import pandas as pd
    from vbpl_web_crawl_ray.sources.imaging import encode_image
    from vbpl_web_crawl_ray.stages.multimodal import DominantLevels

    px = np.full((20, 20), 0x5A, np.uint8)          # level 5 everywhere
    out = DominantLevels()(pd.DataFrame(
        {"image_id": ["c"], "bytes": [encode_image(px, "png")]}))
    r = out.iloc[0]
    assert (r["lvl_1"], r["share_1"]) == (5, 1.0)
    # remaining slots: zero-count ties resolve toward the LOWER level
    assert (r["lvl_2"], r["lvl_3"]) == (0, 1)
    assert r["share_2"] == r["share_3"] == 0.0


def test_aspect_buckets_cover_all_images(sf_dir):
    out = P.q_aspect_bucket_counts(sf_dir)
    t = P.payload_table(sf_dir).to_pandas()
    assert out["n_images"].sum() == len(t)
    assert out["total_pixels"].sum() == int((t["w"] * t["h"]).sum())


def test_curated_image_pack_contract(sf_dir):
    a = P.q_curated_image_pack(sf_dir)
    b = P.q_curated_image_pack(sf_dir)
    assert a.equals(b), "hash-decided composition must be deterministic"
    # offsets are an exact prefix sum per bucket
    for bk, g in a.groupby("bucket"):
        off = g["offset_px"].to_numpy()
        assert off[0] == 0
        assert (off[1:] == (g["offset_px"] + g["n_px"]).to_numpy()[:-1]).all()
    # every packed image passed the gate and is its phash family's min id
    t = P.payload_table(sf_dir).to_pandas()
    from vbpl_web_crawl_ray.stages.multimodal import ImageQuality
    q = ImageQuality()(t)
    passed = set(q.loc[q["passed"] == 1, "image_id"])
    assert set(a["image_id"]) <= passed
    fam = (t[t["image_id"].isin(passed)]
           .groupby("phash")["image_id"].min())
    assert set(a["image_id"]) <= set(fam)
    # per-bucket cap respected
    assert (a.groupby("bucket").size() <= 50).all()


def test_phash_bit_balance_shape_and_determinism(sf_dir):
    from vbpl_web_crawl_ray.pipelines.payloads import q_phash_bit_balance

    a = q_phash_bit_balance(sf_dir)
    assert list(a["bit"]) == list(range(64))
    assert (a["n_images"] == a["n_images"].iloc[0]).all()
    assert ((a["n_set"] >= 0) & (a["n_set"] <= a["n_images"])).all()
    # no stuck bit on the synth corpus: every position varies
    assert (a["n_set"] > 0).all() and (a["n_set"] < a["n_images"]).all()
    b = q_phash_bit_balance(sf_dir)
    assert a.equals(b)


def test_image_bytes_stats_deterministic(sf_dir):
    from vbpl_web_crawl_ray.pipelines.payloads import q_image_bytes_stats

    a = q_image_bytes_stats(sf_dir)
    b = q_image_bytes_stats(sf_dir)
    assert a.equals(b)
    assert set(a["fmt"]) == {"png", "jpeg"}
    assert (a["min_bytes"] > 0).all()
    assert (a["total_bytes"] >= a["max_bytes"]).all()
