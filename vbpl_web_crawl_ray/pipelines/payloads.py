"""Document-derived pipelines that exercise the reference-parity parsers
and the multimodal stages through the driver contract (rows-only checks —
the operators are not SQL-expressible).

The driver's ``documents`` table is English synthetic text, so the
Vietnamese-structure parsers get deterministic pseudo-documents wrapped
around it: hierarchy markers derive from doc_id, body lines from the text.
Everything is a pure function of (sf_dir, doc_id) — byte-identical across
runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..sources.imaging import encode_image, gen_pixels, phash64
from ..stages import multimodal as mm
from ..stages.fulltext import parse_fulltext_batch, sectionize_pdf_batch
from ..sources.tablecache import base_dataset, base_pandas

_ROMAN = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X"]
_BIG = ["nhất", "hai", "ba", "bốn", "năm"]


def _docs(sf_dir: str) -> rd.Dataset:
    return base_dataset(sf_dir, "documents", columns=["doc_id", "text"])


def vbpl_style_docs(sf_dir: str) -> rd.Dataset:
    """Wrap each document as a Vietnamese legal pseudo-doc: big part +
    chapter headers, 3 'Điều' sections from text thirds, appendix for
    every 5th doc."""
    def wrap(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            third = max(1, len(toks) // 3)
            parts = [" ".join(toks[i * third:(i + 1) * third]) or "trống"
                     for i in range(3)]
            lines = [
                f"Phần thứ {_BIG[did % len(_BIG)]}",
                f"QUY ĐỊNH CHUNG {did}",
                f"Chương {_ROMAN[did % len(_ROMAN)]}",
                f"TÊN CHƯƠNG {did}",
                f"Điều 1. Phạm vi {did}",
                parts[0],
                f"Điều 2. Đối tượng {did}",
                parts[1],
                f"Điều 3. Hiệu lực {did}",
                parts[2],
            ]
            if did % 5 == 0:
                lines += ["PHỤ LỤC", f"DANH MỤC {did}",
                          f"Phụ lục {_ROMAN[did % 3]} BIỂU MẪU {did}"]
            lines.append("hết văn bản")
            out.append({"doc_id": did, "text": "\n".join(lines)})
        return pd.DataFrame(out)

    return _docs(sf_dir).map_batches(wrap, batch_format="pandas")


def q_fulltext_sections(sf_dir: str) -> rd.Dataset:
    """Flagship parser (M5-M7) over pseudo-docs: 3 section rows per doc
    (appendix docs delegate after section 2 -> deterministic count)."""
    return parse_fulltext_batch(vbpl_style_docs(sf_dir))


def q_pdf_sections(sf_dir: str) -> rd.Dataset:
    """PDF sectioner (M12) over anle-style pseudo-texts."""
    def wrap(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "text": [(f"Án lệ số {d}\nTình huống án lệ:\n"
                      f"{' '.join(t[:10])}\n"
                      f"Giải pháp pháp lý:\n{' '.join(t[10:20])}\n"
                      f"Chú thích: xong\nNỘI DUNG ÁN LỆ\n"
                      f"[1] {' '.join(t[20:40])}\n")
                     for d, t in zip(df["doc_id"], toks)],
        })
    return sectionize_pdf_batch(_docs(sf_dir).map_batches(wrap, batch_format="pandas"))


# The payload table is a pure function of (sf_dir, size params); the
# image synth (encode+decode+phash per row) is the expensive part, so the
# materialized dataset is memoized and shared by every payload query in
# the process — identical output by construction.
_PAYLOAD_CACHE: dict[tuple, rd.Dataset] = {}


def payload_table(sf_dir: str, img_min: int = 48, img_range: int = 33) -> rd.Dataset:
    """Deterministic image+caption payload table derived from documents
    (the input_hint schema) — image synth runs distributed in map_batches."""
    key = (sf_dir, img_min, img_range)
    hit = _PAYLOAD_CACHE.get(key)
    if hit is not None:
        return hit
    from ..sources.imaging import decode_image

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(df["doc_id"], df["text"]):
            image_id = f"img{did:08d}"
            w = img_min + did % img_range
            h = img_min + (did * 7) % img_range
            px = gen_pixels(image_id, w, h)
            fmt = "png" if did % 2 == 0 else "jpeg"
            data = encode_image(px, fmt)
            # phash of the DECODED payload — same semantics as the crawl
            # (ParseStage hashes what it fetched, not the pre-encode pixels)
            ph = phash64(decode_image(data))
            rows.append({"image_id": image_id, "bytes": data,
                         "w": w, "h": h, "fmt": fmt,
                         "caption": text[:120],
                         "phash": int(np.uint64(ph).astype(np.int64))})
        return pd.DataFrame(rows)
    ds = _docs(sf_dir).map_batches(synth, batch_format="pandas",
                                   batch_size=mm.MULTIMODAL_BATCH).materialize()
    _PAYLOAD_CACHE[key] = ds
    return ds


def q_image_features(sf_dir: str) -> rd.Dataset:
    return mm.image_features(payload_table(sf_dir))


def q_image_resize(sf_dir: str) -> rd.Dataset:
    return mm.resize_images(payload_table(sf_dir), tw=16, th=16) \
             .select_columns(["image_id", "w", "h", "fmt"])


def q_phash_near_dup(sf_dir: str) -> pd.DataFrame:
    """phash-banded Hamming near-dup over the payload table; every 10th
    image gets a jpeg-requantized twin planted so the result is non-empty."""
    base = payload_table(sf_dir)

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        from ..sources.imaging import decode_image
        extra = []
        for r in df.itertuples(index=False):
            did = int(r.image_id[3:])
            if did % 10 == 0:
                px2 = decode_image(encode_image(decode_image(r.bytes), "jpeg"))
                extra.append({"image_id": r.image_id.replace("img", "dup"),
                              "bytes": encode_image(px2, "png"),
                              "w": r.w, "h": r.h, "fmt": "png",
                              "caption": r.caption,
                              "phash": int(np.uint64(phash64(px2))
                                           .astype(np.int64))})
        return pd.concat([df, pd.DataFrame(extra)], ignore_index=True) \
            if extra else df

    return mm.phash_near_dup_pairs(
        base.map_batches(plant, batch_format="pandas"), max_hamming=2)


def audio_table(sf_dir: str, rate: int = 16000, dur_s: float = 0.5) -> rd.Dataset:
    """Deterministic audio+caption payload table derived from documents:
    each doc gets a two-tone sine mix whose frequencies are a pure
    function of doc_id (same hermetic-synthesis pattern as the image
    payload table)."""
    from ..stages.multimodal import encode_audio

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        t = np.arange(int(rate * dur_s)) / rate
        rows = []
        for did, text in zip(df["doc_id"], df["text"]):
            f1 = 220 + (did * 37) % 880
            f2 = 110 + (did * 53) % 1760
            x = 0.6 * np.sin(2 * np.pi * f1 * t) \
                + 0.3 * np.sin(2 * np.pi * f2 * t)
            rows.append({"audio_id": f"aud{did:08d}",
                         "bytes": encode_audio(x, rate),
                         "sample_rate": np.int32(rate),
                         "n_samples": np.int64(len(t)),
                         "caption": text[:120]})
        return pd.DataFrame(rows)

    return _docs(sf_dir).map_batches(synth, batch_format="pandas",
                                     batch_size=mm.MULTIMODAL_BATCH)


def q_audio_features(sf_dir: str) -> rd.Dataset:
    return mm.audio_features(audio_table(sf_dir))


def q_image_quality(sf_dir: str) -> rd.Dataset:
    """Image-side curation gate: blur/contrast/entropy signals + pass flag
    per payload image (rows-only: the synthetic payload is not SQL)."""
    return mm.image_quality(payload_table(sf_dir))


def q_image_patches(sf_dir: str) -> rd.Dataset:
    """ViT-style patchification over the payload table: one row per 16x16
    patch with grid coords + mean/std (rows-only: pixel math is not SQL).
    Downstream curation can gate/sample patches like documents."""
    return mm.image_patches(payload_table(sf_dir), patch=16)


def q_dominant_levels(sf_dir: str) -> rd.Dataset:
    """Top-3 dominant 16-level intensities per payload image — the
    dominant-color-palette stage, grayscale analogue (rows-only)."""
    return mm.dominant_levels(payload_table(sf_dir))


def q_aspect_bucket_counts(sf_dir: str) -> pd.DataFrame:
    """Aspect-ratio bucketing of the payload images (the SDXL-style
    bucket-by-shape step training loaders run before batching): integer
    arithmetic only (wide: w*4 >= h*5; tall: h*4 >= w*5; else square), so
    the compare is exact. ORACLE-BACKED through the synth spec: the
    payload dims are a pure function of doc_id (w = 48 + id % 33,
    h = 48 + 7*id % 33 — payload_table above), so the SQL twin re-derives
    them arithmetically from `documents` while THIS side reads the real
    (w, h) metadata that rode through image encode — the twin therefore
    cross-checks the actual image-plumbing path end to end."""
    imgs = payload_table(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        bucket = np.where(w * 4 >= h * 5, "wide",
                          np.where(h * 4 >= w * 5, "tall", "square"))
        return (pd.DataFrame({"bucket": bucket, "px": w * h})
                  .groupby("bucket", as_index=False)
                  .agg(n_images=("px", "size"), total_pixels=("px", "sum")))

    parts = imgs.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bucket", as_index=False).agg(
        n_images=("n_images", "sum"), total_pixels=("total_pixels", "sum"))
    return (out.astype({"n_images": "int64", "total_pixels": "int64"})
               .sort_values("bucket").reset_index(drop=True))


def q_curated_image_pack(sf_dir: str, per_bucket: int = 50) -> pd.DataFrame:
    """Image-side curation END TO END — the axis-B counterpart of
    curation.q_curated_pack's text pipeline, one flowing composition:

      quality gate (ImageQuality actor pool: blur/contrast/entropy)
        -> exact phash dedup (keep min image_id per phash — the
           (hash, id)-only shuffle shape of dedup.exact_dedup)
        -> aspect-ratio bucket (integer arithmetic)
        -> deterministic per-bucket sample (k smallest md5 hashes — the
           mergeable exact-k contract, no RNG)
        -> pack manifest: per bucket, sampled images orderd by hash with
           a running pixel offset (the byte-planning step a training
           loader needs to pre-allocate shards).

    The dataset flows through the object store between stages; the only
    driver materialization is the final <= 3*per_bucket manifest.
    Rows-only (pixel math is not SQL); repeat-run determinism is pinned
    by pytest like the other hash-decided operators."""
    from ..functions.hashing import md5_hex_prefix
    from ..stages.shuffle import bucketed_group_apply

    base = payload_table(sf_dir)

    # the gate runs INLINE: ImageQuality's output frame is row-aligned
    # with its input batch, so the metadata rides through by assignment
    # and the blobs drop right here — no join, no shuffle, one decode
    class GateAndStrip:
        def __init__(self):
            self.quality = mm.ImageQuality()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = self.quality(df)
            keep = (q["passed"] == 1).to_numpy()
            return pd.DataFrame({
                "image_id": df["image_id"].to_numpy()[keep],
                "phash": df["phash"].to_numpy(np.int64)[keep],
                "w": df["w"].to_numpy(np.int64)[keep],
                "h": df["h"].to_numpy(np.int64)[keep]})

    passed = base.map_batches(GateAndStrip, batch_format="pandas",
                              batch_size=mm.MULTIMODAL_BATCH,
                              concurrency=(1, 8))

    def dedup_min_id(g: pd.DataFrame) -> pd.DataFrame:
        # keep min image_id per phash (exact: phash is the content key)
        idx = g.groupby("phash")["image_id"].idxmin()
        return g.loc[idx, ["image_id", "phash", "w", "h"]]

    uniq = bucketed_group_apply(passed, "phash", dedup_min_id)

    def bucket_and_hash(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        df = df.assign(
            bucket=np.where(w * 4 >= h * 5, "wide",
                            np.where(h * 4 >= w * 5, "tall", "square")),
            hx=md5_hex_prefix("cip:" + df["image_id"].astype(str), 16),
            n_px=w * h)
        # per-batch combiner: at most per_bucket rows per bucket survive
        return (df.sort_values(["bucket", "hx"])
                  .groupby("bucket", as_index=False).head(per_bucket))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["bucket", "hx"])
              .groupby("bucket", as_index=False).head(per_bucket))
        g = g.sort_values(["bucket", "hx"]).reset_index(drop=True)
        g["offset_px"] = (g.groupby("bucket")["n_px"].cumsum()
                          - g["n_px"])
        return g[["bucket", "image_id", "w", "h", "n_px", "offset_px"]]

    out = bucketed_group_apply(uniq, "bucket", pack,
                               partial_fn=bucket_and_hash).to_pandas()
    return (out.astype({"n_px": "int64", "offset_px": "int64"})
               .sort_values(["bucket", "offset_px"]).reset_index(drop=True))


def q_crop_resize_plan(sf_dir: str, target: int = 64) -> pd.DataFrame:
    """Deterministic preprocessing PLAN per payload image: scale the
    shorter side to ``target`` (integer floor scaling) and center-crop
    target x target — the resize/crop geometry a vision loader computes
    before touching a pixel. Pure integer arithmetic over the REAL (w, h)
    metadata that rode through image encode; ORACLE-BACKED through the
    synth spec (dims are a pure function of doc_id), so the twin
    cross-checks the image-plumbing path the same way aspect_bucket_counts
    does. Per-batch map only — no shuffle, nothing but the plan rows move."""
    imgs = payload_table(sf_dir).select_columns(["image_id", "w", "h"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        s = np.minimum(w, h)
        nw = (w * target) // s
        nh = (h * target) // s
        return pd.DataFrame({"image_id": df["image_id"].to_numpy(),
                             "w": w, "h": h,
                             "new_w": nw, "new_h": nh,
                             "crop_x": (nw - target) // 2,
                             "crop_y": (nh - target) // 2})

    out = imgs.map_batches(plan, batch_format="pandas").to_pandas()
    return (out.astype({c: "int64" for c in
                        ("w", "h", "new_w", "new_h", "crop_x", "crop_y")})
               .sort_values("image_id").reset_index(drop=True))


def q_dhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """dhash-banded Hamming near-dup over the payload table — the
    gradient-sign perceptual hash beside phash's mean-threshold one
    (local structure vs global brightness): every 10th image gets a
    jpeg-requantized twin planted; the dhash column is computed by an
    actor-pool decode pass (one per-batch call, decode per row — the
    codec's inherent unit) and pairs resolve through the SAME banded
    hash_near_dup_pairs machinery (pigeonhole chunks, in-bucket popcount
    verify). Rows-only: planted-twin recovery is pytest-pinned."""
    from ..sources.imaging import decode_image, dhash64
    base = payload_table(sf_dir)

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        extra = []
        for r in df.itertuples(index=False):
            did = int(r.image_id[3:])
            if did % 10 == 0:
                px2 = decode_image(encode_image(decode_image(r.bytes), "jpeg"))
                extra.append({"image_id": r.image_id.replace("img", "dup"),
                              "bytes": encode_image(px2, "png"),
                              "w": r.w, "h": r.h, "fmt": "png",
                              "caption": r.caption, "phash": r.phash})
        return pd.concat([df, pd.DataFrame(extra)], ignore_index=True) \
            if extra else df

    def add_dhash(df: pd.DataFrame) -> pd.DataFrame:
        dh = np.array([dhash64(decode_image(b)) for b in df["bytes"]],
                      dtype=np.uint64)
        return pd.DataFrame({"image_id": df["image_id"].to_numpy(),
                             "dhash": dh.astype(np.int64)})

    hashed = (base.map_batches(plant, batch_format="pandas")
                  .map_batches(add_dhash, batch_format="pandas"))
    return mm.hash_near_dup_pairs(hashed, hash_col="dhash",
                                  id_col="image_id", max_hamming=2)


def q_augment_manifest(sf_dir: str) -> pd.DataFrame:
    """Deterministic augmentation manifest — the seeding discipline a
    reproducible training pipeline needs: every image's augmentation
    parameters (horizontal flip, quarter-rotations, brightness jitter)
    derive from md5(image_id) nibbles, so any worker on any run computes
    the identical plan with NO shared RNG state to coordinate. Pure
    per-batch map; the oracle derives the same nibbles with SQL md5 —
    everything integer, exact."""
    import hashlib

    imgs = payload_table(sf_dir).select_columns(["image_id"])

    def manifest(df: pd.DataFrame) -> pd.DataFrame:
        hexes = [hashlib.md5(i.encode()).hexdigest()
                 for i in df["image_id"]]
        return pd.DataFrame({
            "image_id": df["image_id"].to_numpy(),
            "flip_h": np.array([int(h[0], 16) % 2 for h in hexes],
                               np.int64),
            "rot90": np.array([int(h[1], 16) % 4 for h in hexes],
                              np.int64),
            "jitter": np.array([int(h[2:4], 16) % 21 - 10 for h in hexes],
                               np.int64)})

    out = imgs.map_batches(manifest, batch_format="pandas").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def q_mosaic_grid_plan(sf_dir: str) -> pd.DataFrame:
    """Mosaic/packing grid plan: images group by aspect bucket, order by
    image_id inside their bucket, and tile into 2x2 mosaics (mosaic
    index, grid x, grid y) — the deterministic collage-packing layout an
    augmentation loader materializes. Buckets are few and bounded, so
    each co-locates whole in a hash bucket and one cumcount resolves
    every position; everything integer. The oracle re-derives bucket
    membership from the synth dims and states the identical tiling
    arithmetic over ROW_NUMBER."""
    from ..stages.shuffle import bucketed_group_apply

    imgs = payload_table(sf_dir).select_columns(["image_id", "w", "h"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        bucket = np.where(w * 4 >= h * 5, "wide",
                          np.where(h * 4 >= w * 5, "tall", "square"))
        return pd.DataFrame({"image_id": df["image_id"].to_numpy(),
                             "bucket": bucket})

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "image_id"], kind="mergesort")
        rn = g.groupby("bucket", sort=False).cumcount().to_numpy()  # 0-based
        return pd.DataFrame({"image_id": g["image_id"].to_numpy(),
                             "bucket": g["bucket"].to_numpy(),
                             "mosaic_id": rn // 4,
                             "grid_x": rn % 2,
                             "grid_y": (rn % 4) // 2})

    out = bucketed_group_apply(
        imgs.map_batches(pre, batch_format="pandas"), "bucket", tile).to_pandas()
    return (out.astype({c: "int64" for c in ("mosaic_id", "grid_x", "grid_y")})
               .sort_values("image_id").reset_index(drop=True))


def q_caption_stats_by_aspect(sf_dir: str) -> pd.DataFrame:
    """CROSS-MODAL rollup — caption text statistics per image shape
    bucket (the axis-A x axis-B audit a captioned-image curator runs to
    spot caption-poor shapes): token/char counts of the REAL caption
    column that rode through the payload synth, grouped by the same
    integer aspect buckets as q_aspect_bucket_counts. All-integer
    partials per batch; ORACLE-BACKED through the synth spec (dims are
    a pure function of doc_id, caption = text[:120]), so the twin
    cross-checks the joint image+caption plumbing end to end."""
    imgs = payload_table(sf_dir).select_columns(["w", "h", "caption"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        bucket = np.where(w * 4 >= h * 5, "wide",
                          np.where(h * 4 >= w * 5, "tall", "square"))
        toks = df["caption"].str.split(" ").str.len().to_numpy(np.int64)
        chars = df["caption"].str.len().to_numpy(np.int64)
        return (pd.DataFrame({"bucket": bucket, "toks": toks,
                              "chars": chars, "mx": toks})
                .groupby("bucket", as_index=False)
                .agg(n_images=("toks", "size"), total_tokens=("toks", "sum"),
                     total_chars=("chars", "sum"), max_tokens=("mx", "max")))

    parts = imgs.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bucket", as_index=False).agg(
        n_images=("n_images", "sum"), total_tokens=("total_tokens", "sum"),
        total_chars=("total_chars", "sum"), max_tokens=("max_tokens", "max"))
    return (out.astype({c: "int64" for c in ("n_images", "total_tokens",
                                             "total_chars", "max_tokens")})
               .sort_values("bucket").reset_index(drop=True))


def q_format_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-encoding-format dimension profile of the payload store (the
    format-mix audit before choosing decode pools): count, total pixels,
    min/max of each axis, and the wide-image count — every aggregate an
    order-free integer (SUM/MIN/MAX/COUNT), merged from per-batch
    partials. ORACLE-BACKED through the synth spec (fmt alternates by
    doc_id parity, dims are doc_id formulas), cross-checking the REAL
    fmt/w/h metadata that rode through image encode."""
    imgs = payload_table(sf_dir).select_columns(["fmt", "w", "h"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        return (pd.DataFrame({"fmt": df["fmt"].to_numpy(),
                              "px": w * h, "w": w, "h": h,
                              "wide": (w > h).astype(np.int64)})
                .groupby("fmt", as_index=False)
                .agg(n_images=("px", "size"), total_pixels=("px", "sum"),
                     min_w=("w", "min"), max_w=("w", "max"),
                     min_h=("h", "min"), max_h=("h", "max"),
                     n_wide=("wide", "sum")))

    parts = imgs.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("fmt", as_index=False).agg(
        n_images=("n_images", "sum"), total_pixels=("total_pixels", "sum"),
        min_w=("min_w", "min"), max_w=("max_w", "max"),
        min_h=("min_h", "min"), max_h=("max_h", "max"),
        n_wide=("n_wide", "sum"))
    ints = [c for c in out.columns if c != "fmt"]
    return (out.astype({c: "int64" for c in ints})
               .sort_values("fmt").reset_index(drop=True))


def q_tile_pyramid_plan(sf_dir: str, tile: int = 16) -> pd.DataFrame:
    """Multi-resolution tiling PLAN over the payload store — the pyramid
    a vision indexer materializes per image: halve (w, h) per level while
    the short side still holds a full tile, and count ceil-division tiles
    at each level. Pure integer geometry over the REAL (w, h) metadata
    that rode through image encode (the oracle re-derives dims from the
    synth spec, cross-checking the image plumbing end to end, the
    aspect_bucket_counts pattern); per-batch (level, n, tiles) partials
    are all that leave a block."""
    imgs = payload_table(sf_dir).select_columns(["w", "h"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        rows = []
        level = 0
        while True:
            wl, hl = w >> level, h >> level
            keep = np.minimum(wl, hl) >= tile
            if not keep.any():
                break
            tiles = ((wl[keep] + tile - 1) // tile) \
                * ((hl[keep] + tile - 1) // tile)
            rows.append({"level": np.int64(level),
                         "n_images": np.int64(int(keep.sum())),
                         "total_tiles": np.int64(int(tiles.sum()))})
            level += 1
        return pd.DataFrame(rows)

    out = (imgs.map_batches(plan, batch_format="pandas").to_pandas()
           .groupby("level", as_index=False).sum())
    return (out.astype({c: "int64" for c in out.columns})
               .sort_values("level").reset_index(drop=True))


def q_letterbox_pad_plan(sf_dir: str, target: int = 224) -> pd.DataFrame:
    """Letterbox geometry PLAN: aspect-preserving resize of the long side
    to ``target`` with integer floor scaling (new = dim * target //
    long_side — exact, no float scale factor exists), then the pad each
    side needs to reach target x target. The report groups images by
    their (pad_x, pad_y) cell — the padding-waste histogram a batching
    loader uses to pick bucket shapes. Integer geometry over the REAL
    (w, h) metadata; the oracle re-derives dims from the synth spec."""
    imgs = payload_table(sf_dir).select_columns(["w", "h"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        m = np.maximum(w, h)
        nw = (w * target) // m
        nh = (h * target) // m
        return (pd.DataFrame({"pad_x": target - nw, "pad_y": target - nh,
                              "n_images": np.int64(1)})
                .groupby(["pad_x", "pad_y"], as_index=False).sum())

    out = (imgs.map_batches(plan, batch_format="pandas").to_pandas()
           .groupby(["pad_x", "pad_y"], as_index=False).sum())
    return (out.astype({c: "int64" for c in out.columns})
               .sort_values(["pad_x", "pad_y"]).reset_index(drop=True))


def q_caption_truncation_audit(sf_dir: str) -> pd.DataFrame:
    """Caption truncation audit — the data-quality check a captioning
    pipeline runs on its own clipping rule: the synth caption is
    text[:120], so a caption whose source text runs past 120 chars AND
    whose 121st char is not a space ends MID-TOKEN (its last token is a
    fragment no tokenizer will match). The documents side projects to a
    121-char prefix BEFORE the one bucketed join (the full text never
    moves), the REAL caption+fmt columns ride from the payload store,
    and per-batch (fmt, n, truncated) integers are all that leave. The
    oracle re-states the clip rule on the documents table, so the audit
    cross-checks the caption plumbing itself."""
    from ..stages.shuffle import bucketed_join

    imgs = payload_table(sf_dir).select_columns(["image_id", "fmt",
                                                 "caption"])

    def img_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["image_id"].str[3:].astype(np.int64),
            "fmt": df["fmt"].to_numpy(),
            "cap_len": df["caption"].str.len().to_numpy(np.int64)})

    def doc_prefix(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "text_len": df["text"].str.len().to_numpy(np.int64),
            "ch121": df["text"].str.slice(120, 121).to_numpy()})

    joined = bucketed_join(
        imgs.map_batches(img_key, batch_format="pandas"),
        _docs(sf_dir).map_batches(doc_prefix, batch_format="pandas"),
        on="doc_id")

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        trunc = ((df["text_len"].to_numpy(np.int64) > 120)
                 & (df["ch121"].to_numpy() != " ")
                 & (df["cap_len"].to_numpy(np.int64) == 120))
        return (pd.DataFrame({"fmt": df["fmt"].to_numpy(),
                              "n_images": np.int64(1),
                              "n_truncated": trunc.astype(np.int64)})
                .groupby("fmt", as_index=False).sum())

    out = (joined.map_batches(audit, batch_format="pandas").to_pandas()
           .groupby("fmt", as_index=False).sum())
    out = out.astype({"n_images": "int64", "n_truncated": "int64"})
    out["truncated_share"] = (out["n_truncated"].to_numpy(np.float64)
                              / out["n_images"].to_numpy(np.float64))
    return out.sort_values("fmt").reset_index(drop=True)


def q_phash_bit_balance(sf_dir: str) -> pd.DataFrame:
    """Perceptual-hash bit-balance audit (rows-only: phash is computed
    from decoded pixels, not SQL-visible): per bit position 0..63, how
    many images set it. A healthy 64-bit phash family keeps every
    position near 50% — a stuck bit means that band carries no
    discriminating power for near-dup banding. Vectorized unpackbits
    over the uint64 view per batch; 64 integer cells leave each block.
    Determinism + range are pytest-pinned."""
    imgs = payload_table(sf_dir).select_columns(["phash"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["phash"].to_numpy(np.int64).astype(np.uint64)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        return pd.DataFrame({"bit": np.arange(64, dtype=np.int64),
                             "n_set": bits.sum(axis=0).astype(np.int64),
                             "n_images": np.int64(len(df))})

    out = (imgs.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("bit", as_index=False).sum())
    return (out.astype({c: "int64" for c in out.columns})
               .sort_values("bit").reset_index(drop=True))


def q_payload_lance_roundtrip(sf_dir: str) -> pd.DataFrame:
    """The input_hint's storage contract under the oracle: the full
    image+caption payload table (image_id, bytes, w, h, fmt, caption,
    phash) writes through the Lance seam (real `lance` when the library
    exists, the manifest-marked parquet stand-in here), reads BACK
    through the same seam, and the re-read per-format counts + pixel
    totals are what the SQL twin checks — a row lost or duplicated by
    the sink, the manifest, or the partitioned read breaks the count.
    Scratch is keyed by sf and overwritten, never appended."""
    from ..sources import lancefmt

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"/tmp/vbpl_lance_{tag}"
    lancefmt.write_table(payload_table(sf_dir), path)
    back = lancefmt.read_table(path, columns=["fmt", "w", "h"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        return (pd.DataFrame({"fmt": df["fmt"].to_numpy(),
                              "n_images": np.int64(1), "pixels": w * h})
                .groupby("fmt", as_index=False).sum())

    out = (back.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("fmt", as_index=False).sum())
    return (out.astype({"n_images": "int64", "pixels": "int64"})
               .sort_values("fmt").reset_index(drop=True))


def q_image_tier_plan(sf_dir: str) -> pd.DataFrame:
    """Hot/cold tiering plan for the image store: images at or above the
    exact 90th-percentile pixel count go cold. The boundary resolves by
    the integer rank rule (smallest pixel count whose 100*rank >= 90*n)
    over the pixel COUNT-OF-COUNTS histogram — bounded by the distinct
    dim grid, so no sort and no value shuffle, the selection-quantile
    machinery in its smallest form — then one more streaming pass counts
    (fmt, tier) cells. Integer geometry over the REAL encoded dims; the
    oracle re-derives dims and states the same rank rule."""
    imgs = payload_table(sf_dir).select_columns(["fmt", "w", "h"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        px = df["w"].to_numpy(np.int64) * df["h"].to_numpy(np.int64)
        return (pd.DataFrame({"px": px, "n": np.int64(1)})
                .groupby("px", as_index=False).sum())

    h = (imgs.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("px", as_index=False).sum().sort_values("px"))
    total = int(h["n"].sum())
    cum = h["n"].cumsum().to_numpy(np.int64)
    p90 = int(h["px"].to_numpy()[np.argmax(100 * cum >= 90 * total)])

    def tiers(df: pd.DataFrame) -> pd.DataFrame:
        px = df["w"].to_numpy(np.int64) * df["h"].to_numpy(np.int64)
        return (pd.DataFrame({"fmt": df["fmt"].to_numpy(),
                              "tier": np.where(px >= p90, "cold", "hot"),
                              "n_images": np.int64(1), "pixels": px})
                .groupby(["fmt", "tier"], as_index=False).sum())

    out = (imgs.map_batches(tiers, batch_format="pandas").to_pandas()
           .groupby(["fmt", "tier"], as_index=False).sum())
    return (out.astype({"n_images": "int64", "pixels": "int64"})
               .sort_values(["fmt", "tier"]).reset_index(drop=True))


def q_image_bytes_stats(sf_dir: str) -> pd.DataFrame:
    """Encoded-payload byte accounting per format (rows-only: encoded
    sizes are the codec's output, not SQL-derivable): count, total and
    min/max encoded bytes, plus total pixels — the numerator/denominator
    a decode-pool sizer divides. All integer partials off the REAL
    `bytes` column that rode through encode; determinism is
    pytest-pinned."""
    imgs = payload_table(sf_dir).select_columns(["fmt", "bytes", "w", "h"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nb = df["bytes"].map(len).to_numpy(np.int64)
        px = df["w"].to_numpy(np.int64) * df["h"].to_numpy(np.int64)
        return (pd.DataFrame({"fmt": df["fmt"].to_numpy(),
                              "n_images": np.int64(1), "total_bytes": nb,
                              "min_bytes": nb, "max_bytes": nb,
                              "total_pixels": px})
                .groupby("fmt", as_index=False)
                .agg(n_images=("n_images", "sum"),
                     total_bytes=("total_bytes", "sum"),
                     min_bytes=("min_bytes", "min"),
                     max_bytes=("max_bytes", "max"),
                     total_pixels=("total_pixels", "sum")))

    out = (imgs.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("fmt", as_index=False)
           .agg(n_images=("n_images", "sum"),
                total_bytes=("total_bytes", "sum"),
                min_bytes=("min_bytes", "min"),
                max_bytes=("max_bytes", "max"),
                total_pixels=("total_pixels", "sum")))
    ints = [c for c in out.columns if c != "fmt"]
    return (out.astype({c: "int64" for c in ints})
               .sort_values("fmt").reset_index(drop=True))
