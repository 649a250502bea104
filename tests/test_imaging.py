"""Image codec + phash unit tests (payload invariant plumbing, input_hint)."""

import numpy as np
import pytest

from vbpl_web_crawl_ray.sources import imaging


def test_png_lossless_roundtrip():
    px = imaging.gen_pixels("img00000001", 64, 48)
    assert px.shape == (48, 64) and px.dtype == np.uint8
    out = imaging.decode_image(imaging.encode_image(px, "png"))
    assert np.array_equal(px, out)


def test_jpeg_lossy_psnr_above_40():
    px = imaging.gen_pixels("img00000002", 100, 80)
    out = imaging.decode_image(imaging.encode_image(px, "jpeg"))
    assert not np.array_equal(px, out)            # actually lossy
    assert imaging.psnr(px, out) >= 40.0          # per-row invariant bound


def test_gen_pixels_deterministic():
    a = imaging.gen_pixels("imgX", 40, 40)
    b = imaging.gen_pixels("imgX", 40, 40)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, imaging.gen_pixels("imgY", 40, 40))


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        imaging.encode_image(np.zeros((4, 4), np.uint8), "webp")


def test_phash_stable_and_near_dup_robust():
    px = imaging.gen_pixels("imgZ", 96, 96)
    h1 = imaging.phash64(px)
    # jpeg quantization must not move the phash far (near-dup capability)
    h2 = imaging.phash64(imaging.decode_image(imaging.encode_image(px, "jpeg")))
    assert bin(h1 ^ h2).count("1") <= 2
    other = imaging.phash64(imaging.gen_pixels("imgW", 96, 96))
    assert bin(h1 ^ other).count("1") > 2


def test_image_quality_signals():
    """Blur/contrast/entropy quality signals: a flat image fails every
    gate (zero Laplacian variance, zero contrast, zero entropy); the
    synthetic wave+noise pixels pass; values are deterministic."""
    import pandas as pd
    from vbpl_web_crawl_ray.stages.multimodal import ImageQuality

    flat = np.full((32, 32), 128, dtype=np.uint8)
    busy = imaging.gen_pixels("imgbusy", 32, 32)
    df = pd.DataFrame({
        "image_id": ["flat", "busy"],
        "bytes": [imaging.encode_image(flat, "png"),
                  imaging.encode_image(busy, "png")]})
    q = ImageQuality()
    out = q(df).set_index("image_id")
    assert out.loc["flat", ["blur_score", "contrast", "entropy"]].sum() == 0
    assert out.loc["flat", "passed"] == 0
    assert out.loc["busy", "blur_score"] > 10
    assert out.loc["busy", "entropy"] > 2
    assert out.loc["busy", "passed"] == 1
    out2 = ImageQuality()(df).set_index("image_id")
    assert out.equals(out2)
