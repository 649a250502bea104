"""Deterministic image payload codecs + perceptual hash.

The payload table (BASELINE.json input_hint) carries encoded image bytes
with ``fmt`` in {png, jpeg}. Real image libraries are not in this
container, so these are CLEARLY-MARKED DETERMINISTIC FAKE CODECS with the
properties the engine actually needs:

- "png"  = magic + dims + zlib(raw pixels)            -> lossless roundtrip
- "jpeg" = magic + dims + zlib(quantized pixels)      -> lossy, PSNR ~46 dB
  (quantization step 4 bounds per-pixel error to 2, comfortably above the
  40 dB per-row invariant)

The Ray-side plumbing — binary columns, batch decode inside map_batches,
PSNR validation, perceptual hashing — is real and tested; swapping in
Pillow/libjpeg changes only the two functions marked FAKE.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
_JPEG_Q = 4  # quantization step; max abs error = Q/2 = 2 -> PSNR ~46 dB


def gen_pixels(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic grayscale pixels for an image_id (uint8, shape (h, w))."""
    from ..functions.hashing import hash64_one
    rng = np.random.default_rng((hash64_one(image_id) ^ seed) & 0x7FFFFFFFFFFFFFFF)
    # smooth low-freq base + per-pixel noise; the sin*cos field is separable,
    # so build it as an outer product of 1-D waves (float32) instead of a
    # full mgrid — ~10x less memory traffic, same picture
    px = rng.uniform(0, 6.28)
    py = rng.uniform(0, 6.28)
    wave_x = np.sin(np.arange(w, dtype=np.float32) / max(4, w / 4) + px)
    wave_y = np.cos(np.arange(h, dtype=np.float32) / max(4, h / 4) + py)
    base = 128 + 80 * np.outer(wave_y, wave_x)
    noise = rng.integers(-20, 20, size=(h, w), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """FAKE codec (see module docstring). Deterministic, zlib-backed."""
    h, w = pixels.shape
    header = np.array([w, h], dtype=np.uint32).tobytes()
    if fmt == "png":
        return MAGIC_PNG + header + zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        q = (pixels.astype(np.int32) // _JPEG_Q) * _JPEG_Q + _JPEG_Q // 2
        q = np.clip(q, 0, 255).astype(np.uint8)
        return MAGIC_JPG + header + zlib.compress(q.tobytes(), 6)
    raise NotImplementedError(f"fmt {fmt!r}: real codecs are stubbed in this container")


def decode_image(data: bytes) -> np.ndarray:
    """FAKE decode — inverse of encode_image; returns uint8 (h, w)."""
    magic, header, payload = data[:4], data[4:12], data[12:]
    if magic not in (MAGIC_PNG, MAGIC_JPG):
        raise NotImplementedError("unknown image magic; real codecs are stubbed")
    w, h = np.frombuffer(header, dtype=np.uint32)
    return np.frombuffer(zlib.decompress(payload), dtype=np.uint8).reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(mse))


def block_means(pixels: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Exact block-mean downsample to (gh, gw) via two reduceat passes —
    identical to the per-cell ``.mean()`` loop (uint8 sums are integers,
    exact in float64) at a fraction of the Python overhead."""
    h, w = pixels.shape
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    s = np.add.reduceat(
        np.add.reduceat(pixels.astype(np.float64), ys[:-1], axis=0),
        xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return s / counts


def phash64(pixels: np.ndarray, grid: int = 8) -> int:
    """Average-hash: block-mean downsample to grid x grid, threshold at the
    mean -> 64-bit int. Robust to the jpeg quantization above (near-dup rows
    share phash within small Hamming distance)."""
    blocks = block_means(pixels, grid, grid)
    bits = (blocks > blocks.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def phash_batch(bodies: list[bytes]) -> np.ndarray:
    """Vectorized-over-batch phash of encoded images (decode is per-row —
    inherent to codecs — but lives inside one map_batches call)."""
    return np.array([phash64(decode_image(b)) for b in bodies], dtype=np.uint64)
