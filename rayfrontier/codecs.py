"""Deterministic image codecs (numpy only — PIL/cv2 are unavailable in-sandbox).

Two formats, matching the ``fmt`` column of the input_hint schema:

* ``ppm``  — lossless: standard binary PPM (P6) header + raw RGB bytes.
* ``qjpg`` — lossy: uniform quantization with step 4 (round-to-nearest).
  Max per-channel error is 2, so worst-case MSE <= 4 and
  PSNR >= 10*log10(255^2/4) ~= 42.1 dB — comfortably above the 40 dB
  per-row invariant required by BASELINE.json's input_hint.

Both are pure functions of the pixel array; encode(decode(x)) is stable.
"""

from __future__ import annotations

import struct

import numpy as np

QJPG_STEP = 4
QJPG_MAGIC = b"QJ01"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) into an (h, w, 3) uint8 array."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header: magic, whitespace, w, h, maxval, single whitespace, raster
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    raster = parts[3]
    arr = np.frombuffer(raster, dtype=np.uint8, count=w * h * 3)
    return arr.reshape(h, w, 3)


def encode_qjpg(pixels: np.ndarray) -> bytes:
    """Quantize uint8 pixels with step QJPG_STEP; store 1 code byte per sample."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    codes = ((pixels.astype(np.uint16) + QJPG_STEP // 2) // QJPG_STEP).astype(np.uint8)
    return QJPG_MAGIC + struct.pack("<HHB", w, h, QJPG_STEP) + codes.tobytes()


def decode_qjpg(data: bytes) -> np.ndarray:
    if not data.startswith(QJPG_MAGIC):
        raise ValueError("not a qjpg payload")
    w, h, step = struct.unpack("<HHB", data[4:9])
    codes = np.frombuffer(data, dtype=np.uint8, offset=9, count=w * h * 3)
    out = np.minimum(codes.astype(np.uint16) * step, 255).astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "qjpg":
        return decode_qjpg(data)
    raise NotImplementedError(
        f"fmt={fmt!r}: real image codecs (jpeg/png/webp) need PIL/libjpeg which are "
        "not in this container; plug a decoder in here."
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(pixels)
    if fmt == "qjpg":
        return encode_qjpg(pixels)
    raise NotImplementedError(f"fmt={fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual (average) hash of an RGB image.

    Gray = mean over channels; downsample to 8x8 by block means; bit i set iff
    cell > global mean. Returns a signed int64 (matches the ``phash:int64``
    input_hint column).
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = cells.ravel() > cells.mean()
    # exact bit pack (no float math): bits dot 2^k. The uint64 -> signed
    # wrap is done in Python ints: np.int64(np.uint64(v)) raises
    # OverflowError for v >= 2^63 on NumPy >= 2.0 (scalar-constructor
    # conversion became strict), and about half of all hashes set the top
    # bit. Same two's-complement value, version-proof.
    v = int((bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return v - (1 << 64) if v >= (1 << 63) else v
