import numpy as np
import pytest

from rayfrontier.codecs import (
    decode_image,
    encode_image,
    phash64,
    psnr,
)


def _img(seed, h=23, w=31):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_lossless():
    px = _img(1)
    assert np.array_equal(decode_image(encode_image(px, "ppm"), "ppm"), px)


def test_qjpg_psnr_above_40db():
    for seed in range(5):
        px = _img(seed, h=16 + seed, w=64 - seed)
        dec = decode_image(encode_image(px, "qjpg"), "qjpg")
        assert dec.shape == px.shape
        assert psnr(px, dec) >= 40.0
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_unknown_fmt_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8", "jpeg")


def test_phash_deterministic_and_robust():
    px = _img(7, 40, 40)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # lossy roundtrip keeps the perceptual hash close
    dec = decode_image(encode_image(px, "qjpg"), "qjpg")
    h2 = phash64(dec)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 4


def test_phash_top_bit_wraps_to_signed():
    """Top-bit-set hashes (half of all hashes) must wrap to negative int64
    via Python-int arithmetic — np.int64(np.uint64(v)) raises OverflowError
    for v >= 2^63 on NumPy >= 2.0 (ADVICE round-4)."""
    px = np.zeros((64, 64, 3), dtype=np.uint8)
    px[56:, 56:, :] = 255  # only the (7,7) cell exceeds the global mean -> bit 63 alone
    h = phash64(px)
    assert h == -(1 << 63)
    assert isinstance(h, int)
