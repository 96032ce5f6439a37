"""Property-based tests (hypothesis) for the pure kernels.

No Ray needed — these cover the deterministic functions shared by the engine
and the sequential oracle, where an edge-case divergence would silently break
crawl parity.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rayfrontier.codecs import decode_image, encode_image, psnr
from rayfrontier.functions.hashing import (
    hamming64,
    jaccard,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
)
from rayfrontier.functions.rounding import quantize
from rayfrontier.functions.urltools import canonicalize, complete_link

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_canonicalize_idempotent(s):
    url = "http://example.com/" + s.replace(" ", "%20")
    once = canonicalize(url)
    assert canonicalize(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_shingle_hashes_unique_sorted(s):
    h = shingle_hashes(s, 3)
    assert h.dtype == np.uint64
    assert np.array_equal(h, np.unique(h))  # unique + sorted


@settings(max_examples=100, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_bounds_and_symmetry(a, b):
    ha, hb = shingle_hashes(a, 3), shingle_hashes(b, 3)
    j = jaccard(ha, hb)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(hb, ha)
    assert jaccard(ha, ha) == 1.0


@settings(max_examples=50, deadline=None)
@given(TEXT)
def test_minhash_self_similarity(s):
    h = shingle_hashes(s + " filler words to have content", 3)
    sig = minhash_signature(h, 64)
    assert sig.shape == (64,)
    # identical sets → identical signatures (merge of X with X is X)
    assert np.array_equal(sig, minhash_signature(h.copy(), 64))


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_simhash_stability_and_hamming_range(s):
    h = simhash64(s)
    assert 0 <= h < 2**64
    assert hamming64(h, h) == 0
    assert 0 <= hamming64(h, simhash64(s + " extra")) <= 64


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_fingerprint_deterministic(s):
    assert rolling_fingerprint(s) == rolling_fingerprint(s)


@settings(max_examples=200, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64), st.integers(0, 6))
def test_quantize_idempotent_and_monotone(x, nd):
    if abs(x) > 1e12:
        return
    q = quantize(np.array([x]), nd)[0]
    assert quantize(np.array([q]), nd)[0] == q  # idempotent
    assert abs(q - x) <= 10.0**-nd / 2 + 1e-9 * max(abs(x), 1)  # within half quantum


@settings(max_examples=50, deadline=None)
@given(st.integers(2, 16), st.integers(2, 16), st.integers(0, 2**32 - 1))
def test_codec_roundtrip_properties(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(px, "ppm"), "ppm"), px)
    lossy = decode_image(encode_image(px, "qjpg"), "qjpg")
    assert lossy.shape == px.shape
    assert psnr(px, lossy) >= 40.0 or np.array_equal(lossy, px)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_complete_link_absolute_passthrough(s):
    from rayfrontier.functions.urltools import clean_link

    base = "http://host.example.com/page"
    absolute = "https://other.example.com/" + s.replace(" ", "")
    out = complete_link(base, absolute)
    # absolute URLs pass through modulo the reference's fragment strip
    # (clean_link, src/crawler.py:77-88) — never re-based onto base_url
    assert out == clean_link(absolute)
    assert not out.startswith("http://host.example.com")
