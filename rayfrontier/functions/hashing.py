"""Deterministic 64-bit hashing + dedup sketches (no external deps).

Used for: exact content dedup keys (reference keys its dedup Manager dict on the
*entire document text*, ``src/verification/verify.py:142-155`` — we key on a 64-bit
hash instead, SURVEY.md §4 "never hold full text as key"), cuckoo-filter
fingerprints, MinHash / SimHash near-dup sketches, and rolling-hash document
fingerprints.

All functions are vectorizable over numpy arrays where it matters.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain PRNG finalizer; Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit over raw bytes; scalar (used on small keys)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_text(s: str) -> int:
    """64-bit content hash of a string (unsigned)."""
    return fnv1a64(s.encode("utf-8", "surrogatepass"))


def splitmix64(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """Vectorized splitmix64 finalizer: uniform 64-bit mix of uint64 input."""
    with np.errstate(over="ignore"):
        z = (x + _SM_GAMMA) & _MASK64
        z = ((z ^ (z >> np.uint64(30))) * _SM_M1) & _MASK64
        z = ((z ^ (z >> np.uint64(27))) * _SM_M2) & _MASK64
        return z ^ (z >> np.uint64(31))


def hash_texts_u64(texts: list[str] | np.ndarray) -> np.ndarray:
    """Vector of 64-bit FNV-1a hashes for a list of strings."""
    return np.fromiter((hash_text(t) for t in texts), dtype=np.uint64, count=len(texts))


def fnv1a64_fixed_width(strs: list[str]) -> np.ndarray:
    """Vectorized FNV-1a for equal-length ASCII strings (== hash_text each).

    The crawl probe hashes tens of thousands of fixed-width image ids per
    wave; the scalar per-byte loop was a measurable serial driver cost."""
    n = len(strs)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    w = len(strs[0])
    if any(len(s) != w for s in strs):
        # mixed widths (image_id digit counts grow past the zero-pad at
        # ~1e8+ ids): the reshape below would crash or hash garbage —
        # fall back to the scalar per-string hash (identical output)
        return hash_texts_u64(strs)
    arr = np.frombuffer("".join(strs).encode("ascii"), dtype=np.uint8).reshape(n, w)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            h = (h ^ arr[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def fnv1a64_var(strs: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over variable-length strings (== hash_text each).

    Groups strings by byte length and runs the fixed-width kernel per group,
    so total work is O(total bytes) in numpy regardless of the length mix.
    The crawl driver hashes each wave's new hrefs once with this so replay
    range actors can hold URL-seen membership as sorted uint64 arrays
    (8 B/entry) instead of per-actor string dicts (crawl.py §replay actors).
    """
    n = len(strs)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    bs = [s.encode("utf-8", "surrogatepass") for s in strs]
    lens = np.fromiter(map(len, bs), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    bounds = np.searchsorted(sorted_lens, np.unique(sorted_lens), side="left")
    bounds = np.append(bounds, n)
    with np.errstate(over="ignore"):
        for g in range(len(bounds) - 1):
            a, b = int(bounds[g]), int(bounds[g + 1])
            sel = order[a:b]
            w = int(sorted_lens[a])
            if w == 0:
                out[sel] = _FNV_OFFSET
                continue
            arr = np.frombuffer(b"".join(bs[k] for k in sel), dtype=np.uint8)
            arr = arr.reshape(b - a, w)
            h = np.full(b - a, _FNV_OFFSET, dtype=np.uint64)
            for j in range(w):
                h = (h ^ arr[:, j].astype(np.uint64)) * _FNV_PRIME
            out[sel] = h
    return out


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles of lowercased whitespace-tokenized text."""
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


_WORD_CACHE: dict[str, int] = {}
_WORD_CACHE_CAP = 1 << 20


def word_hashes(words: list[str]) -> np.ndarray:
    """uint64 FNV-1a per word, memoized — vocabularies are small and words
    repeat across documents, so the Python-loop FNV runs ~once per vocab word
    instead of once per occurrence (the former shingle hot spot)."""
    cache = _WORD_CACHE
    if len(cache) > _WORD_CACHE_CAP:
        cache.clear()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = fnv1a64(w.encode("utf-8", "surrogatepass"))
            cache[w] = h
        out[i] = h
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Unique uint64 hashes of the k-word shingle set of a document.

    Shingle hash = splitmix64 chain over the k word hashes (vectorized across
    all window positions) — equivalent discriminating power to hashing the
    joined shingle strings at a fraction of the cost.
    """
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    wh = word_hashes(words)
    if len(wh) < k:
        acc = wh[:1].copy()
        for j in range(1, len(wh)):
            acc = splitmix64(acc ^ wh[j : j + 1])
        return acc
    n = len(wh) - k + 1
    acc = splitmix64(wh[:n].copy())
    for j in range(1, k):
        acc = splitmix64(acc ^ wh[j : j + n])
    return np.unique(acc)


def minhash_signature(shingles_u64: np.ndarray, num_perm: int = 64, seed: int = 0x5EED) -> np.ndarray:
    """MinHash signature via num_perm splitmix64-salted rehashes (min per salt).

    Mergeable: sig(A ∪ B) = elementwise-min(sig(A), sig(B)).
    """
    if shingles_u64.size == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    salts = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    # (num_perm, n) mix — vectorized outer xor then mix
    with np.errstate(over="ignore"):
        mixed = splitmix64(shingles_u64[None, :] ^ salts[:, None])
    return mixed.min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Hash each band of the signature to one uint64 bucket key (vectorized
    across bands: `rows` chained splitmix64 steps instead of bands×rows)."""
    rows = sig.shape[0] // bands
    m = sig[: bands * rows].reshape(bands, rows)
    with np.errstate(over="ignore"):
        acc = _FNV_OFFSET ^ np.arange(bands, dtype=np.uint64)
        for j in range(rows):
            acc = splitmix64(acc ^ m[:, j])
    return acc


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unsigned int)."""
    words = text.lower().split()
    if not words:
        return 0
    hs = word_hashes(words)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    val = np.uint64(0)
    for k in range(64):
        if score[k] > 0:
            val |= np.uint64(1) << np.uint64(k)
    return int(val)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min rolling hash over char windows.

    Deterministic 64-bit doc fingerprint robust to small appends (public
    winnowing scheme, Schleimer et al. 2003).
    """
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= window:
        return hash_text(text)
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr) - window + 1
    pows = np.array([pow(257, window - 1 - i, 2**61 - 1) for i in range(window)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        for i in range(window):
            acc = (acc + arr[i : i + n].astype(np.uint64) * pows[i]) & _MASK64
        mixed = splitmix64(acc)
    return int(mixed.min())
