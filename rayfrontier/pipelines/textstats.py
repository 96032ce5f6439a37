"""Text-analysis stages for a training-data pipeline over (doc_id, text):

* language-ID (letter-profile + stopword heuristic — n-gram-lite, no deps)
* quality scoring (length / punctuation / stopword / uppercase ratios)
* token counting (whitespace + a BPE-ish regex token pattern)
* document fingerprinting (winnowing rolling hash)

All vectorize per batch where the kernel allows (regex counts via pandas str /
pyarrow compute); everything is a stateless map_batches or a callable class
with patterns compiled once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import rolling_fingerprint

# a GPT-2-style pre-tokenizer regex, simplified to stdlib `re` (no \p classes)
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")
_WORD_RE = re.compile(r"[A-Za-z]+")

_EN_STOP = ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it")
_ES_STOP = ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no")
_DE_STOP = ("der", "die", "und", "das", "von", "zu", "mit", "ist", "den", "nicht")


def quality_stats(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Vectorized per-doc quality features; thresholds are the consumer's job.

    Emits: n_chars, n_words, punct_ratio, upper_ratio, stop_ratio, mean_word_len.
    """

    def stage(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        n_chars = pc.utf8_length(texts)
        # vectorized counts via pyarrow regex kernels
        n_punct = pc.count_substring_regex(texts, r"[^\w\s]")
        n_upper = pc.count_substring_regex(texts, r"[A-Z]")
        n_words = pc.count_substring_regex(texts, r"\S+")
        n_word_chars = pc.count_substring_regex(texts, r"\S")
        n_stop = pc.count_substring_regex(
            texts, r"(?i)\b(?:" + "|".join(_EN_STOP) + r")\b"
        )
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        nw = np.maximum(n_words.to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": pa.array(n_chars.to_numpy(zero_copy_only=False), pa.int64()),
                "n_words": pa.array(n_words.to_numpy(zero_copy_only=False), pa.int64()),
                "punct_ratio": pa.array(
                    n_punct.to_numpy(zero_copy_only=False) / np.maximum(nc, 1.0), pa.float64()
                ),
                "upper_ratio": pa.array(
                    n_upper.to_numpy(zero_copy_only=False) / np.maximum(nc, 1.0), pa.float64()
                ),
                "stop_ratio": pa.array(
                    n_stop.to_numpy(zero_copy_only=False) / nw, pa.float64()
                ),
                "mean_word_len": pa.array(
                    n_word_chars.to_numpy(zero_copy_only=False) / nw, pa.float64()
                ),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow")


_LANG_PATTERNS = {
    "en": r"(?i)\b(?:" + "|".join(_EN_STOP) + r")\b",
    "es": r"(?i)\b(?:" + "|".join(_ES_STOP) + r")\b",
    "de": r"(?i)\b(?:" + "|".join(_DE_STOP) + r")\b",
}


def _langid_stage(t: pa.Table) -> pa.Table:
    """Stopword-vote language ID, fully vectorized: one Arrow regex-count
    kernel per language over the whole batch (no Python per-row loop)."""
    nw = np.maximum(
        pc.count_substring_regex(t["text"], r"\S+").to_numpy(zero_copy_only=False), 1
    ).astype(np.float64)
    langs = list(_LANG_PATTERNS)
    scores = np.stack(
        [
            pc.count_substring_regex(t["text"], pat).to_numpy(zero_copy_only=False) / nw
            for pat in _LANG_PATTERNS.values()
        ]
    )
    best = scores.argmax(axis=0)
    conf = scores[best, np.arange(scores.shape[1])]
    pred = np.where(conf > 0.02, np.array(langs, dtype=object)[best], "unknown")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "lang_pred": pa.array(pred.tolist(), pa.string()),
            "lang_conf": pa.array(conf, pa.float64()),
        }
    )


def langid(docs):
    return docs.map_batches(_langid_stage, batch_format="pyarrow", batch_size=2048)


def token_counts(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace tokens + BPE-ish regex tokens per doc (vectorized regex count)."""

    def stage(t: pa.Table) -> pa.Table:
        ws = pc.count_substring_regex(t[text_col], r"\S+")
        bpe = [len(_BPE_RE.findall(x)) for x in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "ws_tokens": pa.array(ws.to_numpy(zero_copy_only=False), pa.int64()),
                "bpe_tokens": pa.array(bpe, pa.int64()),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow")


def profile(docs, window: int = 8):
    """Language-ID + winnowing fingerprint fused into ONE map pass.

    Both are per-row functions of the same text, so composing them in one
    stage needs no join at any scale (and scans each text once). Output:
    (doc_id, lang_pred, lang_conf, fingerprint).
    """

    def stage(t: pa.Table) -> pa.Table:
        out = _langid_stage(t)
        fps = [
            np.int64(np.uint64(rolling_fingerprint(x, window))).item()
            for x in t["text"].to_pylist()
        ]
        return out.append_column("fingerprint", pa.array(fps, pa.int64()))

    return docs.map_batches(stage, batch_format="pyarrow", batch_size=2048)


def fingerprints(docs, window: int = 8, text_col: str = "text", id_col: str = "doc_id"):
    """Winnowing rolling-hash fingerprint per doc (robust doc identity)."""

    def stage(t: pa.Table) -> pa.Table:
        fps = [
            np.int64(np.uint64(rolling_fingerprint(x, window))).item()
            for x in t[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: t[id_col],
                "fingerprint": pa.array(fps, pa.int64()),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow")
