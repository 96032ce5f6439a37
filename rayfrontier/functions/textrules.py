"""Sentence splitting, rule tagging, and English-ness kernels.

* ``split_sentences`` replaces NLTK punkt (unavailable in-sandbox) with a
  deterministic regex splitter — the engine AND the oracle import this one
  function, so engine/oracle parity is by construction (SURVEY.md §7).
* Rule semantics replicate ``src/statistics/sentences.py:25-111`` exactly:
  SHORT = word count < threshold; HEAD_FRAG = capitalized-word ratio > threshold;
  regex rules fire on polarity "True"=match / "False"=non-match; no hits → GOOD.
* English predicate replicates ``src/verification/verify.py:26-68``:
  ≥50% of (uppercased, letters-only) words in the dictionary AND ≥85% of
  characters are letters/space/tab/newline.
"""

from __future__ import annotations

import json
import re

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+")
DEFAULT_RULES_JSON = json.dumps(
    {
        "SHORT": [5, "True"],
        "START_CAP": ["^[A-Z].*", "False"],
        "PRE_NOISE": [
            "^((\\d+)|(\\d(\\.|\\-)\\d)|(\\d(\\.|\\-)\\d(\\.|\\-)\\d))(:|\\.)?\\s([A-Z]\\w+.*?)",
            "True",
        ],
        "END_PUNC": [".*[!?.]", "False"],
        "HEAD_FRAG": [0.6, "True"],
        "META": ["<META:.*/META>", "True"],
    }
)


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence split: boundary = [.!?] followed by whitespace.

    Sentences are stripped; empties dropped. This is *our* spec (punkt is not
    available); both oracle and engine use it (``sent_tokenize`` call sites:
    ``src/parser-tokenizer.py:152,187,219``, ``src/statistics/sentences.py:139``).
    """
    parts = _SENT_BOUNDARY.split(text)
    return [p.strip() for p in parts if p.strip()]


def build_rule_dict(rules_json: str = DEFAULT_RULES_JSON) -> dict:
    """JSON rules → {name: [compiled regex | numeric threshold, polarity]}.

    User-extension surface (reference contract: ``data/inputs/rules.json``,
    loader ``src/statistics/sentences.py:25-47``).
    """
    rule_dict = json.loads(rules_json)
    out = {}
    for name, (pat, pol) in rule_dict.items():
        if name in ("HEAD_FRAG", "SHORT"):
            out[name] = [pat, pol]
        else:
            out[name] = [re.compile(pat), pol]
    return out


def is_short(sentence: str, threshold: int = 5) -> bool:
    return len(sentence.split()) < threshold


def is_header_fragment(sentence: str, threshold: float = 0.6) -> bool:
    words = sentence.split()
    if not words:
        # reference would ZeroDivisionError here (src/statistics/sentences.py:77);
        # punkt never emits word-free sentences on its corpus — we define False.
        return False
    ncaps = sum(1 for w in words if any(ch.isupper() for ch in w))
    return (ncaps / len(words)) > threshold


def apply_sentence_rules(sentence: str, rule_dict: dict) -> list[str]:
    """Ordered rule-name hits; ["GOOD"] when none (src/statistics/sentences.py:81-111)."""
    hits: list[str] = []
    for name, rule in rule_dict.items():
        if name == "SHORT":
            if is_short(sentence, rule[0]):
                hits.append(name)
            continue
        if name == "HEAD_FRAG":
            if is_header_fragment(sentence, rule[0]):
                hits.append(name)
            continue
        if rule[1] == "True" and rule[0].match(sentence):
            hits.append(name)
        if rule[1] == "False" and not rule[0].match(sentence):
            hits.append(name)
    if not hits:
        hits.append("GOOD")
    return hits


# RE2 class equal to Python str.isspace() (what str.split() splits on):
# \t\n\v\f\r, space, the C0 separators \x1c-\x1f, NEL \x85, and Unicode Z*
_RE2_WS = r"\t-\r \x{1C}-\x{1F}\x{85}\p{Z}"
_RE2_WORD = f"[^{_RE2_WS}]+"
_RE2_CAP_WORD = f"[^{_RE2_WS}]*\\p{{Lu}}[^{_RE2_WS}]*"


def apply_rules_vectorized(sentences, rule_dict: dict) -> tuple[list[list[str]], "object"]:
    """Vectorized :func:`apply_sentence_rules` over an Arrow string array.

    Regex rules run as one RE2 kernel per rule (``pc.match_substring_regex``
    with the pattern start-anchored to mirror ``re.match``); SHORT/HEAD_FRAG
    run as arithmetic over per-sentence word/cap-word counts. Returns
    (hits-per-sentence in rule order with the GOOD default, word counts).
    Parity with the scalar kernel is pinned by a test over the full synthetic
    corpus (RE2 and ``re`` agree on the rules grammar used here).
    """
    import numpy as np
    import pyarrow.compute as pc

    n = len(sentences)
    # the scalar spec counts words with str.split() = UNICODE whitespace
    # (NBSP, NEL, Zs/Zl/Zp...); RE2's \s is ASCII-only, so spell out the
    # class Python isspace() uses: \t-\r, space, FS-US, NEL, and \p{Z}
    nw = pc.count_substring_regex(sentences, _RE2_WORD).to_numpy(zero_copy_only=False)
    hits: list[list[str]] = [[] for _ in range(n)]
    for name, rule in rule_dict.items():
        if name == "SHORT":
            mask = nw < rule[0]
        elif name == "HEAD_FRAG":
            caps = pc.count_substring_regex(sentences, _RE2_CAP_WORD).to_numpy(
                zero_copy_only=False
            )
            mask = np.zeros(n, dtype=bool)
            nz = nw > 0
            mask[nz] = caps[nz] / nw[nz] > rule[0]
        else:
            m = pc.match_substring_regex(
                sentences, "^(?:" + rule[0].pattern + ")"
            ).to_numpy(zero_copy_only=False)
            mask = m if rule[1] == "True" else ~m
        for i in np.flatnonzero(mask):
            hits[i].append(name)
    for h in hits:
        if not h:
            h.append("GOOD")
    return hits, nw


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LETTERS_AND_SPACE = frozenset(_UPPER + _UPPER.lower() + " \t\n")


def remove_nonletters(text: str) -> str:
    """Keep only [A-Za-z \\t\\n] (src/verification/verify.py:39-46)."""
    return "".join(ch for ch in text if ch in _LETTERS_AND_SPACE)


def english_word_ratio(dictionary: frozenset[str], text: str) -> float:
    """Fraction of (uppercased, letters-only) words found in the dictionary."""
    words = remove_nonletters(text.upper()).split()
    if not words:
        return 0.0
    return sum(1 for w in words if w in dictionary) / len(words)


def letter_ratio(text: str) -> float:
    if len(text) == 0:
        return 0.0
    return len(remove_nonletters(text)) / len(text)


def is_english(
    dictionary: frozenset[str],
    text: str,
    word_percentage: float = 50,
    char_percentage: float = 85,
) -> bool:
    """src/verification/verify.py:48-68 semantics (50% dict words, 85% letters)."""
    words_match = english_word_ratio(dictionary, text) * 100 >= word_percentage
    letters_match = letter_ratio(text) * 100 >= char_percentage
    return words_match and letters_match


def remove_company_names(text: str, name: str) -> str:
    """Case-insensitive regex scrub of an org name (src/verification/verify.py:106-120)."""
    return re.sub(name, " ", text, flags=re.IGNORECASE)


def word_count(sentence: str) -> int:
    """len(sentence.split()) (src/parser-tokenizer.py:225)."""
    return len(sentence.split())
