"""Unit tests for the pure kernels (SURVEY.md §2.3/§2.9 semantics)."""

import math

import numpy as np
import pytest

from rayfrontier.functions import hashing
from rayfrontier.functions.minihtml import (
    META_MARKER,
    candidate_links,
    compare_parsed_text,
    strip_text,
    walk_elements,
)
from rayfrontier.functions.textrules import (
    apply_sentence_rules,
    build_rule_dict,
    is_english,
    letter_ratio,
    remove_company_names,
    remove_nonletters,
    split_sentences,
    word_count,
)
from rayfrontier.functions.tfidf import pair_cosine, term_counts
from rayfrontier.functions.urltools import (
    canonicalize,
    clean_link,
    complete_link,
    host_of,
    path_tail,
)


# ---------------------------------------------------------------- urltools


def test_clean_link_strips_fragment_keeps_query():
    # reference: fragment strip only; query strip disabled (src/crawler.py:87)
    assert clean_link("http://a.com/p?x=1#frag") == "http://a.com/p?x=1"
    assert clean_link("no-fragment") == "no-fragment"


def test_complete_link_reference_rules():
    base = "http://site.com"
    assert complete_link(base, "http://x.com/p#f") == "http://x.com/p"
    assert complete_link(base, "policy.html") == "http://site.com/policy.html"
    assert complete_link(base, "/p/q") == "http://site.com/p/q"
    assert complete_link(base, "//cdn.com/p") == "http://cdn.com/p"


def test_canonicalize_rfc3986():
    assert canonicalize("HTTP://WWW.Ex.COM:80/a/../b/./c?b=2&a=1#z") == "http://www.ex.com/b/c?a=1&b=2"
    assert canonicalize("https://h.com:443/") == "https://h.com/"
    assert canonicalize("http://h.com") == "http://h.com/"
    assert canonicalize("http://h.com/%7euser") == "http://h.com/~user"
    # idempotent
    u = "http://h.com/x?a=1&b=%20two"
    assert canonicalize(canonicalize(u)) == canonicalize(u)


def test_host_and_tail():
    assert host_of("http://A.com/x") == "a.com"
    assert path_tail("http://a.com/x/y/img00000001") == "img00000001"
    assert path_tail("http://a.com/") == ""


# ---------------------------------------------------------------- minihtml


def test_strip_text_bad_tags_and_join():
    html = "<head><title>T</title></head><p>Hello <b>world</b></p><script>x</script><p> two </p>"
    assert strip_text(html) == "Hello world two"
    assert strip_text("") == ""


def test_candidate_links_keyword_and_nested_anchor():
    html = (
        '<a href="/privacy">terms</a>'  # keyword in href only
        '<a href="/p1">Privacy Policy</a>'  # keyword in anchor text
        '<a href="/p2"><b>Privacy</b></a>'  # nested markup → .string None → skipped
        '<a href="/other">nothing</a>'  # no keyword
        "<a>Privacy</a>"  # no href
    )
    assert candidate_links(html) == ["/privacy", "/p1"]


def test_walk_elements_order_and_colon_heuristic():
    html = (
        "<h1>Head</h1><p>Before list items:</p>"
        "<ul><li>one.</li><li>two.</li></ul>"
        "<p>After.</p><ol><li>x</li></ol>"
    )
    els = walk_elements(html)
    # colon-suffix paragraph emptied → META marker (src/parser-tokenizer.py:149-155)
    assert els[0] == ("Head\n", "h", 0)
    assert els[1][0] == META_MARKER and els[1][1] == "p"
    assert els[2] == ("Before list items:\none.\ntwo.\n", "l", 0)
    assert els[3] == ("After.\n", "p", 1)
    assert els[4] == ("x\n", "l", 1)


def test_walk_elements_colon_partial_move():
    # multi-sentence paragraph ending ':' — only its last sentence moves
    html = "<p>Keep this. Move this part:</p><ul><li>a</li></ul>"
    els = walk_elements(html)
    assert els[0][0].strip() == "Keep this."
    assert els[1][0] == "Move this part:\na\n"


def test_compare_parsed_text_gate():
    els = [("Hello there. Nice day.\n", "p", 0)]
    leftover = compare_parsed_text(els, "Hello there. Nice day. Extra one. Extra two.")
    assert leftover == ["Extra one.", "Extra two."]


# ---------------------------------------------------------------- textrules


def test_split_sentences():
    assert split_sentences("One. Two! Three? Four") == ["One.", "Two!", "Three?", "Four"]
    assert split_sentences("  ") == []
    assert split_sentences("No terminal punct") == ["No terminal punct"]
    # our spec: every [.!?]+whitespace is a boundary (abbreviations split too)
    assert split_sentences("A.B. splits here. Next") == ["A.B.", "splits here.", "Next"]
    assert split_sentences("Multi!! Bang") == ["Multi!!", "Bang"]


def test_rules_reference_semantics():
    rules = build_rule_dict()
    # SHORT (<5 words) + START_CAP (polarity False → fires when NOT matching)
    assert apply_sentence_rules("tiny one.", rules) == ["SHORT", "START_CAP"]
    # END_PUNC fires when sentence does NOT end with punctuation
    assert apply_sentence_rules("This is a fine long sentence without end", rules) == ["END_PUNC"]
    # GOOD when nothing fires
    assert apply_sentence_rules("This is a perfectly good sentence here.", rules) == ["GOOD"]
    # HEAD_FRAG: >60% words capitalized
    assert "HEAD_FRAG" in apply_sentence_rules("Every Word Here Is Capitalized Now.", rules)
    # META marker rule
    assert "META" in apply_sentence_rules(META_MARKER, rules)
    # PRE_NOISE: leading numbering
    assert "PRE_NOISE" in apply_sentence_rules("1. Section heading of the policy text.", rules)


def test_english_predicate():
    d = frozenset({"THE", "CAT", "SAT", "ON", "MAT"})
    assert is_english(d, "the cat sat on the mat")
    assert not is_english(d, "zzz qqq www yyy xxx")  # words not in dict
    assert not is_english(d, "the cat 111 222 333 444 555 666 777 888")  # letter ratio
    assert remove_nonletters("a1b2 c!") == "ab c"
    assert letter_ratio("ab12") == 0.5
    assert word_count("  a b   c ") == 3


def test_remove_company_names_case_insensitive():
    assert remove_company_names("FooCorp respects privacy. foocorp inc.", "foocorp") == \
        "  respects privacy.   inc."


# ---------------------------------------------------------------- tfidf


def test_pair_cosine_hand_computed():
    # docs: gt = "a b a", doc = "a c" with 2+ char tokens → use real words
    gt = "apple banana apple"
    doc = "apple cherry"
    # shared: apple (idf 1), unique: banana/cherry (idf ln1.5+1)
    i1 = math.log(1.5) + 1
    gt_v = {"apple": 2 * 1.0, "banana": 1 * i1}
    doc_v = {"apple": 1 * 1.0, "cherry": 1 * i1}
    dot = 2 * 1
    expected = dot / (
        math.sqrt(gt_v["apple"] ** 2 + gt_v["banana"] ** 2)
        * math.sqrt(doc_v["apple"] ** 2 + doc_v["cherry"] ** 2)
    )
    assert pair_cosine(term_counts(gt), doc) == pytest.approx(expected)
    assert pair_cosine(term_counts(gt), "") == 0.0
    assert pair_cosine(term_counts(gt), gt) == pytest.approx(1.0)


# ---------------------------------------------------------------- hashing


def test_hashing_sketches():
    a = hashing.shingle_hashes("the quick brown fox jumps over the lazy dog", k=3)
    b = hashing.shingle_hashes("the quick brown fox jumps over the lazy cat", k=3)
    sig_a = hashing.minhash_signature(a)
    sig_b = hashing.minhash_signature(b)
    est = float((sig_a == sig_b).mean())
    true_j = hashing.jaccard(a, b)
    assert abs(est - true_j) < 0.35
    # merge property
    ab = np.union1d(a, b)
    assert np.array_equal(
        hashing.minhash_signature(ab), np.minimum(sig_a, sig_b)
    )
    s1 = hashing.simhash64("the quick brown fox jumps over the lazy dog")
    s2 = hashing.simhash64("the quick brown fox jumps over the lazy cat")
    s3 = hashing.simhash64("completely different words entirely unrelated text")
    assert hashing.hamming64(s1, s2) < hashing.hamming64(s1, s3)
    assert hashing.hash_text("x") == hashing.hash_text("x")
    assert hashing.rolling_fingerprint("hello world " * 10) == hashing.rolling_fingerprint("hello world " * 10)


def test_vectorized_rules_match_scalar():
    """apply_rules_vectorized (RE2 kernels) must agree with the scalar
    apply_sentence_rules (Python re) on every sentence of a full synthetic
    corpus — guards RE2-vs-re semantic drift in the vectorized parse path."""
    import pyarrow as pa

    from rayfrontier.config import DatagenConfig
    from rayfrontier.datagen import caption_html
    from rayfrontier.functions.minihtml import strip_text, walk_elements
    from rayfrontier.functions.textrules import (
        apply_rules_vectorized,
        split_sentences,
    )

    cfg = DatagenConfig(n_images=120, n_hosts=8)
    sentences = []
    for i in range(cfg.n_images):
        html = caption_html(cfg, i)
        if strip_text(html) == "":
            continue
        for text, tag, _idx in walk_elements(html):
            if tag in ("p", "h"):
                sentences.extend(split_sentences(text))
    assert len(sentences) > 100, "corpus fixture must yield real sentences"
    sentences.extend(
        [
            "",  # empty never comes out of split but the kernel must not crash
            "1. Section heading of the policy text.",
            "Every Word Here Is Capitalized Now.",
            "tiny one.",
            "This is a fine long sentence without end",
            "This is a perfectly good sentence here.",
            META_MARKER,
            "Ünïcode Wörds Are Capitalized Tóo.",
            # Unicode whitespace: str.split() treats NBSP / NEL / thin space
            # as separators but RE2's ASCII \S+ does not — pin the parity
            "Bad Break Here With NBSP separators only.",
            "One thin space splits these five words.",
            "NELseparatedwords here.",
            "trailing nbsp  ",
        ]
    )
    rules = build_rule_dict()
    vec_hits, vec_nw = apply_rules_vectorized(pa.array(sentences, pa.large_string()), rules)
    for s, vh, vn in zip(sentences, vec_hits, vec_nw):
        assert vh == apply_sentence_rules(s, rules), f"rule mismatch on {s!r}"
        assert int(vn) == len(s.split()), f"word-count mismatch on {s!r}"


def test_host_and_tail_matches_urlsplit_kernels():
    """host_and_tail's fast path must agree with the urlsplit-based kernels
    on every URL shape the crawl can see (incl. the fallback triggers)."""
    from rayfrontier.functions.urltools import host_and_tail, host_of, path_tail

    urls = [
        "http://site0001.com/img00000042",
        "https://site0001.com",
        "http://site0001.com/",
        "http://a.com/x/y/z",
        "http://a.com//x//",
        "HTTP://Mixed.Case/Path",
        "http://UPPER.HOST.com/img00000001",
        "http://a.com:8080/x",
        "http://user:pw@a.com/x",
        "http://a.com/x?q=1",
        "http://a.com/x#frag",
        "http://a.com/x y",
        "mailto:someone@x.com",
        "javascript:void(0)",
        "notaurl",
        "http://a.com\t/x",
        "",
    ]
    for u in urls:
        assert host_and_tail(u) == (host_of(u), path_tail(u)), repr(u)


def test_fixed_width_fnv_matches_scalar():
    from rayfrontier.functions.hashing import fnv1a64_fixed_width, hash_text

    ids = [f"img{i:08d}" for i in (0, 1, 999, 123456, 99999999)]
    vec = fnv1a64_fixed_width(ids)
    for s, h in zip(ids, vec):
        assert int(h) == hash_text(s)
    assert fnv1a64_fixed_width([]).size == 0
    # mixed widths (image_id digit counts outgrow the zero-pad at >=1e8 ids)
    # must take the scalar fallback, not reshape-crash or hash garbage
    mixed = ids + ["img123456789"]
    for s, h in zip(mixed, fnv1a64_fixed_width(mixed)):
        assert int(h) == hash_text(s), repr(s)


def test_variable_width_fnv_matches_scalar():
    """fnv1a64_var (the replay-actor href hasher) must equal hash_text for
    every length mix, including empty strings and non-ASCII."""
    import random
    import string

    from rayfrontier.functions.hashing import fnv1a64_var, hash_text

    rng = random.Random(7)
    strs = ["", "a", "/p?q=1#f", "naïve café nbsp", "x" * 300] + [
        "".join(rng.choices(string.printable, k=rng.randint(0, 90))) for _ in range(300)
    ]
    vec = fnv1a64_var(strs)
    for s, h in zip(strs, vec):
        assert int(h) == hash_text(s), repr(s)
    assert fnv1a64_var([]).size == 0
