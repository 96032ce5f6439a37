"""Two-document TF-IDF cosine similarity (sklearn-free, numpy/Counter).

Replicates the reference's scoring (``src/crawler.py:43-75`` and
``src/verification/verify.py:157-205``): ``TfidfVectorizer().fit_transform(
[ground_truth, doc])`` then ``cosine_similarity(...)[0, 1]``. Because the
vectorizer is *re-fit per document pair*, IDF depends only on that pair — the
score is a pure per-row function, which is why the engine can run it in an
elastic ``map_batches`` actor pool with the ground-truth term counts broadcast
once per actor (SURVEY.md M8/T3).

sklearn defaults reproduced: token_pattern ``(?u)\\b\\w\\w+\\b`` on lowercased
text, raw term counts, smooth_idf (idf = ln((1+n)/(1+df)) + 1 with n=2),
l2 normalization.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

_LN_3_2_P1 = math.log(3.0 / 2.0) + 1.0  # idf for df=1 of n=2 docs
_ONE = 1.0  # idf for df=2


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def term_counts(text: str) -> Counter:
    return Counter(tokenize(text))


def pair_cosine(gt_counts: Counter, doc_text: str) -> float:
    """cos(tfidf(gt), tfidf(doc)) with the pair-fit IDF above.

    For n=2 docs: idf is ln(1.5)+1 for terms in one doc, 1.0 for terms in both.
    Terms unique to one doc contribute only to that doc's norm.
    """
    doc_counts = term_counts(doc_text)
    if not doc_counts or not gt_counts:
        return 0.0
    dot = 0.0
    gt_sq = 0.0
    doc_sq = 0.0
    for t, c in gt_counts.items():
        idf = _ONE if t in doc_counts else _LN_3_2_P1
        gt_sq += (c * idf) ** 2
    for t, c in doc_counts.items():
        if t in gt_counts:
            w_doc = c * _ONE
            w_gt = gt_counts[t] * _ONE
            dot += w_doc * w_gt
            doc_sq += w_doc * w_doc
        else:
            w = c * _LN_3_2_P1
            doc_sq += w * w
    if gt_sq == 0.0 or doc_sq == 0.0:
        return 0.0
    return dot / math.sqrt(gt_sq * doc_sq)
