"""Standalone verification pipeline (reference ``src/verification/verify.py`` §3.3).

pages → TF-IDF scorer actor pool → exact content dedup (first-wins by doc_id,
distributed groupby on the text hash) → scores table + borderline band.

Reference semantics reproduced: company-name scrub before scoring
(``verify.py:171``), English gate → 0.0, duplicate → score -2 sentinel
(``verify.py:182-184``), borderline band = threshold ± 0.05
(``verify.py:263-266``). The reference's dup winner is racy pool order; our
spec pins first-wins to min(doc_id) — deterministic under any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_text
from ..functions.minihtml import strip_text
from ..functions.textrules import is_english, remove_company_names
from ..functions.tfidf import pair_cosine, term_counts

DUP_SENTINEL = -2.0


class ScoreStage:
    """(doc_id, html) → (doc_id, sim, text_hash, english) — ground truth and
    dictionary loaded once per actor (fixes verify.py:27's reload-per-call)."""

    def __init__(self, ground_truth, dictionary):
        import ray

        gt = ray.get(ground_truth) if isinstance(ground_truth, ray.ObjectRef) else ground_truth
        dc = ray.get(dictionary) if isinstance(dictionary, ray.ObjectRef) else dictionary
        self.gt_counts = term_counts(gt)
        self.dictionary = frozenset(dc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        htmls = batch["html"].to_pylist()
        sims = np.zeros(len(doc_ids))
        hashes = np.zeros(len(doc_ids), dtype=np.uint64)
        eng = np.zeros(len(doc_ids), dtype=bool)
        for k, (doc_id, html) in enumerate(zip(doc_ids, htmls)):
            text = remove_company_names(strip_text(html), doc_id)
            hashes[k] = hash_text(text)
            if text and is_english(self.dictionary, text):
                eng[k] = True
                sims[k] = pair_cosine(self.gt_counts, text)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "sim": pa.array(sims, pa.float64()),
                "text_hash": pa.array(hashes.astype(np.int64), pa.int64()),
                "english": pa.array(eng),
            }
        )


def scores_dataset(pages, ground_truth: str, dictionary: frozenset, threshold: float = 0.6,
                   size_bytes: int | None = None):
    """Full verify pipeline; returns (doc_id, sim, english, dup, borderline).

    ``size_bytes`` (≈ scored-rows bytes, ~50 B/doc) sizes the dedup partition
    count (groupagg.auto_nparts)."""
    import ray
    import ray.data as rd  # noqa: F401

    gt_ref = ray.put(ground_truth)
    dict_ref = ray.put(dictionary)
    scored = pages.map_batches(
        ScoreStage,
        fn_constructor_kwargs={"ground_truth": gt_ref, "dictionary": dict_ref},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 8),
    )

    # exact first-wins dedup, winner = min doc_id: text_hash cardinality
    # scales with document count, so this is a coarse-partitioned aggregate
    # (functions/groupagg), never a native per-hash groupby
    import pandas as pd

    from ..functions.groupagg import coarse_group_aggregate

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_hash", "doc_id"])
        df["dup"] = df.duplicated("text_hash")
        return df

    deduped = coarse_group_aggregate(scored, ["text_hash"], mark_dups, size_bytes=size_bytes)

    def finalize(t: pa.Table) -> pa.Table:
        sim = pc.if_else(t["dup"], pa.scalar(DUP_SENTINEL, pa.float64()), t["sim"])
        border = pc.and_(
            pc.greater_equal(sim, pa.scalar(threshold - 0.05)),
            pc.less_equal(sim, pa.scalar(threshold + 0.05)),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sim": sim,
                "english": t["english"],
                "dup": t["dup"],
                "borderline": border,
            }
        )

    return deduped.map_batches(finalize, batch_format="pyarrow")
