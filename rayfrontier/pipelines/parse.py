"""Parser-tokenizer pipeline (reference ``src/parser-tokenizer.py`` §3.2).

pages(doc_id, html) → elements table → sentences table → stats aggregations,
entirely as Ray Data transforms:

    pages.map_batches(ElementsStage)            # stateless DOM walk per doc
         .filter(parse_ok)  [derived]           # compare_parsed_text gate
    elements.map_batches(SentencesStage)        # explode p/h → sentence rows,
                                                # rule tagging (vectorizable
                                                # regexes compiled per actor)
    sentences → groupby aggregations            # A4 rule hits, A6 lengths, A8

The reference writes CSVs per document from a process pool
(``parser-tokenizer.py:239-327``); here each table is one Dataset and ordering
is carried by (doc_id, seq_idx, sent_idx) columns instead of file order.

Neighbor context reproduces the reference's quirk: ``seq_list[i-1]`` at i=0 is
Python's ``[-1]`` — the *last* element (``parser-tokenizer.py:209-218``); only
the high end yields "None".
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.minihtml import compare_parsed_text, strip_text, walk_elements
from ..functions.textrules import (
    DEFAULT_RULES_JSON,
    build_rule_dict,
    split_sentences,
)

_LEFTOVER_LIMIT = 5  # >5 leftover sentences ⇒ parse failed (parser-tokenizer.py:304-317)


def neighbor_label(elements: list[tuple[str, str, int]], i: int, off: int) -> str:
    """tag_type+tag_index of seq_list[i+off] with the reference's wraparound."""
    j = i + off
    if j >= len(elements):
        return "None"
    # negative j wraps (Python indexing) — deliberate parity with the reference
    e = elements[j]
    return e[1] + str(e[2])


class ElementsStage:
    """pages → one row per parsed element + per-doc parse_ok flag."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        htmls = batch["html"].to_pylist()
        out = {k: [] for k in ("doc_id", "seq_idx", "tag", "tag_idx", "prec_by", "proc_by", "text", "parse_ok", "n_leftover")}
        for doc_id, html in zip(doc_ids, htmls):
            auto = strip_text(html)
            if html == "" or auto == "":
                continue  # reference skips empty inputs (parser-tokenizer.py:256-263)
            els = walk_elements(html)
            leftover = compare_parsed_text(els, auto)
            ok = len(leftover) <= _LEFTOVER_LIMIT
            for i, (text, tag, tag_idx) in enumerate(els):
                out["doc_id"].append(doc_id)
                out["seq_idx"].append(i)
                out["tag"].append(tag)
                out["tag_idx"].append(tag_idx)
                out["prec_by"].append(neighbor_label(els, i, -1))
                out["proc_by"].append(neighbor_label(els, i, +1))
                out["text"].append(text)
                out["parse_ok"].append(ok)
                out["n_leftover"].append(len(leftover))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "seq_idx": pa.array(out["seq_idx"], pa.int32()),
                "tag": pa.array(out["tag"], pa.string()),
                "tag_idx": pa.array(out["tag_idx"], pa.int32()),
                "prec_by": pa.array(out["prec_by"], pa.string()),
                "proc_by": pa.array(out["proc_by"], pa.string()),
                "text": pa.array(out["text"], pa.large_string()),
                "parse_ok": pa.array(out["parse_ok"]),
                "n_leftover": pa.array(out["n_leftover"], pa.int32()),
            }
        )


class SentencesStage:
    """element rows (p/h, parse_ok) → sentence rows with rule hits.

    Rule dict compiled once per actor (__init__), applied per batch —
    reference recompiles nothing but re-reads rules per run
    (``parser-tokenizer.py:357``).
    """

    def __init__(self, rules_json: str = DEFAULT_RULES_JSON):
        self.rules = build_rule_dict(rules_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.textrules import apply_rules_vectorized

        # row gate + column access vectorized: one filter, one to_pylist per
        # needed column (the old per-cell .as_py() chatter was the hot spot)
        sel = batch.filter(
            pc.and_(
                pc.is_in(batch["tag"], value_set=pa.array(["p", "h"])),
                batch["parse_ok"],
            )
        )
        texts = sel["text"].to_pylist()
        # sentence splitting is inherently per-element; explode to flat arrays
        sents: list[str] = []
        rep: list[int] = []
        sidx: list[int] = []
        for i, content in enumerate(texts):
            ss = split_sentences(content)
            sents.extend(ss)
            rep.extend([i] * len(ss))
            sidx.extend(range(len(ss)))
        sent_arr = pa.array(sents, pa.large_string())
        rep_idx = pa.array(np.asarray(rep, dtype=np.int64))
        # M13 rule tagging: one RE2 kernel per rule over the exploded array
        hits, nw = apply_rules_vectorized(sent_arr, self.rules)
        tag_label = pc.binary_join_element_wise(
            sel["tag"], pc.cast(sel["tag_idx"], pa.string()), ""
        )
        return pa.table(
            {
                "doc_id": pc.take(sel["doc_id"], rep_idx),
                "seq_idx": pc.take(sel["seq_idx"], rep_idx),
                "tag": pc.take(tag_label, rep_idx),
                "prec_by": pc.take(sel["prec_by"], rep_idx),
                "proc_by": pc.take(sel["proc_by"], rep_idx),
                "sent_idx": pa.array(np.asarray(sidx, dtype=np.int32), pa.int32()),
                "text": sent_arr,
                "n_words": pa.array(nw.astype(np.int32), pa.int32()),
                "rule_hits": pa.array(hits, pa.list_(pa.string())),
            }
        )


def pages_dataset_from_corpus(corpus_dir: str):
    """Synthetic corpus pages → (doc_id, html) Dataset (caption = the document)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{corpus_dir}/pages", columns=["image_id", "caption"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["image_id"], "html": t["caption"]}),
        batch_format="pyarrow",
    )


def elements_dataset(pages):
    return pages.map_batches(ElementsStage, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def sentences_dataset(elements, rules_json: str = DEFAULT_RULES_JSON):
    return elements.map_batches(
        SentencesStage,
        fn_constructor_kwargs={"rules_json": rules_json},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )


def rule_stats(sentences):
    """A4: per-doc per-rule hit counts — explode + pre-aggregate + groupby."""
    import pyarrow.compute as pc  # noqa: F401
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        # flatten rule_hits, repeat doc_id; then PARTIAL-aggregate within the
        # batch so the shuffle moves (doc,rule) partials, not sentence rows
        lengths = pc.list_value_length(t["rule_hits"]).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(t["rule_hits"])
        doc = pa.array(
            [d for d, n in zip(t["doc_id"].to_pylist(), lengths) for _ in range(int(n))],
            pa.string(),
        )
        part = pa.table({"doc_id": doc, "rule": flat})
        agg = part.group_by(["doc_id", "rule"]).aggregate([("rule", "count")])
        # select by '<col>_<fn>' name: key/aggregate order varies by pyarrow major
        return agg.select(["doc_id", "rule", "rule_count"]).rename_columns(
            ["doc_id", "rule", "hits_part"]
        )

    import pyarrow.compute as pc

    partials = sentences.map_batches(explode, batch_format="pyarrow")
    return partials.groupby(["doc_id", "rule"]).aggregate(Sum("hits_part", alias_name="hits"))


def sentence_length_stats(sentences):
    """A6: per-doc sentence-length distribution (mean/max/count)."""
    from ray.data.aggregate import Count, Max, Mean

    return sentences.groupby("doc_id").aggregate(
        Count(alias_name="n_sentences"),
        Mean("n_words", alias_name="mean_words"),
        Max("n_words", alias_name="max_words"),
    )


def list_stats(elements):
    """A8: lists per doc + avg items per list (items = newline count,
    ``src/statistics/lists.py:24-51``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean

    def items(t: pa.Table) -> pa.Table:
        lists_only = t.filter(pc.equal(t["tag"], "l"))
        n_items = pc.count_substring(lists_only["text"], "\n")
        return pa.table(
            {
                "doc_id": lists_only["doc_id"],
                "n_items": pa.array(n_items.to_numpy(zero_copy_only=False), pa.int64()),
            }
        )

    per_list = elements.map_batches(items, batch_format="pyarrow")
    return per_list.groupby("doc_id").aggregate(
        Count(alias_name="n_lists"), Mean("n_items", alias_name="avg_items")
    )


def tag_projection(elements, tag: str):
    """K4: the per-tag CSV shape (seq_idx, tag_idx, prec_by, proc_by, text)
    — a pure filter+projection (``parser-tokenizer.py:71-106, 284-289``)."""
    import pyarrow.compute as pc

    def proj(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["tag"], tag))
        return sel.select(["doc_id", "seq_idx", "tag_idx", "prec_by", "proc_by", "text"])

    return elements.map_batches(proj, batch_format="pyarrow")


def sequential_text(elements, size_bytes: int | None = None):
    """K5: per-doc "tN\\ntext" concatenation in seq order
    (``parser-tokenizer.py:291-296``). Doc cardinality scales with data, so
    this is a coarse-partitioned aggregate (functions/groupagg): one pandas
    string-concat groupby per partition, never a Ray group per document.
    ``size_bytes`` (≈ elements text bytes) sizes the partition count."""
    import pandas as pd  # noqa: F401

    from ..functions.groupagg import coarse_group_aggregate

    def concat(df):
        df = df.sort_values(["doc_id", "seq_idx"])
        piece = df["tag"] + df["tag_idx"].astype(str) + "\n" + df["text"]
        out = piece.groupby(df["doc_id"].to_numpy(), sort=False).agg("\n".join)
        return out.rename_axis("doc_id").reset_index(name="sequential_text")

    return coarse_group_aggregate(
        elements.select_columns(["doc_id", "seq_idx", "tag", "tag_idx", "text"]),
        ["doc_id"],
        concat,
        size_bytes=size_bytes,
    )


def paragraph_sample(elements, n_docs: int = 50, seed: int = 7) -> pa.Table:
    """Seeded analog of the reference's TextSampler: one random paragraph
    from each of ``n_docs`` random documents, with its word count (human-QA
    sample + words-per-paragraph histogram input,
    ``src/statistics/paragraph_sampler.py:50-78``).

    Deterministic replacement for its ``random.sample``/``random.choice``:
    document choice = the n_docs smallest splitmix64(hash(doc_id) ^ seed);
    the paragraph within a doc = hash-picked index. Distributed shape: per
    coarse partition, pick each doc's paragraph and keep a PARTIAL top-n_docs
    by rank key; the driver merges ≤ n_docs × nparts candidate rows — never
    the paragraphs table.
    """
    import numpy as np
    import pandas as pd

    from ..functions.groupagg import coarse_group_aggregate
    from ..functions.hashing import hash_text, splitmix64

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["tag"] == "p"]
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=str),
                    "rank_key": pd.Series([], dtype=np.uint64),
                    "text": pd.Series([], dtype=str),
                    "n_words": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
        grp = df.groupby("doc_id", sort=False)
        pos = grp.cumcount().to_numpy()
        size = grp["doc_id"].transform("size").to_numpy().astype(np.uint64)
        dh = np.fromiter(
            (hash_text(str(d)) for d in df["doc_id"]), dtype=np.uint64, count=len(df)
        )
        with np.errstate(over="ignore"):
            pick_idx = splitmix64(dh ^ np.uint64(2 * seed + 1)) % size
            rank = splitmix64(dh ^ np.uint64(seed))
        take = pos == pick_idx.astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[take],
                "rank_key": rank[take],
                "text": df["text"].to_numpy()[take],
            }
        )
        out["n_words"] = out["text"].str.split().str.len().astype(np.int64)
        return out.nsmallest(min(n_docs, len(out)), "rank_key")

    cand = coarse_group_aggregate(
        elements.select_columns(["doc_id", "seq_idx", "tag", "text"]), ["doc_id"], pick
    ).to_pandas()
    final = cand.nsmallest(min(n_docs, len(cand)), "rank_key").sort_values("doc_id")
    return pa.table(
        {
            "doc_id": pa.array(final["doc_id"], pa.string()),
            "text": pa.array(final["text"], pa.string()),
            "n_words": pa.array(final["n_words"].to_numpy(), pa.int64()),
        }
    )


RULE_HIST_BINS = list(range(0, 401, 10))  # reference's fixed bins (sentences.py:180)


def rule_histograms(rule_stats_ds):
    """A5: per-rule histogram of per-doc hit counts over fixed bins
    [0,10,...,400] (``src/statistics/sentences.py:166-231``). The per-doc
    counts table is already small (docs × rules); binning is a second
    pre-aggregated groupby — no driver-side loop."""
    import numpy as np
    from ray.data.aggregate import Sum

    edges = np.asarray(RULE_HIST_BINS, dtype=np.int64)

    def binify(t: pa.Table) -> pa.Table:
        hits = t["hits"].to_numpy(zero_copy_only=False)
        b = np.clip(np.digitize(hits, edges) - 1, 0, len(edges) - 1)
        part = pa.table(
            {
                "rule": t["rule"],
                "bin_lo": pa.array(edges[b], pa.int64()),
            }
        )
        agg = part.group_by(["rule", "bin_lo"]).aggregate([("bin_lo", "count")])
        return agg.select(["rule", "bin_lo", "bin_lo_count"]).rename_columns(
            ["rule", "bin_lo", "n_part"]
        )

    return (
        rule_stats_ds.map_batches(binify, batch_format="pyarrow")
        .groupby(["rule", "bin_lo"])
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
