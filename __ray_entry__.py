"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline on a deterministic synthetic
corpus (the input_hint image+caption universe). ``queries()`` exposes every
implemented operator/pipeline from SURVEY.md §2 plus the training-data
additions; ``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible
ones (driver compares row-count + schema + order-insensitive value hash at
sf=0.01; column names and float rounding are aligned on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

_CORPUS_CACHE: dict[str, Any] = {}


def _stable_schema(df, schema: dict[str, Any]) -> pa.Table:
    """Pipelines that can legitimately return zero rows (pair finders) lose
    their schema through empty map_groups blocks; pin it explicitly."""
    if len(df.columns) == 0:
        return pa.table({c: pa.array([], t) for c, t in schema.items()})
    return pa.Table.from_pandas(df[list(schema)], preserve_index=False)


def _corpus_dir() -> str:
    """Deterministic synthetic corpus for the crawl/parse/score pipelines."""
    from rayfrontier.config import DatagenConfig
    from rayfrontier.datagen import write_corpus

    d = "/tmp/rayfrontier_corpus_sf_test"
    cfg = DatagenConfig(n_images=400, n_hosts=20)
    if not os.path.exists(os.path.join(d, "meta.json")):
        write_corpus(d, cfg, use_ray=False)
    _CORPUS_CACHE["cfg"] = cfg
    return d


def _crawl_engine():
    if "engine" not in _CORPUS_CACHE:
        from rayfrontier.config import CrawlConfig
        from rayfrontier.pipelines.crawl import CrawlEngine

        d = _corpus_dir()
        eng = CrawlEngine(d, _CORPUS_CACHE["cfg"], CrawlConfig())
        eng.run()
        _CORPUS_CACHE["engine"] = eng
    return _CORPUS_CACHE["engine"]


def _docs(sf_dir: str):
    from rayfrontier.functions.blocks import read_parquet_bare

    # documents is one parquet file; without override_num_blocks the fused
    # read→map runs as a handful of tasks and leaves most cores idle
    return read_parquet_bare(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], override_num_blocks=32
    )


def _docs_bytes(sf_dir: str) -> int:
    """Footer-metadata size of documents.parquet — the auto_nparts hint for
    every docs-table coarse aggregate (partition count grows with the data)."""
    from rayfrontier.functions.groupagg import parquet_size_bytes

    return parquet_size_bytes(f"{sf_dir}/documents.parquet")


def _pages_ds():
    from rayfrontier.pipelines.parse import pages_dataset_from_corpus

    return pages_dataset_from_corpus(_corpus_dir())


# ------------------------------------------------- parity tables + oracle dumps
#
# The crawl/parse pipelines run on the synthetic corpus, not the driver's sf
# tables — their SQL oracles therefore read parquet DUMPS of the engine's own
# parity tables (crawl_log / domains / elements / sentences). The dump rows
# come from the same deterministic pipelines whose AGGREGATIONS the SQL
# re-computes, so a green row certifies the distributed aggregation operator;
# row-level generation parity is pinned separately by the pytest oracle suite.

_DUMP_DIR = "/tmp/rayfrontier_oracle_dumps"


def _elements_table() -> pa.Table:
    if "elements" not in _CORPUS_CACHE:
        from rayfrontier.pipelines.parse import elements_dataset

        df = elements_dataset(_pages_ds()).to_pandas()
        _CORPUS_CACHE["elements"] = pa.Table.from_pandas(df, preserve_index=False)
    return _CORPUS_CACHE["elements"]


def _sentences_table() -> pa.Table:
    if "sentences" not in _CORPUS_CACHE:
        import ray.data as rd

        from rayfrontier.pipelines.parse import sentences_dataset

        df = sentences_dataset(rd.from_arrow(_elements_table())).to_pandas()
        _CORPUS_CACHE["sentences"] = pa.Table.from_pandas(df, preserve_index=False)
    return _CORPUS_CACHE["sentences"]


def _parity_dumps() -> str:
    """Write all four parity tables to parquet once (deterministic content —
    re-writes are byte-stable), so every dump-based oracle can run regardless
    of which query the driver evaluates first."""
    if "dumped" not in _CORPUS_CACHE:
        import pyarrow.parquet as pq

        os.makedirs(_DUMP_DIR, exist_ok=True)
        eng = _crawl_engine()
        for name, tbl in (
            ("crawl_log", eng.crawl_log_table()),
            ("domains", eng.domains_table()),
            ("elements", _elements_table()),
            ("sentences", _sentences_table()),
        ):
            pq.write_table(tbl, os.path.join(_DUMP_DIR, f"{name}.parquet"))
        _CORPUS_CACHE["dumped"] = True
    return _DUMP_DIR


def _oracle_replay_dumps() -> str:
    """Parquet dumps of the INDEPENDENT sequential oracle's outputs.

    Unlike :func:`_parity_dumps` (the engine's own tables, re-aggregated by
    SQL), these come from ``rayfrontier/oracle.py``'s ``sequential_crawl`` — a
    from-scratch, single-threaded spec implementation of the reference main
    loop (src/crawler.py:140-230) with its own control flow. The driver-side
    SQL compare for crawl_log / crawl_url_seen / crawl_domains /
    accepted_pages therefore certifies engine ≡ sequential replay end-to-end,
    not merely that SQL can re-aggregate what the engine emitted. Accepted
    payload digests are regenerated purely (``gen_row``) — no corpus read, no
    Ray."""
    if "oracle_dumped" not in _CORPUS_CACHE:
        import pyarrow.parquet as pq

        from rayfrontier.config import CrawlConfig
        from rayfrontier.datagen import (
            SyntheticStore,
            dictionary_set,
            gen_row,
            ground_truth_text,
            image_id,
            seeds_list,
        )
        from rayfrontier.functions.hashing import fnv1a64
        from rayfrontier.oracle import sequential_crawl

        os.makedirs(_DUMP_DIR, exist_ok=True)
        _corpus_dir()
        cfg = _CORPUS_CACHE["cfg"]
        store = SyntheticStore(cfg)
        res = sequential_crawl(
            seeds_list(cfg), store, CrawlConfig(), ground_truth_text(cfg), dictionary_set(cfg)
        )
        log = pa.table(
            {
                "domain": pa.array([r[0] for r in res.crawl_log], pa.string()),
                "url": pa.array([r[1] for r in res.crawl_log], pa.string()),
                "sim": pa.array([r[2] for r in res.crawl_log], pa.float64()),
                "ok": pa.array([r[3] for r in res.crawl_log], pa.bool_()),
                "valid": pa.array([r[4] for r in res.crawl_log], pa.bool_()),
                "dup": pa.array([r[5] for r in res.crawl_log], pa.bool_()),
                "seq": pa.array([r[6] for r in res.crawl_log], pa.int64()),
            }
        )
        seen_items = sorted(res.url_seen.items())
        seen = pa.table(
            {
                "url": pa.array([k for k, _ in seen_items], pa.string()),
                "revisits": pa.array([v for _, v in seen_items], pa.int64()),
            }
        )
        seeds = seeds_list(cfg)
        doms = pa.table(
            {
                "domain": pa.array(seeds, pa.string()),
                "status": pa.array([res.domain_status.get(d, "") for d in seeds], pa.string()),
                "sim_avg": pa.array(
                    [res.domain_sim_avg.get(d, 0.0) for d in seeds], pa.float64()
                ),
            }
        )
        # accepted-page digests: valid non-dup log rows, payloads regenerated
        # purely from the datagen spec (bit-identical to what write_corpus
        # stored and the engine's keyed-lookup read returns)
        acc_rows = []
        for domain, url, sim, ok, valid, dup, seq in res.crawl_log:
            if not (valid and not dup):
                continue
            j = store.resolve(url)
            if j is None:
                continue
            row = gen_row(cfg, j, store.hm)
            acc_rows.append(
                (
                    image_id(j),
                    domain,
                    url,
                    sim,
                    seq,
                    np.int64(np.uint64(fnv1a64(row["bytes"]))).item(),
                    len(row["caption"]),
                )
            )
        acc = pa.table(
            {
                "image_id": pa.array([r[0] for r in acc_rows], pa.string()),
                "domain": pa.array([r[1] for r in acc_rows], pa.string()),
                "url": pa.array([r[2] for r in acc_rows], pa.string()),
                "sim": pa.array([r[3] for r in acc_rows], pa.float64()),
                "seq": pa.array([r[4] for r in acc_rows], pa.int64()),
                "bytes_hash": pa.array([r[5] for r in acc_rows], pa.int64()),
                "n_text_chars": pa.array([r[6] for r in acc_rows], pa.int64()),
            }
        )
        for name, tbl in (
            ("oracle_crawl_log", log),
            ("oracle_url_seen", seen),
            ("oracle_domains", doms),
            ("oracle_accepted", acc),
        ):
            pq.write_table(tbl, os.path.join(_DUMP_DIR, f"{name}.parquet"))
        _CORPUS_CACHE["oracle_dumped"] = True
    return _DUMP_DIR


def _sequential_parse_dumps() -> str:
    """Driver-sequential recompute of the parse/verify tables, dumped to
    parquet for DuckDB oracles.

    Independent assembly from the distributed pipelines: one plain-Python loop
    over purely-regenerated pages, using the SCALAR spec kernels —
    ``apply_sentence_rules`` (the reference's per-sentence rule walk,
    src/statistics/sentences.py:81-111) where the Dataset path runs the
    vectorized RE2 kernels, and an inline first-wins dedup where the Dataset
    path runs the coarse-partitioned aggregate. No Ray anywhere."""
    if "seq_parse_dumped" not in _CORPUS_CACHE:
        import pyarrow.parquet as pq

        from rayfrontier.datagen import (
            HostMap,
            caption_html,
            dictionary_set,
            ground_truth_text,
            image_id,
        )
        from rayfrontier.functions.hashing import hash_text
        from rayfrontier.functions.minihtml import compare_parsed_text, strip_text, walk_elements
        from rayfrontier.functions.textrules import (
            apply_sentence_rules,
            build_rule_dict,
            is_english,
            remove_company_names,
            split_sentences,
        )
        from rayfrontier.functions.tfidf import pair_cosine, term_counts

        os.makedirs(_DUMP_DIR, exist_ok=True)
        _corpus_dir()
        cfg = _CORPUS_CACHE["cfg"]
        hm = HostMap(cfg)
        rules = build_rule_dict()
        gt_counts = term_counts(ground_truth_text(cfg))
        dictionary = dictionary_set(cfg)

        el_rows, sent_rows, score_rows = [], [], []
        for i in range(cfg.n_images):
            doc_id = image_id(i)
            html = caption_html(cfg, i, hm)
            auto = strip_text(html)
            # verify pipeline covers every page, parse skips empty ones
            text = remove_company_names(auto, doc_id)
            th = np.int64(np.uint64(hash_text(text))).item()
            eng = bool(text) and is_english(dictionary, text)
            sim = pair_cosine(gt_counts, text) if eng else 0.0
            score_rows.append([doc_id, sim, eng, th])
            if html == "" or auto == "":
                continue
            els = walk_elements(html)
            n_left = len(compare_parsed_text(els, auto))
            ok = n_left <= 5  # parser-tokenizer.py:304-317
            for k, (etext, tag, tag_idx) in enumerate(els):
                # reference neighbor quirk: [-1] at k=0 wraps to the LAST
                # element; only the high end yields "None"
                pe = els[k - 1]
                prec = pe[1] + str(pe[2])
                proc = "None" if k + 1 >= len(els) else els[k + 1][1] + str(els[k + 1][2])
                el_rows.append([doc_id, k, tag, tag_idx, prec, proc, etext, ok, n_left])
                if ok and tag in ("p", "h"):
                    for si, s in enumerate(split_sentences(etext)):
                        hits = apply_sentence_rules(s, rules)
                        sent_rows.append(
                            [doc_id, k, tag + str(tag_idx), prec, proc, si, s,
                             len(s.split()), "|".join(hits)]
                        )
        # first-wins exact dedup, winner = min doc_id per text hash
        first: dict[int, str] = {}
        for doc_id, _sim, _eng, th in sorted(score_rows):
            first.setdefault(th, doc_id)
        for r in score_rows:
            r.append(r[0] != first[r[3]])

        els_t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in el_rows], pa.string()),
                "seq_idx": pa.array([r[1] for r in el_rows], pa.int32()),
                "tag": pa.array([r[2] for r in el_rows], pa.string()),
                "tag_idx": pa.array([r[3] for r in el_rows], pa.int32()),
                "prec_by": pa.array([r[4] for r in el_rows], pa.string()),
                "proc_by": pa.array([r[5] for r in el_rows], pa.string()),
                "text": pa.array([r[6] for r in el_rows], pa.large_string()),
                "parse_ok": pa.array([r[7] for r in el_rows]),
                "n_leftover": pa.array([r[8] for r in el_rows], pa.int32()),
            }
        )
        sent_t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in sent_rows], pa.string()),
                "seq_idx": pa.array([r[1] for r in sent_rows], pa.int32()),
                "tag": pa.array([r[2] for r in sent_rows], pa.string()),
                "prec_by": pa.array([r[3] for r in sent_rows], pa.string()),
                "proc_by": pa.array([r[4] for r in sent_rows], pa.string()),
                "sent_idx": pa.array([r[5] for r in sent_rows], pa.int32()),
                "text": pa.array([r[6] for r in sent_rows], pa.large_string()),
                "n_words": pa.array([r[7] for r in sent_rows], pa.int32()),
                "rule_hits": pa.array([r[8] for r in sent_rows], pa.string()),
            }
        )
        thr = 0.6
        sims = [(-2.0 if r[4] else r[1]) for r in score_rows]  # DUP_SENTINEL
        sc_t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in score_rows], pa.string()),
                "sim": pa.array(sims, pa.float64()),
                "english": pa.array([r[2] for r in score_rows]),
                "dup": pa.array([r[4] for r in score_rows]),
                "borderline": pa.array(
                    [thr - 0.05 <= s <= thr + 0.05 for s in sims]
                ),
            }
        )
        for name, tbl in (
            ("oracle_elements", els_t),
            ("oracle_sentences", sent_t),
            ("oracle_scores", sc_t),
        ):
            pq.write_table(tbl, os.path.join(_DUMP_DIR, f"{name}.parquet"))
        _CORPUS_CACHE["seq_parse_dumped"] = True
    return _DUMP_DIR


def entry() -> Any:
    """Flagship: full crawl (fetch→decode/strip→score→dedup→frontier) on the
    synthetic corpus; returns the crawl log (exact sequential-parity order)."""
    eng = _crawl_engine()
    return eng.crawl_log_table()


# ---------------------------------------------------------------------- queries


def _q_sentences(sf_dir: str):
    """Distributed sentence table (vectorized RE2 rule kernels), SQL-checked
    against the driver-sequential SCALAR-spec recompute. rule_hits presented
    pipe-joined (order is part of the spec) so the compare covers it."""
    import pyarrow.compute as pc

    _sequential_parse_dumps()
    t = _sentences_table()
    joined = pc.binary_join(t["rule_hits"], pa.scalar("|"))
    return t.set_column(t.schema.get_field_index("rule_hits"), "rule_hits", joined)


def _q_elements(sf_dir: str):
    """Distributed elements table, SQL-checked against the driver-sequential
    per-page recompute."""
    _sequential_parse_dumps()
    return _elements_table()


def _q_rule_stats(sf_dir: str):
    import ray.data as rd

    from rayfrontier.pipelines.parse import rule_stats

    _parity_dumps()
    ds = rule_stats(rd.from_arrow(_sentences_table()))
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def _q_sentence_lengths(sf_dir: str):
    import ray.data as rd

    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.parse import sentence_length_stats

    _parity_dumps()
    ds = sentence_length_stats(rd.from_arrow(_sentences_table()))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    for c in ("n_sentences", "max_words"):
        t = t.set_column(t.schema.get_field_index(c), c, pc_cast_i64(t[c]))
    return quantize_cols(t, {"mean_words": 6})


def pc_cast_i64(col):
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())


def _q_list_stats(sf_dir: str):
    import ray.data as rd

    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.parse import list_stats

    _parity_dumps()
    ds = list_stats(rd.from_arrow(_elements_table()))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.set_column(t.schema.get_field_index("n_lists"), "n_lists", pc_cast_i64(t["n_lists"]))
    return quantize_cols(t, {"avg_items": 6})


def _q_tag_paragraphs(sf_dir: str):
    import ray.data as rd

    from rayfrontier.pipelines.parse import tag_projection

    _parity_dumps()
    ds = tag_projection(rd.from_arrow(_elements_table()), "p")
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def _q_sequential_text(sf_dir: str):
    import ray.data as rd

    from rayfrontier.pipelines.parse import sequential_text

    _parity_dumps()
    ds = sequential_text(rd.from_arrow(_elements_table()))
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def _q_rule_histograms(sf_dir: str):
    import ray.data as rd

    from rayfrontier.pipelines.parse import rule_histograms, rule_stats

    _parity_dumps()
    ds = rule_histograms(rule_stats(rd.from_arrow(_sentences_table())))
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def _q_scores(sf_dir: str):
    from rayfrontier.datagen import dictionary_set, ground_truth_text
    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.score import scores_dataset

    _sequential_parse_dumps()
    _corpus_dir()
    cfg = _CORPUS_CACHE["cfg"]
    ds = scores_dataset(_pages_ds(), ground_truth_text(cfg), dictionary_set(cfg))
    return quantize_cols(
        pa.Table.from_pandas(ds.to_pandas(), preserve_index=False), {"sim": 6}
    )


def _q_docs_exact_dedup(sf_dir: str):
    from rayfrontier.pipelines.dedup import exact_dedup

    out = exact_dedup(_docs(sf_dir), size_bytes=_docs_bytes(sf_dir)).select_columns(["keep_id", "n_copies"])
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _q_docs_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs, SQL-checked: the emitted rows are the
    EXACT-Jaccard-verified survivors of the banded-LSH candidate set, and at
    sf0.01 that set covers every pair ≥ 0.5 (seeded permutations + fixed data
    make the candidate set deterministic; measured equal to the O(n²) brute
    force, values bit-equal). The oracle is the pure exact-Jaccard SQL — same
    shape as docs_ngram_pairs' but without the max_df co-occurrence guard
    (minhash's skew guard is the >200 bucket cap, which never trips here)."""
    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(sf_dir), jaccard_threshold=0.5, size_bytes=_docs_bytes(sf_dir))
    t = _stable_schema(
        out.to_pandas(), {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
    )
    return quantize_cols(t, {"jaccard": 6})


def _simhash_oracle_dump(sf_dir: str) -> None:
    """Brute-force O(n²) Hamming oracle for docs_simhash_pairs: fingerprint
    every doc (simhash64 — the shared pure kernel, same standing as the
    datagen spec) and enumerate ALL pairs ≤ max_hamming with plain Python —
    no banding, no Ray, no shared pipeline code."""
    if _CORPUS_CACHE.get("simhash_dumped") == sf_dir:
        return
    import itertools

    import pyarrow.parquet as pq

    from rayfrontier.functions.hashing import simhash64

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hs = {
        int(i): simhash64(tx)
        for i, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    a_out, b_out, d_out = [], [], []
    for a, b in itertools.combinations(sorted(hs), 2):
        d = bin(hs[a] ^ hs[b]).count("1")
        if d <= 3:
            a_out.append(a)
            b_out.append(b)
            d_out.append(d)
    pq.write_table(
        pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_simhash_pairs.parquet"),
    )
    _CORPUS_CACHE["simhash_dumped"] = sf_dir


def _q_docs_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs at max_hamming=3 — SQL-checked with a PROVABLE
    recall argument: 4 disjoint 16-bit bands and ≤3 differing bits mean at
    least one band is identical (pigeonhole), so banded bucketing finds every
    qualifying pair exactly (as long as no bucket exceeds the >200 skew cap —
    none do at sf scale; at 10^10 the cap is the documented trade). The
    max_hamming=8 variant (recall ≈ 0.38 vs brute force at sf0.01 — banding
    is not exhaustive past the pigeonhole bound) remains available on the
    operator; the query pins the exact regime."""
    from rayfrontier.pipelines.dedup import simhash_pairs

    _simhash_oracle_dump(sf_dir)
    out = simhash_pairs(_docs(sf_dir), max_hamming=3, size_bytes=_docs_bytes(sf_dir))
    return _stable_schema(
        out.to_pandas(), {"a": pa.int64(), "b": pa.int64(), "hamming": pa.int64()}
    )


def _plant_embeddings(t: pa.Table) -> pa.Table:
    """Append seeded near-duplicate vectors (id + 1e6, cos ≈ 0.97 to their
    source) for vec_id < 20 — pure input generation shared by the Ray query
    and the brute-force oracle dump."""
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = ids < 20
    if not sel.any():
        return t
    src_ids, src = ids[sel], vecs[sel]
    unit = src / np.maximum(np.linalg.norm(src, axis=1, keepdims=True), 1e-12)
    out_rows = []
    for i, v in zip(src_ids, unit):
        g = np.random.Generator(np.random.PCG64(9000 + int(i))).normal(size=v.shape)
        out_rows.append(v + 0.25 * g / np.linalg.norm(g))
    return pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, src_ids + 1_000_000]), pa.int64()
            ),
            "embedding": pa.array(
                list(vecs) + [r.tolist() for r in out_rows],
                pa.list_(pa.float64()),
            ),
        }
    )


def _embed_oracle_dump(sf_dir: str) -> None:
    """Brute-force exact-cosine oracle for embed_dups: O(n²) numpy matmul over
    the planted table (no LSH, no Ray, no shared pipeline code) — the
    independent-discovery counterpart to the seeded LSH path, same precedent
    as the sequential crawl/parse recomputes. Deterministic: seeded planes +
    fixed sf data make the LSH candidate set a fixed outcome, so equality is
    stable run to run."""
    if _CORPUS_CACHE.get("embed_dumped") == sf_dir:
        return
    import pyarrow.parquet as pq

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = _plant_embeddings(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    cos = unit @ unit.T
    iu = np.triu_indices(len(ids), 1)
    keep = cos[iu] >= 0.9
    a, b = ids[iu[0]][keep], ids[iu[1]][keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    pq.write_table(
        pa.table(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "cos": pa.array(cos[iu][keep], pa.float64()),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_embed_pairs.parquet"),
    )
    _CORPUS_CACHE["embed_dumped"] = sf_dir


def _q_embed_dups(sf_dir: str):
    """Embedding near-dup discovery over the sf embeddings PLUS deterministic
    planted near-duplicates. The synthetic sf tables carry no near-dup pairs
    at all (measured max pairwise cosine ≈ 0.51 at sf0.01), so a bare run of
    any sensible threshold returns zero rows and certifies nothing; planting
    seeded perturbed copies (id + 1e6, cos ≈ 0.97 to their source) makes the
    driver row witness the full LSH bucket → candidate → exact-verify path.
    SQL-checked against the brute-force dump (_embed_oracle_dump); recall
    against brute force is also pinned in pytest."""
    import ray.data as rd

    from rayfrontier.pipelines.dedup import embedding_dups

    _embed_oracle_dump(sf_dir)
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    out = embedding_dups(
        em.map_batches(_plant_embeddings, batch_format="pyarrow"), cos_threshold=0.9
    )
    from rayfrontier.functions.rounding import quantize_cols

    t = _stable_schema(
        out.to_pandas().sort_values(["a", "b"]),
        {"a": pa.int64(), "b": pa.int64(), "cos": pa.float64()},
    )
    return quantize_cols(t, {"cos": 6})


def _load_query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    row = t.filter(pc.equal(t["vec_id"], 0))
    return np.asarray(row["embedding"][0].as_py(), dtype=np.float64)


def _q_knn_brute(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    from rayfrontier.pipelines.similarity import brute_force_knn

    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    em = em.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow"
    )
    q = _load_query_vec(sf_dir)
    out = brute_force_knn(em, q[None, :], k=10)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.select(["vec_id", "cos"])
    from rayfrontier.functions.rounding import quantize_cols

    return quantize_cols(t, {"cos": 6})


def _q_knn_batch(sf_dir: str):
    """Batched multi-query ANN: top-3 per query for 5 query vectors in ONE
    pass over the table (matmul against the broadcast query matrix)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.similarity import brute_force_knn

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = qt.filter(pc.less(qt["vec_id"], 5)).sort_by("vec_id")
    q = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    em = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"], override_num_blocks=16
    ).map_batches(lambda t: t.filter(pc.greater_equal(t["vec_id"], 5)), batch_format="pyarrow")
    out = brute_force_knn(em, q, k=3)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).select(
        ["query_id", "vec_id", "cos"]
    )
    return quantize_cols(t, {"cos": 6})


def _ivf_oracle_dump(sf_dir: str) -> None:
    """Sequential IVF recompute: filter the query row out, train the coarse
    quantizer on the first 4096 filtered rows in parquet storage order (plain
    numpy Lloyd, seeded init), probe the top-8 of 16 cells, and take the
    exact cosine top-10 among probed rows with the pipeline's (cos desc,
    vec_id asc) tie order — no Ray, no pipeline code."""
    if _CORPUS_CACHE.get("ivf_dumped") == sf_dir:
        return
    import pyarrow.parquet as pq

    from rayfrontier.functions.rounding import quantize

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qvec = vecs[ids == 0][0]
    keep = ids != 0
    ids, vecs = ids[keep], vecs[keep]
    m_all = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    m = m_all[np.argsort(ids)[:4096]]  # quantizer sample = 4096 lowest ids
    rng = np.random.Generator(np.random.PCG64(9))
    cent = m[rng.choice(len(m), size=min(16, len(m)), replace=False)]
    for _ in range(5):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    q = qvec / max(np.linalg.norm(qvec), 1e-12)
    wanted = set(np.argsort(-(q @ cent.T))[:8].tolist())
    cell = np.argmax(m_all @ cent.T, axis=1)
    probe = np.isin(cell, sorted(wanted))
    sims = m_all[probe] @ q
    pids = ids[probe]
    order = np.lexsort((pids, -sims))[:10]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(pids[order], pa.int64()),
                "cos": pa.array(quantize(sims[order], 6), pa.float64()),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_ivf.parquet"),
    )
    _CORPUS_CACHE["ivf_dumped"] = sf_dir


def _q_knn_ivf(sf_dir: str):
    """IVF approximate kNN (coarse quantizer + nprobe-pruned scan) —
    SQL-checked against the sequential recompute (_ivf_oracle_dump)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.similarity import ivf_knn

    _ivf_oracle_dump(sf_dir)
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    em = em.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow"
    )
    q = _load_query_vec(sf_dir)
    out = ivf_knn(em, q[None, :], k=10, n_centroids=16, nprobe=8)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return quantize_cols(t.select(["vec_id", "cos"]), {"cos": 6})


def _embed_clusters_oracle_dump(sf_dir: str) -> None:
    """Sequential k-means oracle for embed_clusters: one plain-numpy driver
    loop over the parquet file in storage order — no Ray, no Dataset.limit, no
    pipeline code. Checks that the distributed path's sample order, seeded
    init, 5 Lloyd iterations, and per-batch assignment reproduce the spec
    bit-for-bit (per-row dot products are batch-boundary independent)."""
    if _CORPUS_CACHE.get("clusters_dumped") == sf_dir:
        return
    import pyarrow.parquet as pq

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m_all = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    m = m_all[np.argsort(ids)[:4096]]  # quantizer sample = 4096 lowest ids
    rng = np.random.Generator(np.random.PCG64(9))
    cent = m[rng.choice(len(m), size=min(16, len(m)), replace=False)]
    for _ in range(5):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    sims = m_all @ cent.T
    cell = np.argmax(sims, axis=1)
    from rayfrontier.functions.rounding import quantize

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cell.astype(np.int32), pa.int32()),
                "cos_to_centroid": pa.array(
                    quantize(sims[np.arange(len(cell)), cell], 6), pa.float64()
                ),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_embed_clusters.parquet"),
    )
    _CORPUS_CACHE["clusters_dumped"] = sf_dir


def _q_embed_clusters(sf_dir: str):
    """Deterministic k-means assignment over the embeddings table —
    SQL-checked against the sequential recompute (_embed_clusters_oracle_dump)."""
    import ray.data as rd

    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.similarity import cluster_assignments

    _embed_clusters_oracle_dump(sf_dir)
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = cluster_assignments(em, n_centroids=16)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return quantize_cols(t, {"cos_to_centroid": 6})


def _q_docs_word_count(sf_dir: str):
    from rayfrontier.pipelines.textstats import token_counts

    out = token_counts(_docs(sf_dir)).select_columns(["doc_id", "ws_tokens"])
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _q_docs_quality(sf_dir: str):
    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.textstats import quality_stats

    out = quality_stats(_docs(sf_dir))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return quantize_cols(
        t, {c: 6 for c in ("punct_ratio", "upper_ratio", "stop_ratio", "mean_word_len")}
    )


def _sample_keep(ids: np.ndarray) -> np.ndarray:
    """The 10% sampling predicate: splitmix64(doc_id) % 10 == 0. A pure
    row-wise hash filter instead of Ray's random_sample — the sample is a
    function of the KEY, not of block layout or an executor RNG, so it is
    reproducible across shard counts, resumable runs, and engines (which is
    both the 100 TB-correct sampler and what makes the oracle recompute
    possible)."""
    from rayfrontier.functions.hashing import splitmix64

    return (splitmix64(ids.astype(np.uint64)) % np.uint64(10)) == 0


def _profile_oracle_dump(sf_dir: str) -> None:
    """Sequential scalar recompute of the sampled language-ID + fingerprint
    profile: stdlib-`re` per-row stopword counts (vs the pipeline's Arrow RE2
    batch kernels) + the shared pure rolling_fingerprint kernel, assembled in
    one plain Python loop."""
    if _CORPUS_CACHE.get("profile_dumped") == sf_dir:
        return
    import re as _re

    import pyarrow.parquet as pq

    from rayfrontier.functions.hashing import rolling_fingerprint
    from rayfrontier.functions.rounding import quantize

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    keep = _sample_keep(ids)
    stops = {
        "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
        "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
        "de": ("der", "die", "und", "das", "von", "zu", "mit", "ist", "den", "nicht"),
    }
    pats = {
        lang: _re.compile(r"(?i)\b(?:" + "|".join(ws) + r")\b")
        for lang, ws in stops.items()
    }
    ws_re = _re.compile(r"\S+")
    out = {"doc_id": [], "lang_pred": [], "lang_conf": [], "fingerprint": []}
    for doc_id, text in zip(ids[keep], np.asarray(t["text"].to_pylist(), dtype=object)[keep]):
        nw = max(len(ws_re.findall(text)), 1)
        scores = [(len(p.findall(text)) / nw, lang) for lang, p in pats.items()]
        conf, pred = max(scores, key=lambda s: s[0])
        # ties resolve to the FIRST language in declaration order, matching
        # the vectorized argmax
        for c, lang in scores:
            if c == conf:
                pred = lang
                break
        out["doc_id"].append(int(doc_id))
        out["lang_pred"].append(pred if conf > 0.02 else "unknown")
        out["lang_conf"].append(conf)
        out["fingerprint"].append(np.int64(np.uint64(rolling_fingerprint(text, 8))).item())
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "lang_pred": pa.array(out["lang_pred"], pa.string()),
                "lang_conf": pa.array(quantize(out["lang_conf"], 6), pa.float64()),
                "fingerprint": pa.array(out["fingerprint"], pa.int64()),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_profile.parquet"),
    )
    _CORPUS_CACHE["profile_dumped"] = sf_dir


def _q_docs_sample_profile(sf_dir: str):
    """O3 sampling composed with language-ID + winnowing fingerprints fused
    into one map pass (textstats.profile — both are per-row functions of the
    same text, so no join and no driver-side merge at any scale). The sample
    is a key-hash predicate (splitmix64(doc_id) % 10), not random_sample —
    reproducible across block layouts and engines. SQL-checked against the
    sequential stdlib-re scalar recompute (_profile_oracle_dump)."""
    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.textstats import profile

    _profile_oracle_dump(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_sample_keep(ids)))

    sample = _docs(sf_dir).map_batches(keep, batch_format="pyarrow")
    out = profile(sample).to_pandas().sort_values("doc_id")
    return quantize_cols(
        pa.Table.from_pandas(out, preserve_index=False), {"lang_conf": 6}
    )


def _q_events_sketches(sf_dir: str):
    """The mergeable-sketch suite over events in one query, SQL-checked via
    the witness pattern: each row carries the EXACT value (recomputed
    independently by the DuckDB oracle — distinct count / group counts /
    quantile_cont, which matches np.quantile's linear interpolation bit-for-
    bit at the 6-decimal lattice) plus ``within_tol``, computed on the Ray
    side from the sketch estimate. The oracle asserts within_tol = true, so
    a sketch drifting past its bound turns the row red. Tolerances carry
    ≥2× margin over the measured deterministic errors at sf0.01 (HLL 1.33%
    → 5%, CMS 0% → 1%, KLL ≤0.73% → 3%); the estimates themselves are
    deterministic (fixed hashes, merge via max/sum; two fresh-session runs
    bit-equal). Sketches: HLL approx-distinct users, Count-Min top-3 event
    types, KLL p50/p90/p99 of value."""
    from rayfrontier.functions.blocks import read_parquet_bare
    from rayfrontier.functions.sketches import approx_distinct, approx_quantiles, heavy_hitters

    users = read_parquet_bare(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(users, "user_id")
    exact = len(users.unique("user_id"))
    rows = [("hll", "distinct_users", float(round(est)), float(exact), 5.0)]

    types = read_parquet_bare(f"{sf_dir}/events.parquet", columns=["event_type"])
    exact_counts = types.to_pandas()["event_type"].value_counts()
    # top-3 IDENTITY comes from the exact counts with the oracle's tie-break
    # (count DESC, event_type ASC) — a CMS overestimate near the rank-3
    # boundary must not change the candidate SET, only the within_tol check
    ec = exact_counts.reset_index()
    ec.columns = ["event_type", "n"]
    top3 = ec.sort_values(["n", "event_type"], ascending=[False, True]).head(3)["event_type"]
    cms_est = dict(heavy_hitters(types, "event_type", k=10))
    for val in top3:
        approx_n = cms_est.get(val, 0)
        rows.append(("cms", f"top_type:{val}", float(approx_n), float(exact_counts[val]), 1.0))

    values = read_parquet_bare(f"{sf_dir}/events.parquet", columns=["value"])
    import numpy as np_

    vals = values.to_pandas()["value"].to_numpy()
    for q, a in zip((0.5, 0.9, 0.99), approx_quantiles(values, "value", [0.5, 0.9, 0.99])):
        rows.append(("kll", f"p{int(q * 100)}_value", float(a), float(np_.quantile(vals, q)), 3.0))

    from rayfrontier.functions.rounding import quantize

    return pa.table(
        {
            "sketch": pa.array([r[0] for r in rows], pa.string()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            # DuckDB round lattice, matching the oracle's round(x, 6)
            "exact_value": pa.array(quantize([r[3] for r in rows], 6), pa.float64()),
            "within_tol": pa.array(
                [abs(r[2] - r[3]) / max(abs(r[3]), 1e-9) * 100 <= r[4] for r in rows]
            ),
            "tol_pct": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def _q_docs_dedup_components(sf_dir: str):
    """Near-dup GROUPS: exact 3-gram Jaccard pairs → connected components
    (min-label propagation). SQL-checked: the edge set is the same
    DuckDB-reproducible predicate as docs_ngram_pairs, and the fixpoint
    itself has a faithful recursive-CTE oracle (label propagation as
    transitive reachability + min per node). The minhash-LSH edge variant
    of the same operator is pinned by pytest (planted near-dup recall)."""
    from rayfrontier.pipelines.dedup import dedup_components, ngram_jaccard_pairs

    docs = _docs(sf_dir)
    pairs = ngram_jaccard_pairs(docs, jaccard_threshold=0.5, size_bytes=_docs_bytes(sf_dir))
    return dedup_components(pairs, docs.select_columns(["doc_id"]))


def _q_docs_ngram_pairs(sf_dir: str):
    """Exact n-gram Jaccard pairs — SQL-checked: the inverted-index pipeline
    (postings → co-occurrence counts → Jaccard) has a faithful DuckDB
    equivalent over string_split 3-gram sets, including the max_df=256
    stop-shingle guard (df filter on the co-occurrence side only, full
    shingle-set sizes in the denominator)."""
    from rayfrontier.functions.rounding import quantize_cols
    from rayfrontier.pipelines.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(sf_dir), jaccard_threshold=0.5, size_bytes=_docs_bytes(sf_dir))
    t = _stable_schema(
        out.to_pandas(), {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
    )
    return quantize_cols(t, {"jaccard": 6})


def _oracle_fnv64(data: bytes) -> int:
    """Inline FNV-1a 64 (public constants) — kept separate from
    functions.hashing so the multimodal oracles share no code with the
    pipeline they check."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _oracle_decode_px(data: bytes, fmt: str) -> np.ndarray:
    """Inline decoders written from the format specs (P6 PPM; the qjpg
    header layout documented in codecs.py) — independent of
    rayfrontier.codecs."""
    import struct

    if fmt == "ppm":
        head = data.split(b"\n", 3)
        w, h = (int(x) for x in head[1].split())
        return np.frombuffer(head[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    if fmt == "qjpg":
        w, h, step = struct.unpack("<HHB", data[4:9])
        codes = np.frombuffer(data, dtype=np.uint8, offset=9, count=w * h * 3)
        return np.minimum(codes.astype(np.int64) * step, 255).astype(np.uint8).reshape(h, w, 3)
    raise ValueError(f"oracle can't decode fmt={fmt!r}")


def _corpus_pages_arrow() -> pa.Table:
    """All corpus page rows, read with bare pyarrow (no Ray), sorted by
    image_id — the sequential ground for the multimodal oracles."""
    import glob as _glob

    import pyarrow.parquet as pq

    d = _corpus_dir()
    files = sorted(_glob.glob(os.path.join(d, "pages", "*", "*.parquet")))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["image_id", "bytes", "w", "h", "fmt"]) for f in files]
    )
    return t.sort_by("image_id")


def _image_oracle_dump() -> None:
    """Sequential recompute of the fused image-analysis outputs: per image,
    decode (inline), exact integer-moment mean/std, nearest-neighbor 12x10
    resize + inline-P6 re-encode + inline FNV digest, 8-bin per-channel
    histogram features — no Ray, no rayfrontier.codecs/stages. Shares only
    functions.rounding.quantize (both sides must round on the same DuckDB
    lattice, by repo convention)."""
    if _CORPUS_CACHE.get("image_dumped"):
        return
    import pyarrow.parquet as pq

    from rayfrontier.functions.rounding import quantize

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = _corpus_pages_arrow()
    out_w, out_h, bins, nfeat = 12, 10, 8, 24
    means, stds, rhash, feats = [], [], [], []
    for data, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
        px = _oracle_decode_px(data, fmt)
        n = px.size
        s1 = int(px.astype(np.int64).sum())
        s2 = int((px.astype(np.int64) ** 2).sum())
        mean = s1 / n
        means.append(mean)
        stds.append(float(np.sqrt(max(s2 / n - mean * mean, 0.0))))
        h, w = px.shape[:2]
        yi = [min(i * h // out_h, h - 1) for i in range(out_h)]
        xi = [min(j * w // out_w, w - 1) for j in range(out_w)]
        small = px[np.asarray(yi)[:, None], np.asarray(xi)[None, :]]
        raw = b"P6\n%d %d\n255\n" % (out_w, out_h) + small.tobytes()
        rhash.append(np.int64(np.uint64(_oracle_fnv64(raw))).item())
        v = np.concatenate(
            [np.bincount(px[:, :, c].ravel() // 32, minlength=bins) for c in range(3)]
        ).astype(np.float64)
        feats.append(v / v.sum())
    cols = {
        "image_id": t["image_id"],
        "w": t["w"],
        "h": t["h"],
        "fmt": t["fmt"],
        "mean_px": pa.array(quantize(np.asarray(means), 4), pa.float64()),
        "std_px": pa.array(quantize(np.asarray(stds), 4), pa.float64()),
        "decode_ok": pa.array([True] * t.num_rows),
        "resized_w": pa.array([out_w] * t.num_rows, pa.int32()),
        "resized_h": pa.array([out_h] * t.num_rows, pa.int32()),
        "resized_hash": pa.array(rhash, pa.int64()),
    }
    farr = quantize(np.asarray(feats), 6).reshape(-1, nfeat)
    for j in range(nfeat):
        cols[f"f{j:02d}"] = pa.array(farr[:, j], pa.float64())
    pq.write_table(pa.table(cols), os.path.join(_DUMP_DIR, "oracle_images.parquet"))
    _CORPUS_CACHE["image_dumped"] = True


def _frames_oracle_dump() -> None:
    """Expected frame-sample rows derived straight from the corpus parquet:
    lowest-64 image_ids, groups of 4 per video, stride-2 frame indices, the
    video fmt is frame 0's fmt, and each frame's payload IS the source image
    bytes — so the expected digests need no pack/unpack at all. The engine
    side must round-trip the container and explode rows to match."""
    if _CORPUS_CACHE.get("frames_dumped"):
        return
    import pyarrow.parquet as pq

    os.makedirs(_DUMP_DIR, exist_ok=True)
    t = _corpus_pages_arrow().slice(0, 64)
    payloads = t["bytes"].to_pylist()
    fmts = t["fmt"].to_pylist()
    chunk, stride = 4, 2
    vids, idxs, ofmts, hashes = [], [], [], []
    for v in range(len(payloads) // chunk):
        for i in range(0, chunk, stride):
            vids.append(f"vid{v:04d}")
            idxs.append(i)
            ofmts.append(fmts[v * chunk])
            hashes.append(np.int64(np.uint64(_oracle_fnv64(payloads[v * chunk + i]))).item())
    pq.write_table(
        pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "fmt": pa.array(ofmts, pa.string()),
                "frame_hash": pa.array(hashes, pa.int64()),
            }
        ),
        os.path.join(_DUMP_DIR, "oracle_frames.parquet"),
    )
    _CORPUS_CACHE["frames_dumped"] = True


def _q_image_pipeline(sf_dir: str):
    """The per-image analysis operators (decode-stats / resize / histogram
    features) as ONE fused actor-pool pass — a single decode per image
    (stages.multimodal.ImageAnalysisStage; decode dominates at 100 TB, so
    analysis passes that can share it must). Payloads reduced to digests
    before the driver compare; fused ≡ chained stages is test-pinned.
    SQL-checked against _image_oracle_dump — a sequential recompute with its
    OWN inline decoders/encoder/hash written from the format specs (no
    rayfrontier.codecs / stages / Ray). The 24 histogram features are
    flattened to scalar f00..f23 columns so the driver's value-hash sees
    them (list columns don't hash portably)."""
    from rayfrontier.functions.rounding import quantize, quantize_cols
    from rayfrontier.stages.multimodal import image_analysis

    _image_oracle_dump()
    out = image_analysis(_pages_bytes_ds(), out_w=12, out_h=10, bins=8)
    nfeat = 24  # 3 channels x 8 bins

    def q(t: pa.Table) -> pa.Table:
        cols = {
            name: t[name]
            for name in (
                "image_id", "w", "h", "fmt", "mean_px", "std_px",
                "decode_ok", "resized_w", "resized_h", "resized_hash",
            )
        }
        feats = [
            (list(f) + [0.0] * nfeat)[:nfeat] for f in t["feature"].to_pylist()
        ]
        arr = quantize(np.asarray(feats, dtype=np.float64).reshape(-1, nfeat), 6)
        for j in range(nfeat):
            cols[f"f{j:02d}"] = pa.array(arr[:, j], pa.float64())
        return quantize_cols(pa.table(cols), {"mean_px": 4, "std_px": 4})

    df = out.map_batches(q, batch_format="pyarrow").to_pandas().sort_values("image_id")
    return pa.Table.from_pandas(df, preserve_index=False)


def _q_frame_sample(sf_dir: str):
    """Synthesize a small video table (4 frames per video, packed container)
    from corpus images, then run the frame-sampler stage (flat-map explode).
    The 64 source images are the LOWEST image_ids (sort → limit) — a bare
    ``limit(64)`` depends on block arrival order and made the result vary
    run to run. SQL-checked against _frames_oracle_dump, which derives the
    expected frames straight from the corpus parquet (no Ray, no
    pack/unpack — the container round-trip is exactly what's under test)."""
    import ray.data as rd

    from rayfrontier.functions.hashing import fnv1a64
    from rayfrontier.stages.multimodal import pack_video, sample_frames

    _frames_oracle_dump()
    src = _pages_bytes_ds().sort("image_id").limit(64).to_pandas().sort_values("image_id")
    rows = []
    chunk = 4
    recs = src.to_dict("records")
    for v in range(len(recs) // chunk):
        frames = [recs[v * chunk + i]["bytes"] for i in range(chunk)]
        fmt = recs[v * chunk]["fmt"]
        rows.append({"video_id": f"vid{v:04d}", "bytes": pack_video(frames, fmt)})
    vids = rd.from_items(rows)
    out = sample_frames(vids, stride=2)

    def digest(t: pa.Table) -> pa.Table:
        hs = [np.int64(np.uint64(fnv1a64(b))).item() for b in t["bytes"].to_pylist()]
        return pa.table(
            {
                "video_id": t["video_id"],
                "frame_idx": t["frame_idx"],
                "fmt": t["fmt"],
                "frame_hash": pa.array(hs, pa.int64()),
            }
        )

    return pa.Table.from_pandas(
        out.map_batches(digest, batch_format="pyarrow").to_pandas(), preserve_index=False
    )


def _pages_bytes_ds():
    """Corpus pages with payload columns (for the multimodal stages)."""
    import ray.data as rd

    from rayfrontier.sources.storage import PagesStore

    d = _corpus_dir()
    store = PagesStore(d, _CORPUS_CACHE["cfg"].n_shards)
    return rd.read_parquet(
        store.shard_paths(range(_CORPUS_CACHE["cfg"].n_shards)),
        columns=["image_id", "bytes", "w", "h", "fmt"],
    )


def _q_crawl_summary(sf_dir: str):
    from rayfrontier.pipelines.report import domain_outcome_stats

    _parity_dumps()
    return domain_outcome_stats(_crawl_engine().domains_table())


def _q_link_outcomes(sf_dir: str):
    from rayfrontier.pipelines.report import link_outcome_stats

    _parity_dumps()
    return link_outcome_stats(_crawl_engine().crawl_log_table())


def _q_domain_page_counts(sf_dir: str):
    """A7 (domains.py:13-20 file-frequency, O(n²) there): pages per domain as
    one distributed groupby-count over the crawl log."""
    import ray.data as rd
    from ray.data.aggregate import Count

    _parity_dumps()
    log = _crawl_engine().crawl_log_table()
    out = rd.from_arrow(log).groupby("domain").aggregate(Count(alias_name="n_pages"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _q_crawl_log(sf_dir: str):
    """Full crawl log — SQL-checked against the sequential oracle's replay
    dump (engine ≡ oracle on the driver, not just in pytest)."""
    from rayfrontier.functions.rounding import quantize_cols

    _oracle_replay_dumps()
    return quantize_cols(_crawl_engine().crawl_log_table(), {"sim": 6})


def _q_crawl_url_seen(sf_dir: str):
    """URL-seen set with revisit counts (the reference's link_dict), checked
    against the oracle replay's url_seen dump."""
    _oracle_replay_dumps()
    return _crawl_engine().url_seen_table()


def _q_crawl_domains(sf_dir: str):
    """Per-domain outcome + incremental mean sim, checked against the oracle
    replay's domains dump."""
    from rayfrontier.functions.rounding import quantize_cols

    _oracle_replay_dumps()
    return quantize_cols(_crawl_engine().domains_table(), {"sim_avg": 6})


def _q_accepted_pages(sf_dir: str):
    """K1/K2: accepted policy pages (payload digest, not raw bytes), checked
    against purely-regenerated digests of the oracle replay's accepted set."""
    from rayfrontier.functions.hashing import fnv1a64
    from rayfrontier.functions.rounding import quantize_cols

    _oracle_replay_dumps()
    ds = _crawl_engine().accepted_pages_dataset()

    _DIGEST_SCHEMA = pa.schema(
        [
            ("image_id", pa.string()),
            ("domain", pa.string()),
            ("url", pa.string()),
            ("sim", pa.float64()),
            ("seq", pa.int64()),
            ("bytes_hash", pa.int64()),
            ("n_text_chars", pa.int64()),
        ]
    )

    def digest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # keep the schema on empty blocks (isin filter)
            return _DIGEST_SCHEMA.empty_table()
        hs = [np.int64(np.uint64(fnv1a64(b))).item() for b in t["bytes"].to_pylist()]
        return pa.table(
            {
                "image_id": t["image_id"],
                "domain": t["domain"],
                "url": t["url"],
                "sim": t["sim"],
                "seq": t["seq"],
                "bytes_hash": pa.array(hs, pa.int64()),
                "n_text_chars": pa.array([len(x) for x in t["text"].to_pylist()], pa.int64()),
            }
        )

    out = ds.map_batches(digest, batch_format="pyarrow")
    return quantize_cols(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"sim": 6})


def _q_url_canonicalize(sf_dir: str):
    """Canonicalizer over synthetic URLs derived from documents (M1 north-rule
    extension). SQL-checked: the template's canonical form is hand-derived
    from RFC 3986 in the oracle SQL itself (scheme/host lowercase, default
    port-80 drop, ``/a/../`` dot-segment resolution, percent-decode of the
    unreserved ``%7E`` → ``~``, query sort, fragment drop) — an independent
    expected-value oracle, not a kernel recompute. Adversarial-input kernel
    coverage (ports, userinfo, unicode, idempotence) stays in pytest."""
    import ray.data as rd

    from rayfrontier.functions.urltools import canonicalize, host_of

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def stage(t: pa.Table) -> pa.Table:
        urls = [
            f"HTTP://{s.upper()}.Example.COM:80/a/../docs/{d}?b=2&a=%7E1#frag"
            for s, d in zip(t["source"].to_pylist(), t["doc_id"].to_pylist())
        ]
        canon = [canonicalize(u) for u in urls]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "canon_url": pa.array(canon, pa.string()),
                "host": pa.array([host_of(c) for c in canon], pa.string()),
            }
        )

    return pa.Table.from_pandas(ds.map_batches(stage, batch_format="pyarrow").to_pandas(), preserve_index=False)


def queries() -> dict[str, Callable[[str], Any]]:
    """Exactly 50 queries (round-1 driver run recorded precisely the first 50
    registered queries, so the registry is capped at 50 and ordered
    SQL-checked-first; the round-1 orphans — verify_scores, sentence/list
    stats, sampling — are inside the cap now, with the multimodal and
    langid/fingerprint stages consolidated into composite queries)."""
    from rayfrontier.functions.groupagg import mute_empty_schema_warnings
    from rayfrontier.pipelines import relational as R

    # cosmetic "(empty) schema" bundles from native groupby aggregates under
    # low-cardinality keys; semantically fine, filtered at the module logger
    mute_empty_schema_warnings()

    return {
        # relational operator families (SQL-checked)
        "pricing_summary": R.q_pricing_summary,
        "top_orders": R.q_top_orders,
        "mkt_revenue": R.q_mkt_revenue,
        "order_status_counts": R.q_order_status_counts,
        "acctbal_band": R.q_acctbal_band,
        "distinct_event_types": R.q_distinct_event_types,
        "event_hourly": R.q_event_hourly,
        "top_lineitems_per_flag": R.q_top_lineitems_per_flag,
        "supplier_nation": R.q_supplier_nation,
        "part_name_kernel": R.q_part_name_kernel,
        "customer_no_orders": R.q_customer_no_orders,
        "lineitem_quantiles": R.q_lineitem_quantiles,
        "user_sessions": R.q_user_sessions,
        "click_last_purchase": R.q_click_last_purchase,
        "order_lineitem_join": R.q_order_lineitem_join,
        "event_hopping": R.q_event_hopping,
        "customer_running_total": R.q_customer_running_total,
        # documents / training-data operators (SQL-checked where expressible)
        "docs_exact_dedup": _q_docs_exact_dedup,
        "docs_word_count": _q_docs_word_count,
        "docs_quality": _q_docs_quality,
        "docs_ngram_pairs": _q_docs_ngram_pairs,
        "docs_dedup_components": _q_docs_dedup_components,
        "embed_dups": _q_embed_dups,
        "docs_minhash_pairs": _q_docs_minhash_pairs,
        "docs_simhash_pairs": _q_docs_simhash_pairs,
        "embed_clusters": _q_embed_clusters,
        "knn_ivf": _q_knn_ivf,
        "docs_sample_profile": _q_docs_sample_profile,
        "url_canonicalize": _q_url_canonicalize,
        "knn_brute": _q_knn_brute,
        "knn_batch": _q_knn_batch,
        # crawl/parse aggregations (SQL-checked against parquet dumps of the
        # engine's own deterministic parity tables — see _parity_dumps)
        "crawl_summary": _q_crawl_summary,
        "link_outcomes": _q_link_outcomes,
        "domain_page_counts": _q_domain_page_counts,
        "rule_stats": _q_rule_stats,
        "sentence_length_stats": _q_sentence_lengths,
        "list_stats": _q_list_stats,
        "tag_paragraphs": _q_tag_paragraphs,
        "sequential_text": _q_sequential_text,
        "rule_histograms": _q_rule_histograms,
        # crawl parity tables — SQL-checked against the INDEPENDENT sequential
        # oracle's replay dumps (_oracle_replay_dumps): the driver compare is
        # engine ≡ oracle, row for row
        "crawl_log": _q_crawl_log,
        "crawl_url_seen": _q_crawl_url_seen,
        "crawl_domains": _q_crawl_domains,
        "accepted_pages": _q_accepted_pages,
        # parse/verify parity tables — SQL-checked against the driver-
        # sequential scalar-spec recompute (_sequential_parse_dumps)
        "parse_elements": _q_elements,
        "parse_sentences": _q_sentences,
        "verify_scores": _q_scores,
        # multimodal actor-pool stages — SQL-checked against sequential
        # recomputes with inline decoders/hash (_image_oracle_dump /
        # _frames_oracle_dump)
        "image_pipeline": _q_image_pipeline,
        "frame_sample": _q_frame_sample,
        # rows-only (no faithful ANSI-SQL equivalent: sketch outputs are
        # approximations with in-query exact-witness columns)
        "events_sketches": _q_events_sketches,
    }


_EN_STOP_SQL = "the|and|of|to|a|in|is|that|for|it"


def _ensure_oracle_dumps(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """Best-effort pre-generation of every /tmp oracle dump the SQL below
    reads. The dumps are normally produced at the top of each query callable
    (cached per sf_dir), but that makes the SQL order-dependent: a harness
    that evaluates oracle_sql() strings BEFORE running the matching Ray query
    would hit missing parquet files. The generators are idempotent and
    cached (most are pure Python/numpy; _parity_dumps runs the engine once
    on the tiny parity corpus — the driver always has Ray initialised by the
    time it touches this module), so this is a cheap no-op on the second
    caller whichever side runs first."""
    import logging

    gens: list = [
        _oracle_replay_dumps,
        _parity_dumps,
        _sequential_parse_dumps,
        _image_oracle_dump,
        _frames_oracle_dump,
    ]
    if os.path.isdir(sf_dir):
        gens += [
            lambda: _simhash_oracle_dump(sf_dir),
            lambda: _embed_oracle_dump(sf_dir),
            lambda: _ivf_oracle_dump(sf_dir),
            lambda: _embed_clusters_oracle_dump(sf_dir),
            lambda: _profile_oracle_dump(sf_dir),
        ]
    for gen in gens:
        try:
            gen()
        except Exception:  # noqa: BLE001 — the gate must still see the SQL strings
            # surface the root cause; the SQL will later fail on the missing
            # parquet, which is opaque without this breadcrumb
            logging.getLogger(__name__).warning(
                "oracle dump generator %s failed", getattr(gen, "__name__", gen), exc_info=True
            )


def oracle_sql() -> dict[str, str]:
    _ensure_oracle_dumps()
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)  AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
                   round(avg(l_discount), 6)  AS avg_disc,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "mkt_revenue": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "order_status_counts": """
            SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
        """,
        "acctbal_band": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer WHERE c_acctbal BETWEEN 4000.0 AND 6000.0
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "event_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "top_lineitems_per_flag": """
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
            FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                     ) AS rn
              FROM lineitem
            ) WHERE rn <= 3
        """,
        "supplier_nation": """
            SELECT r_name,
                   count(*) AS n_suppliers,
                   round(avg(s_acctbal), 4) AS avg_bal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "part_name_kernel": """
            SELECT p_partkey,
                   lower(p_name) AS name_lower,
                   contains(lower(p_name), 'green') AS has_green,
                   len(regexp_extract_all(p_name, '\\S+')) AS n_words
            FROM part
        """,
        "customer_no_orders": """
            SELECT c_custkey, c_name FROM customer
            ANTI JOIN orders ON c_custkey = o_custkey
        """,
        "lineitem_quantiles": """
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.5)  AS p50,
                   quantile_disc(l_extendedprice, 0.9)  AS p90,
                   quantile_disc(l_extendedprice, 0.99) AS p99
            FROM lineitem GROUP BY l_returnflag
        """,
        "user_sessions": """
            SELECT user_id, session_id,
                   count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
            FROM (
              SELECT user_id, ts,
                     -- BIGINT cast: DuckDB's windowed sum yields DECIMAL(38,0),
                     -- which value-hashes differently from the engine's int64
                     CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS BIGINT) AS session_id
              FROM (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              )
            )
            GROUP BY user_id, session_id
        """,
        "click_last_purchase": """
            SELECT event_id, user_id, ts, last_purchase_ts
            FROM (
              SELECT event_id, user_id, ts, event_type,
                     max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS last_purchase_ts
              FROM events
            ) WHERE event_type = 'click'
        """,
        "order_lineitem_join": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "event_hopping": """
            SELECT event_type, win_start, count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM (
              SELECT event_type, value,
                     CAST(floor((epoch(ts) - j.j * 3600) / 7200) * 7200
                          + j.j * 3600 AS BIGINT) AS win_start
              FROM events, (SELECT 0 AS j UNION ALL SELECT 1) j
            )
            GROUP BY event_type, win_start
        """,
        "customer_running_total": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING
                   ), 2) AS running_total
            FROM orders
        """,
        "docs_exact_dedup": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "docs_word_count": """
            SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS ws_tokens
            FROM documents
        """,
        "docs_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '\\S+')) AS n_words,
                   round(len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(regexp_extract_all(text, '[A-Z]')) * 1.0
                         / greatest(length(text), 1), 6) AS upper_ratio,
                   round(len(regexp_extract_all(text, '(?i)\\b(?:{_EN_STOP_SQL})\\b')) * 1.0
                         / greatest(len(regexp_extract_all(text, '\\S+')), 1), 6) AS stop_ratio,
                   round(len(regexp_extract_all(text, '\\S')) * 1.0
                         / greatest(len(regexp_extract_all(text, '\\S+')), 1), 6) AS mean_word_len
            FROM documents
        """,
        "docs_ngram_pairs": """
            -- exact 3-gram Jaccard ≥ 0.5 with the engine's max_df=256
            -- stop-shingle guard: df-capped shingles feed the co-occurrence
            -- counts only; denominators use the FULL per-doc shingle-set size
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            allowed AS (
              SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 256
            ),
            co AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
              FROM sh x
              JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              WHERE x.s IN (SELECT s FROM allowed)
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b,
                   round(common * 1.0 / (sa.n + sb.n - common), 6) AS jaccard
            FROM co
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
        """,
        "docs_dedup_components": """
            -- connected components over the exact 3-gram Jaccard ≥ 0.5 edge
            -- set (same predicate as docs_ngram_pairs): transitive label
            -- reachability via a recursive CTE, then min label per node.
            -- Propagating only labels smaller than the receiving node keeps
            -- the closure small without losing the per-component minimum
            -- (the min label is below every other id in its component, so
            -- every hop of its propagation path passes the guard).
            WITH RECURSIVE toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            allowed AS (
              SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 256
            ),
            co AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
              FROM sh x
              JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              WHERE x.s IN (SELECT s FROM allowed)
              GROUP BY x.doc_id, y.doc_id
            ),
            pairs AS (
              SELECT a, b FROM co
              JOIN sizes sa ON sa.doc_id = a
              JOIN sizes sb ON sb.doc_id = b
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
            ),
            edges AS (
              SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, lab) AS (
              SELECT doc_id AS node, doc_id AS lab FROM documents
              UNION
              SELECT e.b AS node, r.lab
              FROM reach r JOIN edges e ON e.a = r.node
              WHERE r.lab < e.b
            )
            SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
            FROM reach GROUP BY node
        """,
        "knn_batch": """
            SELECT query_id, vec_id, cos FROM (
              SELECT q.vec_id AS query_id, e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                                e.vec_id
                     ) AS rn
              FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
              WHERE e.vec_id >= 5
            ) WHERE rn <= 3
        """,
        "knn_brute": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id <> 0
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id
            LIMIT 10
        """,
        # -- crawl/parse aggregation oracles over the engine's parity-table
        # -- dumps (_parity_dumps writes them before any of these run)
        "crawl_summary": f"""
            SELECT status, CAST(count(*) AS BIGINT) AS n,
                   round(count(*) * 100.0 /
                         greatest((SELECT count(*) FROM read_parquet('{_DUMP_DIR}/domains.parquet')), 1),
                         2) AS pct
            FROM read_parquet('{_DUMP_DIR}/domains.parquet')
            GROUP BY status
        """,
        "link_outcomes": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_links,
                   CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
                   CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
                   CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                   round(sum(CASE WHEN ok THEN 1 ELSE 0 END) * 100.0
                         / greatest(count(*), 1), 2) AS pct_ok,
                   round(sum(CASE WHEN valid THEN 1 ELSE 0 END) * 100.0
                         / greatest(count(*), 1), 2) AS pct_valid
            FROM read_parquet('{_DUMP_DIR}/crawl_log.parquet')
        """,
        "domain_page_counts": f"""
            SELECT domain, CAST(count(*) AS BIGINT) AS n_pages
            FROM read_parquet('{_DUMP_DIR}/crawl_log.parquet')
            GROUP BY domain
        """,
        "rule_stats": f"""
            SELECT doc_id, rule, CAST(count(*) AS BIGINT) AS hits
            FROM (
              SELECT doc_id, unnest(rule_hits) AS rule
              FROM read_parquet('{_DUMP_DIR}/sentences.parquet')
            )
            GROUP BY doc_id, rule
        """,
        "sentence_length_stats": f"""
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_sentences,
                   round(avg(n_words), 6) AS mean_words,
                   CAST(max(n_words) AS BIGINT) AS max_words
            FROM read_parquet('{_DUMP_DIR}/sentences.parquet')
            GROUP BY doc_id
        """,
        "list_stats": f"""
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lists,
                   round(avg(length(text) - length(replace(text, chr(10), ''))), 6) AS avg_items
            FROM read_parquet('{_DUMP_DIR}/elements.parquet')
            WHERE tag = 'l'
            GROUP BY doc_id
        """,
        "tag_paragraphs": f"""
            SELECT doc_id, seq_idx, tag_idx, prec_by, proc_by, text
            FROM read_parquet('{_DUMP_DIR}/elements.parquet')
            WHERE tag = 'p'
        """,
        "sequential_text": f"""
            SELECT doc_id,
                   string_agg(tag || CAST(tag_idx AS VARCHAR) || chr(10) || text,
                              chr(10) ORDER BY seq_idx) AS sequential_text
            FROM read_parquet('{_DUMP_DIR}/elements.parquet')
            GROUP BY doc_id
        """,
        "rule_histograms": f"""
            WITH per_doc AS (
              SELECT doc_id, rule, count(*) AS hits
              FROM (
                SELECT doc_id, unnest(rule_hits) AS rule
                FROM read_parquet('{_DUMP_DIR}/sentences.parquet')
              )
              GROUP BY doc_id, rule
            )
            SELECT rule,
                   CAST(least(floor(hits / 10) * 10, 400) AS BIGINT) AS bin_lo,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM per_doc
            GROUP BY rule, bin_lo
        """,
        # -- crawl parity oracles over the INDEPENDENT sequential replay's
        # -- dumps (_oracle_replay_dumps — rayfrontier/oracle.py, its own
        # -- control flow): driver compare = engine ≡ oracle, row for row
        "crawl_log": f"""
            SELECT domain, url, round(sim, 6) AS sim, ok, valid, dup, seq
            FROM read_parquet('{_DUMP_DIR}/oracle_crawl_log.parquet')
        """,
        "crawl_url_seen": f"""
            SELECT url, revisits
            FROM read_parquet('{_DUMP_DIR}/oracle_url_seen.parquet')
        """,
        "crawl_domains": f"""
            SELECT domain, status, round(sim_avg, 6) AS sim_avg
            FROM read_parquet('{_DUMP_DIR}/oracle_domains.parquet')
        """,
        "accepted_pages": f"""
            SELECT image_id, domain, url, round(sim, 6) AS sim, seq,
                   bytes_hash, n_text_chars
            FROM read_parquet('{_DUMP_DIR}/oracle_accepted.parquet')
        """,
        # -- parse/verify oracles over the driver-sequential SCALAR-spec
        # -- recompute (_sequential_parse_dumps): scalar rule walk + inline
        # -- first-wins dedup vs the vectorized / coarse-partitioned Dataset
        # -- paths
        "parse_elements": f"""
            SELECT doc_id, seq_idx, tag, tag_idx, prec_by, proc_by, text,
                   parse_ok, n_leftover
            FROM read_parquet('{_DUMP_DIR}/oracle_elements.parquet')
        """,
        "parse_sentences": f"""
            SELECT doc_id, seq_idx, tag, prec_by, proc_by, sent_idx, text,
                   n_words, rule_hits
            FROM read_parquet('{_DUMP_DIR}/oracle_sentences.parquet')
        """,
        "verify_scores": f"""
            SELECT doc_id, round(sim, 6) AS sim, english, dup, borderline
            FROM read_parquet('{_DUMP_DIR}/oracle_scores.parquet')
        """,
        # -- events_sketches oracle (witness pattern): the exact_value column
        # -- is recomputed in pure SQL (distinct count / top-3 group counts /
        # -- quantile_cont == np.quantile linear interpolation at the 6-dec
        # -- lattice); within_tol is asserted true — if a sketch estimate on
        # -- the Ray side drifts past its bound the hash compare goes red
        "events_sketches": """
            WITH ex AS (
              SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS du,
                     round(quantile_cont(value, 0.5), 6)  AS p50,
                     round(quantile_cont(value, 0.9), 6)  AS p90,
                     round(quantile_cont(value, 0.99), 6) AS p99
              FROM events
            )
            SELECT 'hll' AS sketch, 'distinct_users' AS metric,
                   du AS exact_value, true AS within_tol, 5.0 AS tol_pct
            FROM ex
            UNION ALL
            SELECT * FROM (
              SELECT 'cms' AS sketch, 'top_type:' || event_type AS metric,
                     CAST(count(*) AS DOUBLE) AS exact_value,
                     true AS within_tol, 1.0 AS tol_pct
              FROM events GROUP BY event_type
              ORDER BY count(*) DESC, event_type LIMIT 3
            )
            UNION ALL
            SELECT 'kll', 'p50_value', p50, true, 3.0 FROM ex
            UNION ALL
            SELECT 'kll', 'p90_value', p90, true, 3.0 FROM ex
            UNION ALL
            SELECT 'kll', 'p99_value', p99, true, 3.0 FROM ex
        """,
        # -- embed_dups oracle: brute-force O(n²) exact cosine over the
        # -- planted table (_embed_oracle_dump) — independent discovery vs
        # -- the seeded-LSH candidate path; both exact-verify in float64
        "embed_dups": f"""
            SELECT a, b, round(cos, 6) AS cos
            FROM read_parquet('{_DUMP_DIR}/oracle_embed_pairs.parquet')
        """,
        # -- minhash oracle: pure exact 3-gram Jaccard (no df guard — minhash
        # -- has none); the LSH candidate set is deterministic (seeded
        # -- permutations) and covers every ≥0.5 pair at this scale
        "docs_minhash_pairs": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            co AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
              FROM sh x
              JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b,
                   round(common * 1.0 / (sa.n + sb.n - common), 6) AS jaccard
            FROM co
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
        """,
        # -- simhash oracle: brute-force O(n²) Hamming ≤ 3 over simhash64
        # -- fingerprints (_simhash_oracle_dump) — banding recall is provable
        # -- at ≤3 by pigeonhole (4 disjoint 16-bit bands)
        "docs_simhash_pairs": f"""
            SELECT a, b, hamming
            FROM read_parquet('{_DUMP_DIR}/oracle_simhash_pairs.parquet')
        """,
        # -- embed_clusters oracle: sequential plain-numpy Lloyd recompute in
        # -- parquet storage order (_embed_clusters_oracle_dump)
        "embed_clusters": f"""
            SELECT vec_id, cluster, cos_to_centroid
            FROM read_parquet('{_DUMP_DIR}/oracle_embed_clusters.parquet')
        """,
        # -- knn_ivf oracle: sequential IVF recompute (quantizer + probe +
        # -- exact top-k, plain numpy in storage order — _ivf_oracle_dump)
        "knn_ivf": f"""
            SELECT vec_id, cos
            FROM read_parquet('{_DUMP_DIR}/oracle_ivf.parquet')
        """,
        # -- sample-profile oracle: key-hash sample + stdlib-re scalar langid
        # -- + shared rolling_fingerprint, one sequential loop
        # -- (_profile_oracle_dump) vs the fused Arrow-RE2 batch pass
        "docs_sample_profile": f"""
            SELECT doc_id, lang_pred, round(lang_conf, 6) AS lang_conf,
                   fingerprint
            FROM read_parquet('{_DUMP_DIR}/oracle_profile.parquet')
        """,
        # -- url_canonicalize oracle: the RFC-3986 canonical form of the
        # -- query's URL template, hand-derived in SQL (lowercase scheme/host,
        # -- port-80 drop, /a/../ resolution, %7E → ~, query sort, no
        # -- fragment) — expected-value oracle, independent of the kernel
        "url_canonicalize": """
            SELECT doc_id,
                   'http://' || source || '.example.com/docs/' || doc_id
                       || '?a=~1&b=2' AS canon_url,
                   source || '.example.com' AS host
            FROM documents
        """,
        # -- multimodal oracles: sequential recomputes with inline
        # -- decoders/encoder/FNV (no Ray, no shared codec/stage code)
        "image_pipeline": f"""
            SELECT * FROM read_parquet('{_DUMP_DIR}/oracle_images.parquet')
        """,
        "frame_sample": f"""
            SELECT * FROM read_parquet('{_DUMP_DIR}/oracle_frames.parquet')
        """,
    }
