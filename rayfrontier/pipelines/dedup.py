"""Deduplication suite over a documents table (doc_id, text).

Beyond the reference's exact full-text dedup (``src/verification/verify.py:
142-155``), the large-scale training-data operators:

* exact_dedup        — hash-partitioned first-wins (groupby text → min doc_id)
* minhash_lsh_pairs  — shingle → MinHash → LSH band buckets → candidate pairs
                       → exact-Jaccard verification (all Ray Data stages; the
                       only shuffle keys on (band, band_hash))
* simhash_pairs      — 64-bit SimHash, bucket by 4 × 16-bit bands (any pair
                       within Hamming distance ≤ 3 of 64 shares ≥1 band whp on
                       near-dups), verify Hamming ≤ threshold
* ngram_jaccard_pairs— exact n-gram Jaccard on LSH candidates
* embedding_dups     — cosine near-dup over an embedding column: multi-table
                       OR-amplified hyperplane LSH, exact-cosine verify via
                       keyed joins (see similarity.py for the ANN machinery)

Each stage pre-aggregates inside map_batches before any groupby, and ships
only ids + sketches — never full text — through shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    hash_text,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    shingle_hashes,
    simhash64,
)

NUM_PERM = 64
BANDS = 16
_BROADCAST_PAIR_MAX = 10_000  # candidate pairs below this: broadcast-verify


def exact_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
                size_bytes: int | None = None):
    """First-wins exact dedup: one row per distinct text, winner = min id.

    Shuffle key is a 64-bit hash of the text, not the text itself (SURVEY.md
    §4 memory discipline). Returns (text_hash, keep_id, n_copies).

    ``size_bytes``: approximate bytes of the SHUFFLED stream (~24 B/doc here —
    hash + id), used to size the coarse partition count to the data
    (groupagg.auto_nparts). None pins the floor (2× cluster CPUs).
    """
    def hash_stage(t: pa.Table) -> pa.Table:
        h = np.fromiter((hash_text(x) for x in t[text_col].to_pylist()), dtype=np.uint64, count=t.num_rows)
        return pa.table(
            {
                "text_hash": pa.array(h.astype(np.int64), pa.int64()),
                id_col: t[id_col],
            }
        )

    from ..functions.groupagg import coarse_group_aggregate

    # text_hash cardinality ≈ #docs → coarse-partitioned aggregate, never a
    # native groupby with millions of groups (see functions/groupagg.py)
    def first_wins(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text_hash", as_index=False)
        out = g.agg(keep_id=(id_col, "min"), n_copies=(id_col, "size"))
        return out

    return coarse_group_aggregate(
        docs.map_batches(hash_stage, batch_format="pyarrow"),
        ["text_hash"],
        first_wins,
        size_bytes=size_bytes,
    )


class SketchStage:
    """doc → (minhash signature bands, simhash, #shingles). One actor-state
    compile; emits BANDS rows per doc keyed (band, band_hash) for the LSH
    groupby."""

    def __init__(self, k: int = 3, num_perm: int = NUM_PERM, bands: int = BANDS):
        self.k = k
        self.num_perm = num_perm
        self.bands = bands

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands_out, bh_out = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = shingle_hashes(text, self.k)
            sig = minhash_signature(sh, self.num_perm)
            keys = lsh_band_keys(sig, self.bands)
            for b, kh in enumerate(keys):
                ids.append(doc_id)
                bands_out.append(b)
                bh_out.append(np.int64(np.uint64(kh)).item())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands_out, pa.int32()),
                "band_hash": pa.array(bh_out, pa.int64()),
            }
        )


def minhash_lsh_pairs(docs, jaccard_threshold: float = 0.6, k: int = 3,
                      verify_broadcast_max: int = _BROADCAST_PAIR_MAX,
                      size_bytes: int | None = None):
    """MinHash+LSH candidate pairs verified by exact Jaccard.

    Stages: sketch (map_batches) → groupby(band, band_hash) → emit candidate
    pairs per bucket → distinct pairs → verify with exact shingle Jaccard,
    where candidate texts arrive via hash-partitioned keyed-lookup joins
    (see _verify_pairs_jaccard) — no full-corpus broadcast.
    Returns (a, b, jaccard) with a < b, jaccard >= threshold.
    """
    sketcher = SketchStage(k=k)  # stateless-ish: ships fine as a task closure
    # batch_size=None: one task per input block — an explicit batch_size
    # bundles blocks and strangles the CPU-heavy sketch stage's parallelism
    bands = docs.map_batches(sketcher, batch_format="pyarrow", batch_size=None)

    # co-locate equal (band, band_hash) via a COARSE partition key, then do the
    # fine-grained bucket grouping vectorized in pandas per partition — one
    # map_groups call per partition, not per bucket (tiny-group map_groups is
    # the classic Ray Data anti-pattern; SURVEY.md §4 batched-RPC discipline).
    # Partition count scales with the data (per-partition pandas memory stays
    # ~constant); pass size_bytes ≈ source text bytes — band rows are
    # id+hash-only so this over-partitions, the safe direction.
    from ..functions.groupagg import auto_nparts

    NPART = auto_nparts(size_bytes)

    def add_part(t: pa.Table) -> pa.Table:
        part = (
            np.abs(t["band_hash"].to_numpy(zero_copy_only=False)) % NPART
        ).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def partition_pairs(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        out_a, out_b = [], []
        for (_b, _h), grp in g.groupby(["band", "band_hash"], sort=False):
            ids = sorted(grp["doc_id"].unique().tolist())
            if len(ids) < 2 or len(ids) > 200:  # salt guard: skip mega-buckets
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        df = pd.DataFrame({"a": out_a, "b": out_b}).drop_duplicates()
        return pa.table(
            {"a": pa.array(df["a"], pa.int64()), "b": pa.array(df["b"], pa.int64())}
        )

    from ..functions.groupagg import grouped_map

    pairs = grouped_map(
        bands.map_batches(add_part, batch_format="pyarrow"), "part", partition_pairs
    )
    # distinct candidate pairs (a,b can surface from several bands/partitions);
    # pair cardinality scales with data → coarse-partitioned distinct
    from ..functions.groupagg import pair_distinct

    distinct = pair_distinct(pairs)
    return _verify_pairs_jaccard(distinct, docs, k, jaccard_threshold,
                                 broadcast_max=verify_broadcast_max)


def _verify_pairs_jaccard(pairs, docs, k: int, threshold: float,
                          broadcast_max: int = _BROADCAST_PAIR_MAX):
    """Exact-Jaccard verification of candidate (a, b) pairs.

    Size-adaptive strategy (the classic broadcast-vs-shuffle join choice):
    the candidate set is materialized (distributed, O(pairs) in plasma) and
    counted. Small sets (≤ _BROADCAST_PAIR_MAX) gather ONLY the candidate
    ids' texts and broadcast that bounded dict — one `ray.put` of ≤2·max
    texts, not the corpus. Larger sets ride two hash-partitioned joins
    (on a, then on b), so the shuffle carries only candidate rows' texts —
    never a full-corpus broadcast (O(corpus × workers) memory at 100 TB).
    Per-worker shingle memo amortizes re-shingling of repeated ids."""
    import pyarrow.compute as pc
    import ray

    pairs = pairs.materialize()
    if pairs.count() <= broadcast_max:
        cand = pairs.to_pandas()
        ids = np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])) if len(cand) else np.array([], dtype=np.int64)
        ids_ref = ray.put(ids.astype(np.int64))

        def pick(t: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            keys = t["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(want, keys)
            idx_c = np.clip(idx, 0, max(len(want) - 1, 0))
            hit = (idx < len(want)) & (want[idx_c] == keys) if len(want) else np.zeros(len(keys), bool)
            return t.filter(pa.array(hit))

        picked = docs.select_columns(["doc_id", "text"]).map_batches(
            pick, batch_format="pyarrow"
        ).to_pandas()
        texts_ref = ray.put(dict(zip(picked["doc_id"], picked["text"])))

        def verify_small(t: pa.Table) -> pa.Table:
            texts = ray.get(texts_ref)
            sh_cache: dict[int, np.ndarray] = {}

            def sh(i: int) -> np.ndarray:
                got = sh_cache.get(i)
                if got is None:
                    got = sh_cache[i] = shingle_hashes(texts[i], k)
                return got

            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            jac = [jaccard(sh(x), sh(y)) for x, y in zip(a, b)]
            out = pa.table(
                {
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )
            return out.filter(pc.greater_equal(out["jaccard"], pa.scalar(threshold)))

        return pairs.map_batches(verify_small, batch_format="pyarrow", batch_size=4096)

    from ..functions.joins import hash_join

    texts = docs.select_columns(["doc_id", "text"])

    def keep_a(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"], "text_a": t["text"]})

    # nparts deliberately small: BOTH joins' aggregator pools are alive at
    # once (join2 streams join1's output); sizing each pool to ~1/4 of the
    # cluster leaves CPUs for the task operators (full-width pools reserve
    # every CPU and deadlock)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, ncpu // 4)
    j1 = hash_join(pairs, texts, on="a", right_on="doc_id", nparts=nparts).map_batches(
        keep_a, batch_format="pyarrow"
    )

    def keep_b(t: pa.Table) -> pa.Table:
        return pa.table(
            {"a": t["a"], "b": t["b"], "text_a": t["text_a"], "text_b": t["text"]}
        )

    j2 = hash_join(j1, texts, on="b", right_on="doc_id", nparts=nparts).map_batches(
        keep_b, batch_format="pyarrow"
    )

    def verify(t: pa.Table) -> pa.Table:
        sh_cache: dict[int, np.ndarray] = {}

        def sh(i: int, text: str) -> np.ndarray:
            got = sh_cache.get(i)
            if got is None:
                got = sh_cache[i] = shingle_hashes(text, k)
            return got

        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        jac = [jaccard(sh(x, xa), sh(y, yb)) for x, xa, y, yb in zip(a, ta, b, tb)]
        out = pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], pa.scalar(threshold)))

    return j2.map_batches(verify, batch_format="pyarrow", batch_size=4096)


def simhash_pairs(docs, max_hamming: int = 3, size_bytes: int | None = None):
    """SimHash near-dup: bucket on each of four 16-bit bands, verify Hamming.

    ``size_bytes`` sizes the coarse bucket-partition count to the data
    (groupagg.auto_nparts); None pins the floor."""
    def sketch(t: pa.Table) -> pa.Table:
        ids, band, key, sh = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = simhash64(text)
            for b in range(4):
                ids.append(doc_id)
                band.append(b)
                key.append((h >> (16 * b)) & 0xFFFF)
                sh.append(np.int64(np.uint64(h)).item())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(band, pa.int32()),
                "key": pa.array(key, pa.int32()),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    from ..functions.groupagg import auto_nparts

    NPART = auto_nparts(size_bytes)

    def add_part(t: pa.Table) -> pa.Table:
        part = (
            (t["band"].to_numpy(zero_copy_only=False).astype(np.int64) * 16384
             + t["key"].to_numpy(zero_copy_only=False).astype(np.int64))
            % NPART
        ).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def partition_pairs(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        a, b, hm = [], [], []
        for (_band, _key), grp in g.groupby(["band", "key"], sort=False):
            rows = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].tolist()
            hs = rows["simhash"].tolist()
            if len(ids) < 2 or len(ids) > 200:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin((hs[i] ^ hs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        a.append(ids[i])
                        b.append(ids[j])
                        hm.append(d)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "hamming": pa.array(hm, pa.int64()),
            }
        )

    from ..functions.groupagg import grouped_map, pair_min

    sk = docs.map_batches(sketch, batch_format="pyarrow", batch_size=None)
    pairs = grouped_map(
        sk.map_batches(add_part, batch_format="pyarrow"), "part", partition_pairs
    )
    return pair_min(pairs, "hamming")


def embedding_dups(
    embeds,
    cos_threshold: float = 0.95,
    id_col: str = "vec_id",
    n_tables: int = 8,
    n_planes: int = 12,
    verify_broadcast_max: int = _BROADCAST_PAIR_MAX,
):
    """Embedding-cosine near-dup via MULTI-TABLE random-hyperplane LSH with
    exact cosine verification through a keyed-lookup join.

    OR-amplification: ``n_tables`` independent plane sets; a pair collides if
    it shares a bucket in ANY table — recall for a pair at angle θ is
    1-(1-(1-θ/π)^n_planes)^n_tables (≈0.97 at cos 0.9 with 8×12), versus
    ≈0.64 for round 1's single 16-plane table. Bucket keys ship as ints
    (table, key, id) — never the vectors; candidate vectors arrive at the
    verify stage via hash-partitioned joins (same pattern as minhash's
    _verify_pairs_jaccard), not a broadcast.
    """

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        n, d = vecs.shape
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        out_id, out_tbl, out_key = [], [], []
        for tbl in range(n_tables):
            rng = np.random.Generator(np.random.PCG64(1234 + tbl))
            planes = rng.normal(size=(d, n_planes))
            bits = (unit @ planes) > 0
            key = bits @ (1 << np.arange(n_planes))
            out_id.append(ids)
            out_tbl.append(np.full(n, tbl, dtype=np.int32))
            out_key.append(key.astype(np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "table": pa.array(np.concatenate(out_tbl), pa.int32()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
            }
        )

    NPART = 64

    def add_part(t: pa.Table) -> pa.Table:
        part = (
            (t["table"].to_numpy(zero_copy_only=False).astype(np.int64) * 1_000_003
             + t["key"].to_numpy(zero_copy_only=False))
            % NPART
        ).astype(np.int32)
        return t.append_column("part", pa.array(np.abs(part), pa.int32()))

    def partition_pairs(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        a_out, b_out = [], []
        for (_tbl, _key), grp in g.groupby(["table", "key"], sort=False):
            ids = np.sort(grp[id_col].unique())
            if len(ids) < 2 or len(ids) > 500:  # mega-bucket guard
                continue
            iu = np.triu_indices(len(ids), 1)
            a_out.append(ids[iu[0]])
            b_out.append(ids[iu[1]])
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        df = pd.DataFrame(
            {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
        ).drop_duplicates()
        return pa.table({"a": pa.array(df["a"], pa.int64()), "b": pa.array(df["b"], pa.int64())})

    from ..functions.groupagg import grouped_map, pair_distinct

    sk = embeds.map_batches(sketch, batch_format="pyarrow", batch_size=None)
    pairs = pair_distinct(
        grouped_map(
            sk.map_batches(add_part, batch_format="pyarrow"), "part", partition_pairs
        )
    )
    return _verify_pairs_cosine(pairs, embeds, cos_threshold, id_col,
                                broadcast_max=verify_broadcast_max)


def _verify_pairs_cosine(pairs, embeds, threshold: float, id_col: str = "vec_id",
                         broadcast_max: int = _BROADCAST_PAIR_MAX):
    """Exact-cosine verification of candidate (a, b) pairs — same
    size-adaptive strategy as _verify_pairs_jaccard: small candidate sets
    broadcast only the candidates' vectors; large ones ride two
    hash-partitioned joins so only candidate rows' vectors move (never a
    full-table broadcast). Cosine computed vectorized per batch."""
    import pyarrow.compute as pc
    import ray

    pairs = pairs.materialize()
    if pairs.count() <= broadcast_max:
        cand = pairs.to_pandas()
        ids = (
            np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()]))
            if len(cand)
            else np.array([], dtype=np.int64)
        )
        ids_ref = ray.put(ids.astype(np.int64))

        def pick(t: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            keys = t[id_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(want, keys)
            idx_c = np.clip(idx, 0, max(len(want) - 1, 0))
            hit = (idx < len(want)) & (want[idx_c] == keys) if len(want) else np.zeros(len(keys), bool)
            return t.filter(pa.array(hit))

        picked = embeds.select_columns([id_col, "embedding"]).map_batches(
            pick, batch_format="pyarrow"
        ).to_pandas()
        vecs_np = {
            int(i): np.asarray(v, dtype=np.float64)
            for i, v in zip(picked[id_col], picked["embedding"])
        }
        for i, v in vecs_np.items():
            vecs_np[i] = v / max(np.linalg.norm(v), 1e-12)
        vecs_ref = ray.put(vecs_np)

        def verify_small(t: pa.Table) -> pa.Table:
            vecs = ray.get(vecs_ref)
            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            cos = [float(vecs[x] @ vecs[y]) for x, y in zip(a, b)]
            out = pa.table(
                {
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "cos": pa.array(cos, pa.float64()),
                }
            )
            return out.filter(pc.greater_equal(out["cos"], pa.scalar(threshold)))

        return pairs.map_batches(verify_small, batch_format="pyarrow", batch_size=8192)

    from ..functions.joins import hash_join

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, ncpu // 4)

    # Acero (the native join) rejects list-typed non-key columns — the
    # vectors ride the joins as float64 LE bytes instead
    def pack(t: pa.Table) -> pa.Table:
        blobs = [
            np.asarray(v, dtype=np.float64).tobytes() for v in t["embedding"].to_pylist()
        ]
        return pa.table({id_col: t[id_col], "vecb": pa.array(blobs, pa.binary())})

    vecs = embeds.map_batches(pack, batch_format="pyarrow")

    def keep_a(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"], "vec_a": t["vecb"]})

    def keep_b(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"], "vec_a": t["vec_a"], "vec_b": t["vecb"]})

    j1 = hash_join(pairs, vecs, on="a", right_on=id_col, nparts=nparts).map_batches(
        keep_a, batch_format="pyarrow"
    )
    j2 = hash_join(j1, vecs, on="b", right_on=id_col, nparts=nparts).map_batches(
        keep_b, batch_format="pyarrow"
    )

    def verify(t: pa.Table) -> pa.Table:
        va = np.array([np.frombuffer(x, dtype=np.float64) for x in t["vec_a"].to_pylist()])
        vb = np.array([np.frombuffer(x, dtype=np.float64) for x in t["vec_b"].to_pylist()])
        if len(va) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        va /= np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-12)
        vb /= np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", va, vb)
        out = pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["cos"], pa.scalar(threshold)))

    return j2.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def ngram_jaccard_pairs(docs, jaccard_threshold: float = 0.6, k: int = 3, max_df: int = 256,
                        size_bytes: int | None = None):
    """Exact n-gram Jaccard similarity join via a distributed inverted index.

    Unlike :func:`minhash_lsh_pairs` (probabilistic candidates, exact verify),
    this computes |A∩B| exactly from shingle postings — no sketch error:

      1. per doc: unique k-word shingle hashes → postings rows
         ``(shingle_hash, doc_id)`` + doc sizes ``(doc_id, n_shingles)``
      2. groupby(shingle_hash): each posting list of length m emits its
         m·(m-1)/2 doc pairs (one row per co-occurrence)
      3. groupby(a, b).count() = |A∩B|; Jaccard from the broadcast size map:
         ``common / (|A| + |B| - common)``

    ``max_df`` caps posting-list length (stop-shingle guard — the skew salt
    of SURVEY.md §4): shingles appearing in > max_df docs are dropped, which
    can only *under*-count intersections of pairs whose overlap is entirely
    stop-shingles; with thresholds ≥ 0.5 such pairs are not near-dups.
    Shuffles carry only (uint64, int64) rows — never text; each doc's
    shingle count rides with its postings so Jaccard scoring needs no size
    broadcast or join.
    """

    def postings(t: pa.Table) -> pa.Table:
        sh_out, id_out, n_out = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = shingle_hashes(text, k)
            sh_out.append(sh.astype(np.int64))
            id_out.append(np.full(sh.size, doc_id, dtype=np.int64))
            n_out.append(np.full(sh.size, sh.size, dtype=np.int64))
        empty = np.array([], dtype=np.int64)
        return pa.table(
            {
                "shingle": pa.array(np.concatenate(sh_out) if sh_out else empty, pa.int64()),
                "doc_id": pa.array(np.concatenate(id_out) if id_out else empty, pa.int64()),
                # each doc's shingle count rides WITH its postings (+8 bytes/row)
                # so candidate pairs surface with both sizes attached — no
                # second corpus pass, no size broadcast, no join
                "n": pa.array(np.concatenate(n_out) if n_out else empty, pa.int64()),
            }
        )

    # postings are ~24 B per token-shingle — comparable to the source text
    # bytes, so size_bytes (source text size) is a fair partition-sizing hint
    from ..functions.groupagg import auto_nparts

    NPART = auto_nparts(size_bytes)

    def add_part(t: pa.Table) -> pa.Table:
        part = np.abs(t["shingle"].to_numpy(zero_copy_only=False)) % NPART
        return t.append_column("part", pa.array(part.astype(np.int32), pa.int32()))

    def partition_pairs(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        na_out: list[np.ndarray] = []
        nb_out: list[np.ndarray] = []
        for _sh, grp in g.groupby("shingle", sort=False):
            d = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = d["doc_id"].to_numpy()
            ns = d["n"].to_numpy()
            m = ids.size
            if m < 2 or m > max_df:
                continue
            iu = np.triu_indices(m, 1)
            a_out.append(ids[iu[0]])
            b_out.append(ids[iu[1]])
            na_out.append(ns[iu[0]])
            nb_out.append(ns[iu[1]])
        empty = np.array([], dtype=np.int64)
        cat = lambda xs: np.concatenate(xs) if xs else empty  # noqa: E731
        raw = pd.DataFrame(
            {"a": cat(a_out), "b": cat(b_out), "na": cat(na_out), "nb": cat(nb_out)}
        )
        # COMBINER: collapse same-(a,b) co-occurrences of this partition to
        # one row + partial count before the exchange. Measured at sf0.1 the
        # reduction is small (1.27M → 1.26M: most candidate pairs co-occur on
        # a single shingle per partition, only true near-dups collapse), but
        # the near-dup-heavy corpora this operator exists for are exactly
        # where it pays — a dup pair's rows drop from |A∩B| to ≤ NPART.
        part = raw.groupby(["a", "b"], as_index=False).agg(
            common_part=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )
        from ..functions.blocks import from_pandas_bare

        return from_pandas_bare(part)  # metadata-free: feeds the next exchange

    from ..functions.groupagg import coarse_group_aggregate, grouped_map

    # sum the per-partition partial counts per (a, b); the sizes are
    # functionally dependent on a/b so `first` carries them through
    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False).agg(
            common=("common_part", "sum"), na=("na", "first"), nb=("nb", "first")
        )

    co = coarse_group_aggregate(
        grouped_map(
            docs.map_batches(postings, batch_format="pyarrow", batch_size=None)
            .map_batches(add_part, batch_format="pyarrow"),
            "part",
            partition_pairs,
        ),
        ["a", "b"],
        count_pairs,
        size_bytes=size_bytes,
    )

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = t["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = np.maximum(na + nb - common, 1.0)
        jac = common / union
        out = pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], pa.scalar(jaccard_threshold)))

    return co.map_batches(score, batch_format="pyarrow")


def dedup_components(pairs, ids, max_rounds: int = 50):
    """Connected components over near-dup pairs: min-label propagation,
    driver-vectorized regime.

    ``pairs``: Dataset with (a, b) edge columns. ``ids``: Dataset with the
    full vertex set in a ``doc_id`` column. Returns (doc_id, component_id)
    where component_id = min doc_id reachable. Rounds needed = graph
    diameter (near-dup clusters are shallow — a handful).

    Edges + labels live in driver memory as numpy arrays — appropriate while
    the near-dup graph is a small fraction of the corpus (up to ~1e8
    vertices / edges). Past that, use :func:`dedup_components_distributed`:
    identical output (test-pinned), labels and edges stay Datasets and each
    round is two keyed joins + a coarse min-aggregate.
    """
    edf = pairs.select_columns(["a", "b"]).to_pandas()
    vdf = ids.to_pandas()
    verts = np.sort(vdf["doc_id"].to_numpy(dtype=np.int64))
    labels = verts.copy()  # component label = own id initially
    if len(edf):
        ea = np.searchsorted(verts, edf["a"].to_numpy(dtype=np.int64))
        eb = np.searchsorted(verts, edf["b"].to_numpy(dtype=np.int64))
        converged = False
        for _ in range(max_rounds):
            m = np.minimum(labels[ea], labels[eb])
            new = labels.copy()
            np.minimum.at(new, ea, m)
            np.minimum.at(new, eb, m)
            if np.array_equal(new, labels):
                converged = True
                break
            labels = new
        if not converged:
            raise RuntimeError(
                f"dedup_components: no fixpoint after max_rounds={max_rounds} "
                "(graph diameter exceeds the round budget; labels would be wrong)"
            )
    return pa.table(
        {
            "doc_id": pa.array(verts, pa.int64()),
            "component_id": pa.array(labels, pa.int64()),
        }
    )


def dedup_components_distributed(pairs, ids, max_rounds: int = 50):
    """Connected components with labels AND edges as Datasets — the >1e8-
    vertex path (nothing driver-side). Each round:

      1. join edges to labels on a, then on b  → (a, b, la, lb)
      2. every edge proposes min(la, lb) to both endpoints
      3. union proposals with current labels; coarse-partitioned min per
         vertex → next labels (functions/groupagg — vertex count scales)

    Min-propagation is monotone, so the int sum of labels strictly decreases
    until the fixpoint; convergence is detected from that one cheap
    aggregate instead of a labels-diff join. Returns a Dataset
    (doc_id, component_id).
    """
    import pyarrow.compute as pc
    import ray

    from ..functions.groupagg import coarse_group_aggregate
    from ..functions.joins import hash_join

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, ncpu // 4)

    labels = ids.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "label": pc.cast(t["doc_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    edges = pairs.select_columns(["a", "b"]).materialize()
    prev_sum = None

    def min_label(df):
        return df.groupby("doc_id", as_index=False)["label"].min()

    converged = False
    for _ in range(max_rounds):
        cur_sum = int(labels.sum("label"))
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

        def keep_a(t: pa.Table) -> pa.Table:
            return pa.table({"a": t["a"], "b": t["b"], "la": t["label"]})

        j1 = hash_join(edges, labels, on="a", right_on="doc_id", nparts=nparts).map_batches(
            keep_a, batch_format="pyarrow"
        )

        def propose(t: pa.Table) -> pa.Table:
            m = pc.min_element_wise(t["la"], t["label"])
            return pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [pc.cast(t["a"], pa.int64()).combine_chunks(),
                         pc.cast(t["b"], pa.int64()).combine_chunks()]
                    ),
                    "label": pa.concat_arrays([m.combine_chunks(), m.combine_chunks()]),
                }
            )

        proposals = hash_join(j1, labels, on="b", right_on="doc_id", nparts=nparts).map_batches(
            propose, batch_format="pyarrow"
        )
        labels = coarse_group_aggregate(
            labels.union(proposals), ["doc_id"], min_label
        ).materialize()
    if not converged:
        # min-propagation is monotone: an unconverged exit means the labels
        # are still moving — surfacing them silently would be wrong output
        raise RuntimeError(
            f"dedup_components_distributed: no fixpoint after "
            f"max_rounds={max_rounds} (label sum still decreasing)"
        )
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "component_id": t["label"]}),
        batch_format="pyarrow",
    )
