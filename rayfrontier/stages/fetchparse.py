"""Fetch-side stages: page → artifact, and the per-row decode invariant check.

``PageArtifactStage`` is the crawl engine's hot stage: one callable-class actor
pool (``map_batches(PageArtifactStage, concurrency=N, batch_format="pyarrow")``)
that, per page: strips visible text, extracts ordered privacy-keyword link
candidates, runs the English gate + pair-fit TF-IDF cosine against the
broadcast ground truth, and emits a *small* artifact row (hashes + hrefs + sim
— never the payload). The reference does the same work per URL inside
``crawl()`` (``src/crawler.py:202-205``, ``verify`` 43-75) with the ground
truth re-loaded per fork and the dictionary re-read per call
(``src/verification/verify.py:27`` — a bug we fix by loading once per actor).

State (ground-truth term counts, dictionary frozenset, rule dict) is built
ONCE per actor from driver-broadcast plain objects (``ray.put`` upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode_image, psnr
from ..functions.hashing import hash_text
from ..functions.minihtml import candidate_links, strip_text
from ..functions.textrules import is_english
from ..functions.tfidf import pair_cosine, term_counts


class PageArtifactStage:
    """pages(image_id, caption) → artifacts(image_id, ok, text_hash, sim, hrefs, n_chars)."""

    def __init__(
        self,
        ground_truth: "ray.ObjectRef | str",  # noqa: F821
        dictionary: "ray.ObjectRef | frozenset",  # noqa: F821
        keywords: tuple[str, ...] = ("privacy",),
        word_percentage: float = 50.0,
        char_percentage: float = 85.0,
    ):
        import ray

        gt = ray.get(ground_truth) if isinstance(ground_truth, ray.ObjectRef) else ground_truth
        dc = ray.get(dictionary) if isinstance(dictionary, ray.ObjectRef) else dictionary
        self.gt_counts = term_counts(gt)
        self.dictionary = frozenset(dc)
        self.keywords = tuple(keywords)
        self.word_pct = word_percentage
        self.char_pct = char_percentage

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        captions = batch["caption"].to_pylist()
        ok = np.zeros(len(ids), dtype=bool)
        text_hash = np.zeros(len(ids), dtype=np.uint64)
        sim = np.zeros(len(ids), dtype=np.float64)
        n_chars = np.zeros(len(ids), dtype=np.int64)
        hrefs: list[list[str]] = []
        for k, html in enumerate(captions):
            text = strip_text(html)
            if text == "":
                hrefs.append([])
                continue
            ok[k] = True
            text_hash[k] = hash_text(text)
            n_chars[k] = len(text)
            hrefs.append(candidate_links(html, self.keywords))
            if is_english(self.dictionary, text, self.word_pct, self.char_pct):
                sim[k] = pair_cosine(self.gt_counts, text)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok),
                "text_hash": pa.array(text_hash.astype(np.int64), pa.int64()),
                "sim": pa.array(sim, pa.float64()),
                "hrefs": pa.array(hrefs, pa.list_(pa.string())),
                "href_hashes": _href_hash_col(hrefs),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )


def _href_hash_col(hrefs: list[list[str]]) -> pa.Array:
    """Per-href FNV-1a hashes, computed HERE on the (distributed) fetch
    workers so the driver's ingest and the replay overlays never pay a
    hash pass — one vectorized call per block (crawl.py _ingest_block was
    doing this serially on the driver: 2.3 s tottime / 1,900 blocks at a
    300k steady crawl)."""
    from ..functions.hashing import fnv1a64_var

    lens = np.fromiter(map(len, hrefs), dtype=np.int64, count=len(hrefs))
    flat_h = fnv1a64_var([h for hs in hrefs for h in hs]).astype(np.int64)
    offsets = pa.array(np.concatenate(([0], np.cumsum(lens))).astype(np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(flat_h, pa.int64()))


_WORKER_STATE: dict = {}


def make_artifact_fn(gt_ref, dict_ref, keywords, word_percentage, char_percentage, dcfg=None):
    """Task-based variant of PageArtifactStage for the per-wave fetch path.

    The crawl engine launches one small Dataset pipeline per wave; an actor
    pool would pay its spin-up cost every wave, so the wave path uses plain
    tasks with the (tiny) scorer state broadcast via ray.put and cached in a
    module-level per-worker-process dict — same amortization as an actor's
    __init__, without per-wave pool construction.

    With ``dcfg`` set, the SAME pass also decodes the image payload and checks
    the per-row input_hint invariant (pixel allclose / PSNR≥40dB + caption
    equality), appending a ``row_ok`` column — one pipeline, not two.
    """

    def fn(batch: pa.Table) -> pa.Table:
        key = gt_ref.hex() if hasattr(gt_ref, "hex") else str(id(gt_ref))
        st = _WORKER_STATE.get(key)
        if st is None:
            import ray

            st = (
                PageArtifactStage(
                    ray.get(gt_ref), ray.get(dict_ref), keywords, word_percentage, char_percentage
                ),
                DecodeCheckStage(dcfg) if dcfg is not None else None,
            )
            _WORKER_STATE.clear()
            _WORKER_STATE[key] = st
        artifact_stage, check_stage = st
        out = artifact_stage(batch)
        if check_stage is not None and "bytes" in batch.column_names:
            checks = check_stage(batch)
            row_ok = np.logical_and(
                checks["decode_ok"].to_numpy(zero_copy_only=False),
                checks["caption_equal"].to_numpy(zero_copy_only=False),
            )
            out = out.append_column("row_ok", pa.array(row_ok))
        return out

    return fn


def _fetch_chunk(block, wanted, gt_ref_box, dict_ref_box, keywords, wp, cp, dcfg,
                 payload_src=None):
    """Keyed lookup into one plasma-cached shard META block + artifact
    extraction; payload bytes (decode-invariant mode) come from the shard's
    seekable sidecar — only the WANTED pages' bytes ever leave disk.

    ``block`` arrives as a zero-copy Arrow table (Ray resolves the top-level
    ObjectRef); the broadcast scorer state rides as single-element LISTS of
    ObjectRefs so Ray does NOT auto-resolve them — make_artifact_fn's
    per-worker-process cache then amortizes the ray.get + state build across
    every chunk this worker ever processes.
    """
    import pyarrow.compute as pc

    sub = block.filter(pc.is_in(block["image_id"], value_set=pa.array(wanted, pa.string())))
    if payload_src is not None and dcfg is not None:
        from ..sources.storage import PagesStore

        corpus_dir, n_shards, shard = payload_src
        blobs, fmts, _ph = PagesStore(corpus_dir, n_shards).payload_lookup(
            shard, sub["image_id"].to_pylist()
        )
        sub = sub.append_column("bytes", pa.array(blobs, pa.binary()))
        # sidecar fmt must agree with the parquet column (sanity by construction)
    fn = make_artifact_fn(gt_ref_box[0], dict_ref_box[0], keywords, wp, cp, dcfg=dcfg)
    return fn(sub)


def _make_fetch_chunk_task():
    import ray

    return ray.remote(num_cpus=1)(_fetch_chunk)


class _LazyTask:
    """Defers ray.remote() until first use so importing this module never
    requires an initialized Ray."""

    _inner = None

    def remote(self, *args, **kwargs):
        if self._inner is None:
            self._inner = _make_fetch_chunk_task()
        return self._inner.remote(*args, **kwargs)


fetch_chunk_task = _LazyTask()


class DecodeCheckStage:
    """Per-row input_hint invariant: decode pixels, verify shape/PSNR/caption.

    Emits (image_id, decode_ok, psnr_db, caption_equal, phash_match). The
    expected pixels/caption are recomputed from the pure generator (the
    synthetic 'reference truth'); against real data this stage would verify
    against stored checksums instead.
    """

    def __init__(self, dcfg):
        from ..datagen import HostMap

        self.dcfg = dcfg
        self.hm = HostMap(dcfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import phash64
        from ..datagen import caption_html, pixels_of

        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        phashes = batch["phash"].to_pylist()
        dec_ok, ps, cap_eq, ph_ok = [], [], [], []
        for iid, blob, fmt, cap, ph in zip(ids, blobs, fmts, caps, phashes):
            idx = int(iid[3:])
            try:
                dec = decode_image(blob, fmt)
                ref = pixels_of(self.dcfg, idx)
                if fmt == "ppm":
                    good = bool(np.array_equal(dec, ref))
                    p = float("inf") if good else psnr(ref, dec)
                else:
                    p = psnr(ref, dec)
                    good = p >= 40.0 and dec.shape == ref.shape
                dec_ok.append(good)
                ps.append(p if p != float("inf") else 99.0)
                ph_ok.append(phash64(dec if fmt == "ppm" else ref) == ph)
            except Exception:
                dec_ok.append(False)
                ps.append(0.0)
                ph_ok.append(False)
            cap_eq.append(cap == caption_html(self.dcfg, idx, self.hm))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "decode_ok": pa.array(dec_ok),
                "psnr_db": pa.array(ps, pa.float64()),
                "caption_equal": pa.array(cap_eq),
                "phash_match": pa.array(ph_ok),
            }
        )
