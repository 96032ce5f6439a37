"""Multimodal stages, n-gram Jaccard dedup, report aggregates, resumable sink."""

import numpy as np
import pyarrow as pa
import pytest

from rayfrontier.codecs import decode_image, encode_image
from rayfrontier.functions.hashing import jaccard, shingle_hashes
from rayfrontier.stages.multimodal import pack_video, unpack_video


def _images_table(n=12, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
    for i in range(n):
        w, h = 8 + i % 5, 6 + i % 4
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = "ppm" if i % 2 == 0 else "qjpg"
        rows["image_id"].append(f"img{i:03d}")
        rows["bytes"].append(encode_image(px, fmt))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append(fmt)
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )


def test_video_container_roundtrip():
    frames = [b"abc", b"", b"\x00\x01\x02" * 10]
    packed = pack_video(frames, "ppm")
    out, fmt = unpack_video(packed)
    assert out == frames and fmt == "ppm"


def test_decode_stats_and_features(ray_session):
    import ray.data as rd

    from rayfrontier.stages.multimodal import decode_stats, image_features

    t = _images_table()
    ds = rd.from_arrow(t)
    stats = decode_stats(ds, concurrency=(1, 2)).to_pandas().set_index("image_id")
    assert stats["decode_ok"].all()
    # spot-check one mean against a direct decode
    px = decode_image(t["bytes"][0].as_py(), t["fmt"][0].as_py())
    assert abs(stats.loc["img000", "mean_px"] - px.mean()) < 1e-9

    feats = image_features(ds, bins=8, concurrency=(1, 2)).to_pandas()
    v = np.array(feats["feature"].iloc[0])
    assert v.shape == (24,) and abs(v.sum() - 1.0) < 1e-9  # 3×8 bins, L1-normalized


def test_resize_dims_and_determinism(ray_session):
    import ray.data as rd

    from rayfrontier.stages.multimodal import resize_images

    ds = rd.from_arrow(_images_table())
    out = resize_images(ds, out_w=5, out_h=4, concurrency=(1, 2)).to_pandas()
    assert (out["w"] == 5).all() and (out["h"] == 4).all()
    for b in out["bytes"]:
        assert decode_image(b, "ppm").shape == (4, 5, 3)
    out2 = resize_images(rd.from_arrow(_images_table()), out_w=5, out_h=4).to_pandas()
    m1 = dict(zip(out["image_id"], out["bytes"]))
    m2 = dict(zip(out2["image_id"], out2["bytes"]))
    assert m1 == m2  # deterministic under re-execution


def test_frame_sample_explodes(ray_session):
    import ray.data as rd

    from rayfrontier.stages.multimodal import sample_frames

    t = _images_table(8)
    frames = [t["bytes"][i].as_py() for i in range(4)]
    vids = rd.from_items(
        [
            {"video_id": "v0", "bytes": pack_video(frames, "ppm")},
            {"video_id": "v1", "bytes": pack_video(frames[:3], "ppm")},
        ]
    )
    out = sample_frames(vids, stride=2).to_pandas()
    got = sorted(zip(out["video_id"], out["frame_idx"]))
    assert got == [("v0", 0), ("v0", 2), ("v1", 0), ("v1", 2)]
    m = dict(zip(zip(out["video_id"], out["frame_idx"]), out["bytes"]))
    assert m[("v0", 2)] == frames[2]


def test_minhash_pairs_match_bruteforce(ray_session):
    """Keyed-lookup verification: every pair minhash_lsh_pairs reports must
    carry the EXACT brute-force Jaccard, and strongly-similar pairs (true
    jaccard >= 0.8) must all be recalled (LSH misses only weak candidates)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayfrontier.pipelines.dedup import minhash_lsh_pairs

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    out = minhash_lsh_pairs(docs, jaccard_threshold=0.5).to_pandas()
    # the size-adaptive verifier must give the same answer on BOTH paths
    # (small-set broadcast above; forced keyed-join below)
    out_join = minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, verify_broadcast_max=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"].round(12)))
    assert key(out_join) == key(out)

    t = pq.read_table(path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    sh = {i: shingle_hashes(x, 3) for i, x in zip(ids, t["text"].to_pylist())}
    truth = {}
    ids_sorted = sorted(ids)
    for i, a in enumerate(ids_sorted):
        for b in ids_sorted[i + 1 :]:
            j = jaccard(sh[a], sh[b])
            if j >= 0.5:
                truth[(a, b)] = j
    got = {(a, b): j for a, b, j in zip(out["a"], out["b"], out["jaccard"])}
    for p, j in got.items():
        assert p in truth and truth[p] == pytest.approx(j), f"wrong jaccard for {p}"
    strong = {p for p, j in truth.items() if j >= 0.8}
    assert strong, "fixture must contain strong near-dups"
    missed = strong - set(got)
    assert len(missed) <= max(1, len(strong) // 20), f"LSH missed strong pairs: {missed}"


def test_ngram_jaccard_exact(ray_session):
    import ray.data as rd

    from rayfrontier.pipelines.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " ok"},  # near-dup of 1
            {"doc_id": 3, "text": "completely different words entirely unrelated content here now"},
            {"doc_id": 4, "text": base},  # exact dup of 1
        ]
    )
    out = ngram_jaccard_pairs(docs, jaccard_threshold=0.5, k=3).to_pandas()
    pairs = {(a, b): j for a, b, j in zip(out["a"], out["b"], out["jaccard"])}
    assert (1, 4) in pairs and pairs[(1, 4)] == pytest.approx(1.0)
    expected_12 = jaccard(shingle_hashes(base, 3), shingle_hashes(base + " ok", 3))
    assert pairs[(1, 2)] == pytest.approx(expected_12)
    assert not any(3 in p for p in pairs)


def test_report_stats_and_summary():
    domains = pa.table(
        {
            "domain": ["a.com", "b.com", "c.com", "d.com"],
            "status": ["successful", "successful", "failed_access", "no_link"],
            "sim_avg": [0.8, 0.7, 0.0, 0.0],
        }
    )
    log = pa.table(
        {
            "domain": ["a.com", "a.com", "b.com"],
            "url": ["u1", "u2", "u3"],
            "sim": [0.9, 0.1, 0.7],
            "ok": [True, False, True],
            "valid": [True, False, True],
            "dup": [False, False, False],
            "seq": [0, 1, 2],
        }
    )
    from rayfrontier.pipelines.report import (
        domain_outcome_stats,
        link_outcome_stats,
        summary_report,
    )

    d = domain_outcome_stats(domains).to_pandas().set_index("status")
    assert d.loc["successful", "n"] == 2 and d.loc["successful", "pct"] == 50.0
    l = link_outcome_stats(log).to_pylist()[0]
    assert l["n_links"] == 3 and l["n_ok"] == 2 and l["pct_ok"] == 66.67
    rep = summary_report(domains, log)
    assert "a.com [successful]" in rep and "u2" in rep and "66.67" in rep


def test_paragraph_sample_deterministic(ray_session):
    """Seeded analog of the reference TextSampler
    (src/statistics/paragraph_sampler.py:50-78): n random docs, one random
    paragraph each, word counts — deterministic and a true paragraph pick."""
    import ray.data as rd

    from rayfrontier.pipelines.parse import paragraph_sample

    rows = []
    paras: dict[str, list[str]] = {}
    for d in range(40):
        doc = f"doc{d:03d}"
        paras[doc] = []
        for i in range(1 + d % 5):
            txt = f"paragraph {i} of {doc} with some words"
            paras[doc].append(txt)
            rows.append({"doc_id": doc, "seq_idx": 2 * i, "tag": "p", "text": txt})
            rows.append({"doc_id": doc, "seq_idx": 2 * i + 1, "tag": "h", "text": "Heading"})
    ds = rd.from_items(rows)
    t1 = paragraph_sample(ds, n_docs=10, seed=7)
    t2 = paragraph_sample(rd.from_items(rows), n_docs=10, seed=7)
    assert t1.equals(t2), "seeded sample must be deterministic"
    assert t1.num_rows == 10
    for r in t1.to_pylist():
        assert r["text"] in paras[r["doc_id"]], "pick must be a real paragraph of the doc"
        assert r["n_words"] == len(r["text"].split())
    # a different seed moves the sample (docs or picks)
    t3 = paragraph_sample(rd.from_items(rows), n_docs=10, seed=8)
    assert not t1.equals(t3)
    # n_docs larger than the corpus: returns every doc once
    tall = paragraph_sample(rd.from_items(rows), n_docs=100, seed=7)
    assert tall.num_rows == 40
    assert len(set(r["doc_id"] for r in tall.to_pylist())) == 40


def test_partitioned_sink_resumable(ray_session, tmp_path):
    import ray.data as rd

    from rayfrontier.pipelines.report import read_partitioned, write_partitioned

    ds = rd.range(100).map_batches(
        lambda t: t.append_column(
            "bucket", pa.array((t["id"].to_numpy() % 4).astype(np.int32))
        ),
        batch_format="pyarrow",
    )
    m1 = write_partitioned(ds, str(tmp_path), "bucket", run_id="r1")
    assert len(m1["partitions"]) == 4
    back, m = read_partitioned(str(tmp_path), run_id="r1")
    assert back.count() == 100 and m == m1
    # second call is a no-op resume (returns committed manifest, no rewrite)
    mtimes = {
        p: (tmp_path / "r1" / p).stat().st_mtime_ns for p in m1["partitions"]
    }
    m2 = write_partitioned(ds, str(tmp_path), "bucket", run_id="r1")
    assert m2 == m1
    for p in m1["partitions"]:
        assert (tmp_path / "r1" / p).stat().st_mtime_ns == mtimes[p]


def test_langid_on_real_snippets(ray_session):
    import ray.data as rd

    from rayfrontier.pipelines.textstats import langid

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox is one of the animals that it sees in a field"},
            {"doc_id": 2, "text": "el perro y la casa de los que se una para con no es en madrid"},
            {"doc_id": 3, "text": "der hund und die katze ist nicht das ein mit von zu haus im garten"},
            {"doc_id": 4, "text": "zzz qqq xxx yyy www vvv"},  # no stopwords at all
        ]
    )
    out = langid(docs).to_pandas().set_index("doc_id")["lang_pred"]
    assert out[1] == "en" and out[2] == "es" and out[3] == "de" and out[4] == "unknown"


def test_hll_approx_distinct(ray_session):
    import ray.data as rd

    from rayfrontier.functions.sketches import approx_distinct

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = len(ds.unique("user_id"))
    assert abs(est - exact) / exact < 0.05


def test_embedding_dups_recall(ray_session):
    """Multi-table OR-amplified hyperplane LSH must recall >=90% of true
    cosine>=0.9 pairs (a single 16-plane table sits near ~64%), and every
    reported cosine must equal the exact value."""
    import numpy as np
    import ray.data as rd

    from rayfrontier.pipelines.dedup import embedding_dups

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(60, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    # plant perturbed near-dups of the first 40 bases
    for j in range(40):
        noisy = base[j] + 0.12 * rng.normal(size=16)
        rows.append({"vec_id": 60 + j, "embedding": noisy.tolist()})
    vecs = np.array([r["embedding"] for r in rows])
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    iu = np.triu_indices(len(rows), 1)
    truth = {
        (int(iu[0][k]), int(iu[1][k])): float(sims[iu[0][k], iu[1][k]])
        for k in range(len(iu[0]))
        if sims[iu[0][k], iu[1][k]] >= 0.9
    }
    assert len(truth) >= 20, "fixture must plant enough near-dup pairs"

    out = embedding_dups(rd.from_items(rows), cos_threshold=0.9).to_pandas()
    out_join = embedding_dups(
        rd.from_items(rows), cos_threshold=0.9, verify_broadcast_max=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["cos"].round(12)))
    assert key(out_join) == key(out)
    got = {(int(a), int(b)): c for a, b, c in zip(out["a"], out["b"], out["cos"])}
    for p, c in got.items():
        assert p in truth and abs(truth[p] - c) < 1e-9, f"wrong cosine for {p}"
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.3f} over {len(truth)} true pairs"


def test_fused_image_analysis_matches_chained(ray_session):
    """ImageAnalysisStage (one decode) must reproduce the chained
    decode-stats / resize / feature stages exactly."""
    import ray.data as rd

    from rayfrontier.functions.hashing import fnv1a64
    from rayfrontier.stages.multimodal import (
        decode_stats,
        image_analysis,
        image_features,
        resize_images,
    )

    t = _images_table(10)
    fused = (
        image_analysis(rd.from_arrow(t), out_w=5, out_h=4, bins=8, concurrency=(1, 2))
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    stats = decode_stats(rd.from_arrow(t), concurrency=(1, 2)).to_pandas().set_index("image_id")
    resized = resize_images(rd.from_arrow(t), out_w=5, out_h=4, concurrency=(1, 2)).to_pandas()
    feats = image_features(rd.from_arrow(t), bins=8, concurrency=(1, 2)).to_pandas().set_index("image_id")
    rh = {i: np.int64(np.uint64(fnv1a64(b))).item() for i, b in zip(resized["image_id"], resized["bytes"])}
    for iid in fused.index:
        assert fused.loc[iid, "mean_px"] == stats.loc[iid, "mean_px"]
        assert fused.loc[iid, "std_px"] == stats.loc[iid, "std_px"]
        assert fused.loc[iid, "resized_hash"] == rh[iid]
        assert list(fused.loc[iid, "feature"]) == list(feats.loc[iid, "feature"])
