"""Multimodal actor-pool stages: decode / resize / feature-extract / frame-sample.

Large-scale training-data operators over opaque ``binary`` payload columns with
typed metadata (SURVEY.md §1.2 input_hint). The container has no PIL/cv2/ffmpeg,
so decode runs through the repo's deterministic codecs (``rayfrontier.codecs``:
lossless ``ppm``, quantized ``qjpg``); any other format raises
``NotImplementedError`` inside the codec — a clearly-marked stub boundary where
a real deployment would plug libjpeg/ffmpeg. The Ray-side plumbing (schemas,
actor signatures, batch sizing, output layout) is real and tested.

Design notes for 100 TB:
* every stage is a callable CLASS → ``map_batches(Cls, concurrency=(a,b))``
  actor pool; per-actor setup happens once in ``__init__``;
* batches stay SMALL (``batch_size≈64``) because each row carries an image
  payload — batch × concurrency must fit a worker heap (SURVEY.md §4);
* stages that only need metadata/statistics DROP the payload column on output
  so downstream shuffles never move pixels;
* "video" is a length-prefixed container of encoded frames (``pack_video`` /
  ``unpack_video``) — a deterministic stand-in for a real container format.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..codecs import decode_image, encode_image

# ------------------------------------------------------------------ video container


def pack_video(frames: list[bytes], fmt: str) -> bytes:
    """[u32 n][u8 fmt_len][fmt][u32 len_i, bytes_i]* — deterministic container."""
    f = fmt.encode()
    out = [struct.pack("<IB", len(frames), len(f)), f]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def unpack_video(data: bytes) -> tuple[list[bytes], str]:
    n, flen = struct.unpack_from("<IB", data, 0)
    off = 5
    fmt = data[off : off + flen].decode()
    off += flen
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off : off + ln])
        off += ln
    return frames, fmt


# ------------------------------------------------------------------ stages


class DecodeStatsStage:
    """bytes+fmt → per-image pixel statistics (payload dropped on output)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        means, stds, oks = [], [], []
        for data, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            try:
                px = decode_image(data, fmt).astype(np.float64)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                oks.append(True)
            except NotImplementedError:
                # stub boundary: unknown codec (no imaging libs in container)
                means.append(0.0)
                stds.append(0.0)
                oks.append(False)
        return pa.table(
            {
                "image_id": t["image_id"],
                "w": t["w"],
                "h": t["h"],
                "fmt": t["fmt"],
                "mean_px": pa.array(means, pa.float64()),
                "std_px": pa.array(stds, pa.float64()),
                "decode_ok": pa.array(oks),
            }
        )


class ResizeStage:
    """Nearest-neighbor resize to (out_w, out_h); re-encodes with the same codec.

    Output keeps the payload (it IS the product); callers write it straight to
    partitioned parquet rather than shuffling it.
    """

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        out_bytes, ws, hs = [], [], []
        for data, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            px = decode_image(data, fmt)
            h, w = px.shape[:2]
            yi = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
            xi = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
            small = px[yi[:, None], xi[None, :]]
            out_bytes.append(encode_image(small, "ppm"))  # lossless output codec
            ws.append(self.out_w)
            hs.append(self.out_h)
        return pa.table(
            {
                "image_id": t["image_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["ppm"] * t.num_rows, pa.string()),
            }
        )


class FeatureStage:
    """Per-image feature vector: per-channel histogram (+ normalized), payload
    dropped — features are what flows into dedup/ANN (list<float> column)."""

    def __init__(self, bins: int = 8):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for data, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            px = decode_image(data, fmt)
            chans = []
            for c in range(px.shape[2]):
                hcount, _ = np.histogram(px[:, :, c], bins=self.edges)
                chans.append(hcount.astype(np.float64))
            v = np.concatenate(chans)
            s = v.sum()
            feats.append((v / s if s else v).tolist())
        return pa.table(
            {
                "image_id": t["image_id"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class ImageAnalysisStage:
    """Fused decode-once analysis: pixel stats + nearest-neighbor-resized
    payload digest + histogram features from ONE decode per image.

    The composed alternative to chaining DecodeStatsStage → ResizeStage →
    FeatureStage, which decodes every payload three times; at 100 TB the
    decode IS the cost, so analysis passes that can share a decode must."""

    def __init__(self, out_w: int = 16, out_h: int = 16, bins: int = 8):
        self.out_w = out_w
        self.out_h = out_h
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64

        means, stds, oks, rhash, feats = [], [], [], [], []
        for data, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except NotImplementedError:
                means.append(0.0)
                stds.append(0.0)
                oks.append(False)
                rhash.append(0)
                feats.append([])
                continue
            pxf = px.astype(np.float64)
            means.append(float(pxf.mean()))
            stds.append(float(pxf.std()))
            oks.append(True)
            h, w = px.shape[:2]
            yi = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
            xi = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
            small = px[yi[:, None], xi[None, :]]
            rhash.append(np.int64(np.uint64(fnv1a64(encode_image(small, "ppm")))).item())
            chans = []
            for c in range(px.shape[2]):
                hcount, _ = np.histogram(px[:, :, c], bins=self.edges)
                chans.append(hcount.astype(np.float64))
            v = np.concatenate(chans)
            s = v.sum()
            feats.append((v / s if s else v).tolist())
        return pa.table(
            {
                "image_id": t["image_id"],
                "w": t["w"],
                "h": t["h"],
                "fmt": t["fmt"],
                "mean_px": pa.array(means, pa.float64()),
                "std_px": pa.array(stds, pa.float64()),
                "decode_ok": pa.array(oks),
                "resized_w": pa.array([self.out_w] * t.num_rows, pa.int32()),
                "resized_h": pa.array([self.out_h] * t.num_rows, pa.int32()),
                "resized_hash": pa.array(rhash, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Video container → every ``stride``-th frame as its own row (flat-map
    shape: one input row explodes to ceil(n_frames/stride) output rows)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, frame_idx, fr_bytes, fmts = [], [], [], []
        for vid, data in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            frames, fmt = unpack_video(data)
            for i in range(0, len(frames), self.stride):
                vids.append(vid)
                frame_idx.append(i)
                fr_bytes.append(frames[i])
                fmts.append(fmt)
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "bytes": pa.array(fr_bytes, pa.binary()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )


# ------------------------------------------------------------------ pipelines


def decode_stats(pages, concurrency=(1, 8)):
    return pages.map_batches(
        DecodeStatsStage, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    )


def resize_images(pages, out_w: int = 16, out_h: int = 16, concurrency=(1, 8)):
    return pages.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def image_features(pages, bins: int = 8, concurrency=(1, 8)):
    return pages.map_batches(
        FeatureStage,
        fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def image_analysis(pages, out_w: int = 16, out_h: int = 16, bins: int = 8, concurrency=(1, 8)):
    """Fused stats+resize-digest+features in one decode pass per image."""
    return pages.map_batches(
        ImageAnalysisStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "bins": bins},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def sample_frames(videos, stride: int = 2, concurrency=(1, 4)):
    return videos.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )
