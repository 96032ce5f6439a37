"""Pages store + wave checkpoint manifests.

``PagesStore`` is the engine's 'network': a hash-sharded parquet table of
image+caption rows (written by ``datagen.write_corpus``). A fetch wave reads
ONLY the shards that hold requested keys, with an ``image_id IN (...)``
predicate pushed into the parquet scan (row-group pruning) and column pruning —
the 10^10-scale discipline from SURVEY.md §"Prune at the read". The reference's
equivalent is one HTTP GET per URL (``src/utils/utils.py:111-181``).

``CheckpointDir`` gives per-wave atomic commits: write everything into
``<dir>/wave=K.tmp/``, fsync-rename to ``<dir>/wave=K/``, then write a
manifest line. A killed run resumes from the last committed wave without
re-fetching (north rule; the reference instead *wipes* outputs on start,
``src/utils/utils.py:45-58``).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.hashing import hash_text

# per-worker-process cache of sidecar offset indexes (immutable once built):
# fetch tasks hit the same shard's index many times per wave
_SIDECAR_IDX_CACHE: dict = {}

# per-process cache of each corpus's recorded shard count (meta.json is tiny
# but fetch tasks construct a PagesStore per chunk)
_META_SHARDS_CACHE: dict[str, int] = {}


class PagesStore:
    """Keyed batch lookup into the sharded pages table."""

    def __init__(self, corpus_dir: str, n_shards: int | None = None):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        # The corpus's own meta.json is AUTHORITATIVE: shard_of must use the
        # modulus the writer used, or keyed lookups map ids to shards that
        # don't exist on disk (a stale cached corpus written at a different
        # shard count than the caller's config silently has fewer dirs).
        # The caller-passed n_shards is only a fallback for meta-less dirs.
        meta_n = _META_SHARDS_CACHE.get(corpus_dir)
        if meta_n is None:
            try:
                with open(os.path.join(corpus_dir, "meta.json")) as fp:
                    meta_n = int(json.load(fp)["n_shards"])
                _META_SHARDS_CACHE[corpus_dir] = meta_n
            except (OSError, KeyError, ValueError):
                meta_n = -1  # not cached: meta.json may be written later
        if meta_n > 0:
            n_shards = meta_n
        elif n_shards is None:
            raise FileNotFoundError(
                f"{corpus_dir}/meta.json missing and no n_shards given"
            )
        self.n_shards = int(n_shards)

    def shard_of(self, image_id: str) -> int:
        return hash_text(image_id) % self.n_shards

    def shard_paths(self, shards: set[int]) -> list[str]:
        out = []
        for s in sorted(shards):
            d = os.path.join(self.pages_dir, f"shard={s}")
            if os.path.isdir(d):
                out.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
                )
        return out

    def lookup_table(self, image_ids: list[str], columns: list[str]) -> pa.Table:
        """Read the requested rows only (shard pruning + IN-filter pushdown)."""
        if not image_ids:
            return pa.table({c: pa.array([], pa.string()) for c in columns})
        shards = {self.shard_of(i) for i in image_ids}
        paths = self.shard_paths(shards)
        dataset = pads.dataset(paths, format="parquet")
        expr = pads.field("image_id").isin(image_ids)
        return dataset.to_table(columns=columns, filter=expr)

    # -- payload sidecar: O(1) per-row byte-range reads -------------------------
    #
    # Parquet row groups are the wrong granularity for sparse payload fetches:
    # one wanted row drags its whole (row_group × bytes-column) chunk off disk.
    # The sidecar re-lays each shard's payload as one flat blob + int64 offset
    # index (built ONCE, lazily, from the parquet shard), so a fetch task reads
    # exactly the wanted pages' bytes with seeks — the shape of a production
    # keyed image store (Lance take / WebDataset-with-index). SURVEY.md J5.

    def _sidecar_paths(self, shard: int) -> tuple[str, str]:
        # kept OUTSIDE pages/: anything that reads the pages dir as a parquet
        # dataset (ray.data directory reads) must never see these blobs
        d = os.path.join(os.path.dirname(self.pages_dir), "payload")
        os.makedirs(d, exist_ok=True)
        return (
            os.path.join(d, f"shard={shard}.bin"),
            os.path.join(d, f"shard={shard}_idx.npz"),
        )

    def ensure_sidecar(self, shard: int) -> bool:
        """Build the payload sidecar for one shard if absent. Returns True if
        (now) present. Atomic: written to .tmp then renamed."""
        import numpy as np

        bin_path, idx_path = self._sidecar_paths(shard)
        if os.path.exists(bin_path) and os.path.exists(idx_path):
            return True
        paths = self.shard_paths({shard})
        if not paths:
            return False
        t = pads.dataset(paths, format="parquet").to_table(
            columns=["image_id", "bytes", "fmt", "phash"]
        )
        ids = np.array([int(x[3:]) for x in t["image_id"].to_pylist()], dtype=np.int64)
        order = np.argsort(ids)
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        phashes = t["phash"].to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(ids) + 1, dtype=np.int64)
        with open(bin_path + ".tmp", "wb") as fp:
            pos = 0
            for j, k in enumerate(order):
                fp.write(blobs[k])
                pos += len(blobs[k])
                offsets[j + 1] = pos
        np.savez(
            idx_path + ".tmp.npz",
            ids=ids[order],
            offsets=offsets,
            fmt_is_ppm=np.array([fmts[k] == "ppm" for k in order], dtype=bool),
            phash=phashes[order].astype(np.int64),
        )
        os.replace(idx_path + ".tmp.npz", idx_path)
        os.replace(bin_path + ".tmp", bin_path)
        return True

    def payload_lookup(self, shard: int, image_ids: list[str]):
        """bytes/fmt/phash for the requested ids of one shard via seek reads.

        Returns (list[bytes], list[str fmt], np.ndarray phash) aligned with
        ``image_ids``. Sidecar must exist (ensure_sidecar)."""
        import numpy as np

        bin_path, idx_path = self._sidecar_paths(shard)
        cached = _SIDECAR_IDX_CACHE.get(idx_path)
        if cached is None:
            idx = np.load(idx_path)
            cached = (idx["ids"], idx["offsets"], idx["fmt_is_ppm"], idx["phash"])
            if len(_SIDECAR_IDX_CACHE) > 256:
                _SIDECAR_IDX_CACHE.clear()
            _SIDECAR_IDX_CACHE[idx_path] = cached
        ids, offsets, fmt_is_ppm, phash = cached
        want = np.array([int(x[3:]) for x in image_ids], dtype=np.int64)
        pos = np.searchsorted(ids, want)
        if np.any((pos >= len(ids)) | (ids[np.clip(pos, 0, len(ids) - 1)] != want)):
            raise KeyError("payload_lookup: id not in shard sidecar")
        blobs, fmts = [], []
        with open(bin_path, "rb") as fp:
            for p in pos:
                fp.seek(int(offsets[p]))
                blobs.append(fp.read(int(offsets[p + 1] - offsets[p])))
                fmts.append("ppm" if fmt_is_ppm[p] else "qjpg")
        return blobs, fmts, phash[pos]


class CheckpointDir:
    """Atomic per-wave checkpoint layout with a manifest."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "MANIFEST.jsonl")

    def committed_waves(self) -> list[int]:
        if not os.path.exists(self.manifest_path):
            return []
        waves = []
        with open(self.manifest_path) as fp:
            for line in fp:
                line = line.strip()
                if line:
                    waves.append(json.loads(line)["wave"])
        return waves

    def wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:05d}")

    def begin_wave(self, wave: int) -> str:
        tmp = self.wave_dir(wave) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def commit_wave(self, wave: int, meta: dict) -> None:
        tmp = self.wave_dir(wave) + ".tmp"
        final = self.wave_dir(wave)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        with open(self.manifest_path, "a") as fp:
            fp.write(json.dumps({"wave": wave, **meta}) + "\n")
            fp.flush()
            os.fsync(fp.fileno())

    def write_table(self, tmp_dir: str, name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(tmp_dir, f"{name}.parquet"))

    def read_table(self, wave: int, name: str) -> pa.Table:
        return pq.read_table(os.path.join(self.wave_dir(wave), f"{name}.parquet"))

    def write_blob(self, tmp_dir: str, name: str, blob: bytes) -> None:
        with open(os.path.join(tmp_dir, name), "wb") as fp:
            fp.write(blob)

    def read_blob(self, wave: int, name: str) -> bytes:
        with open(os.path.join(self.wave_dir(wave), name), "rb") as fp:
            return fp.read()
