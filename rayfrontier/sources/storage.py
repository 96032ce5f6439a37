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


class PagesStore:
    """Keyed batch lookup into the sharded pages table."""

    def __init__(self, corpus_dir: str, n_shards: int | None = None):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        if n_shards is None:
            with open(os.path.join(corpus_dir, "meta.json")) as fp:
                n_shards = json.load(fp)["n_shards"]
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
