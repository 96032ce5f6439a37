"""Bounded driver-state primitives for the crawl engine (SURVEY.md §7/§8).

The sequential-parity invariant requires serial *control* on the driver, not
resident *state* (VERDICT r2 §3). Three pieces make the driver's memory
O(active frontier) instead of O(total crawl):

- ``ArtifactSpill`` — consumed artifacts (per-page hash/sim/hrefs) move out of
  the hot dict into append-only Arrow IPC files, rows sorted by integer image
  id. Read-back is a memory-mapped binary search, so residency is governed by
  the OS page cache; a rare re-reference (cross-host href alias) costs one
  row materialization, never a re-fetch.
- ``RowSpill`` — the crawl log streams out per wave (the checkpoint already
  holds it durably when checkpointing); outputs concatenate the mmap'd spill
  files with the in-memory tail.
- ``BoundedPending`` — the per-wave want-set holds at most ~2× its cap:
  overflow compactions keep the best-priority entries (never dropping wants
  of domains at/under the committed prefix, which must make progress) and the
  evicted tail is materialized to the parquet frontier table for the wave.

The reference keeps all of this in multiprocessing Manager dicts
(src/crawler.py:350-352) — unbounded; see SURVEY.md §4 "Memory pressure".
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.feather as feather

def col_np(table: pa.Table, name: str) -> np.ndarray:
    """Zero-copy numpy view of a primitive column (single-chunk fast path)."""
    col = table.column(name)
    if col.num_chunks == 1:
        return col.chunk(0).to_numpy(zero_copy_only=True)
    return col.combine_chunks().to_numpy(zero_copy_only=True)


ARTIFACT_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("ok", pa.bool_()),
        ("text_hash", pa.int64()),  # uint64 stored two's-complement
        ("sim", pa.float64()),
        ("hrefs", pa.list_(pa.string())),
    ]
)

ROWS_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("url", pa.string()),
        ("sim", pa.float64()),
        ("ok", pa.bool_()),
        ("valid", pa.bool_()),
        ("dup", pa.bool_()),
        ("seq", pa.int64()),
    ]
)


class ArtifactSpill:
    """Append-only artifact spill with mmap'd binary-search read-back."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._files: list[tuple[np.ndarray, pa.Table]] = []  # (sorted ids, table)
        # membership + location in ONE plain dict (id → newest file index):
        # the tentative replay probes artifact presence once per URL per wave
        # (millions of scalar calls at bench scale) — a per-call
        # np.searchsorted costs ~2 µs vs ~50 ns for a dict hit and measurably
        # doubled the bounded-mode crawl wall time at 3M images. Mapping to
        # the owning file also makes read-back O(1) files instead of a
        # newest-first scan over every spill event (steady-state flushing
        # writes a file every ~2k rows — the scan is O(waves) at 10^10).
        # ~60 B/id of driver memory; at 10^10 this index range-shards with
        # the replay actors exactly like the link_dict (SURVEY §8).
        self._id_loc: dict[int, int] = {}
        self._n_events = 0

    def __len__(self) -> int:
        return len(self._id_loc)

    def contains_int(self, iid_int: int) -> bool:
        return iid_int in self._id_loc

    def spill(self, ids_int: np.ndarray, table: pa.Table) -> str:
        """Write one spill event (rows of ``table`` keyed by ``ids_int``,
        pre-sorted ascending) and register it for read-back."""
        if not ids_int.size:
            return ""
        path = os.path.join(self.root, f"artifacts_{self._n_events:05d}.arrow")
        self._n_events += 1
        feather.write_feather(table, path + ".tmp", compression="uncompressed")
        os.replace(path + ".tmp", path)
        mm = feather.read_table(path, memory_map=True)
        ids_view = col_np(mm, "id")
        fidx = len(self._files)
        self._files.append((ids_view, mm))
        # newest spill wins: a re-spilled id repoints to its newest file
        self._id_loc.update((int(i), fidx) for i in ids_view.tolist())
        return path

    def get_row(self, iid_int: int):
        """Return the newest spilled row for id as a dict of python values,
        or None. The id→file index always points at the newest spill event
        holding the id, so a lookup touches exactly one file."""
        fidx = self._id_loc.get(iid_int)
        if fidx is None:
            return None
        ids, table = self._files[fidx]
        p = int(np.searchsorted(ids, iid_int))
        if p < ids.size and int(ids[p]) == iid_int:
            row = table.slice(p, 1)
            return {
                "ok": row["ok"][0].as_py(),
                "text_hash": int(row["text_hash"][0].as_py()) & 0xFFFFFFFFFFFFFFFF,
                "sim": row["sim"][0].as_py(),
                "hrefs": tuple(row["hrefs"][0].as_py()),
            }
        return None  # pragma: no cover — index/file mismatch

    def tables(self) -> list[pa.Table]:
        return [t for _ids, t in self._files]

    def tables_dedup(self) -> list[pa.Table]:
        """Spill tables with each id kept only in its NEWEST file. A
        re-spilled id (read back, then dead again) is written to every spill
        event that held it — fine for keyed lookup (the id→file index points
        at the newest), but a consumer that UNIONS the tables (the resume
        snapshot shipped to replay actors, which asserts cross-wave id
        disjointness) needs exactly-once ids. Rows are identical across
        copies (artifacts are immutable), so dropping the older ones is
        exact."""
        out: list[pa.Table] = []
        for fidx, (ids, t) in enumerate(self._files):
            keep = np.fromiter(
                (self._id_loc.get(int(i)) == fidx for i in ids.tolist()),
                dtype=bool,
                count=ids.size,
            )
            out.append(t if bool(keep.all()) else t.filter(pa.array(keep)))
        return out


class RowSpill:
    """Per-wave crawl-log spill; outputs concat the mmap'd files + tail."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._paths: list[str] = []
        self._cum: list[int] = []  # cumulative row count AFTER each file
        self.n_rows = 0

    def rows_from(self, start_row: int) -> list[tuple]:
        """Rows [start_row:] as python tuples, opening only the files that
        hold them (bisect on the cumulative counts) — a per-wave checkpoint
        delta reads the new suffix without touching the O(waves) older files."""
        import bisect

        out: list[tuple] = []
        if start_row >= self.n_rows:
            return out
        i = bisect.bisect_right(self._cum, start_row)
        skip = start_row - (self._cum[i - 1] if i else 0)
        for p in self._paths[i:]:
            t = feather.read_table(p, memory_map=True)
            if skip:
                t = t.slice(skip)
                skip = 0
            out.extend(zip(*(t.column(c).to_pylist() for c in t.column_names)))
        return out

    def append_rows(self, rows: list[tuple]) -> None:
        if not rows:
            return
        table = pa.table(
            {
                "domain": pa.array([r[0] for r in rows], pa.string()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "sim": pa.array([r[2] for r in rows], pa.float64()),
                "ok": pa.array([r[3] for r in rows], pa.bool_()),
                "valid": pa.array([r[4] for r in rows], pa.bool_()),
                "dup": pa.array([r[5] for r in rows], pa.bool_()),
                "seq": pa.array([r[6] for r in rows], pa.int64()),
            }
        )
        path = os.path.join(self.root, f"rows_{len(self._paths):05d}.arrow")
        feather.write_feather(table, path + ".tmp", compression="uncompressed")
        os.replace(path + ".tmp", path)
        self._paths.append(path)
        self.n_rows += len(rows)
        self._cum.append(self.n_rows)

    def tables(self) -> list[pa.Table]:
        return [feather.read_table(p, memory_map=True) for p in self._paths]


class PendingDict(dict):
    """The default (unbounded) per-wave want-set: exact round-1 semantics —
    priority key = (depth, domain rank, discovery tiebreak).

    The tiebreak is a monotonic counter (like BoundedPending.discovery), not
    ``len(self)``: the admit path's np.lexsort needs UNCONDITIONALLY unique
    triples, and ``len(self)`` stays unique only because crawl depth is
    limited to {0,1} (a landing-update followed by a same-rank depth-0
    insert is the one collision shape). The counter preserves the exact
    assignment-time ordering len(self) gave (both are non-decreasing in
    set order and collisions never occurred), so admitted order — and crawl
    parity — is unchanged."""

    __slots__ = ("discovery",)

    def __init__(self):
        super().__init__()
        self.discovery = 0

    def want(self, iid: str, depth: int, rank: int) -> None:
        cur = self.get(iid)
        key = (depth, rank, self.discovery)
        if cur is None or key < cur:
            self[iid] = key
            self.discovery += 1

    def merge_key(self, iid: str, key: tuple) -> None:
        cur = self.get(iid)
        if cur is None or key < cur:
            self[iid] = key

    def maybe_compact(self) -> None:
        pass


class BoundedPending(dict):
    """Want-set capped at ~2×cap entries; only the best ``cap`` priorities can
    be admitted in a wave, so evicting the tail is scheduling-neutral (the
    replay regenerates all wants next wave). Entries whose domain rank is at
    or below ``protect_rank`` (the committed prefix — the crawl's progress
    guarantee) are never evicted. Discovery tiebreak is a monotonic counter,
    robust to compaction shrinking len()."""

    def __init__(self, cap: int):
        super().__init__()
        self.cap = max(int(cap), 1)
        self.discovery = 0
        self.protect_rank = -1
        self.dropped = 0
        # ALL evictions of this (per-wave) object, accumulated across
        # compactions — the frontier-table overflow sink must see every
        # evicted want, not just the last compaction's tail
        self.evicted_tail: list[tuple[str, tuple]] = []

    def want(self, iid: str, depth: int, rank: int) -> None:
        cur = self.get(iid)
        key = (depth, rank, self.discovery)
        if cur is None or key < cur:
            self[iid] = key
            self.discovery += 1
            if len(self) > 2 * self.cap:
                self._compact()

    def merge_key(self, iid: str, key: tuple) -> None:
        cur = self.get(iid)
        if cur is None or key < cur:
            self[iid] = key

    def maybe_compact(self) -> None:
        if len(self) > 2 * self.cap:
            self._compact()

    def _compact(self) -> None:
        items = sorted(self.items(), key=lambda kv: kv[1])
        protected = [kv for kv in items if kv[1][1] <= self.protect_rank]
        rest = [kv for kv in items if kv[1][1] > self.protect_rank]
        keep, tail = rest[: self.cap], rest[self.cap :]
        self.dropped += len(tail)
        self.evicted_tail.extend(tail)
        self.clear()
        self.update(protected)
        self.update(keep)


def write_frontier_table(root: str, wave: int, entries: list[tuple[str, tuple]]) -> str | None:
    """Materialize the non-admitted frontier for a wave as parquet (the
    SURVEY §7 host-bucketed frontier table; observability + overflow sink)."""
    if not entries:
        return None
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    table = pa.table(
        {
            "image_id": pa.array([e[0] for e in entries], pa.string()),
            "depth": pa.array([e[1][0] for e in entries], pa.int32()),
            "rank": pa.array([e[1][1] for e in entries], pa.int64()),
            "discovery": pa.array([e[1][2] for e in entries], pa.int64()),
        }
    )
    path = os.path.join(root, f"frontier_wave{wave:05d}.parquet")
    pq.write_table(table, path)
    return path
