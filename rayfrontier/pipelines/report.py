"""Crawl summary reports and resumable partitioned output (reference K3/K7/K10).

The reference writes a single ``summary.txt`` with global stats plus a
per-domain link trace (``src/crawler.py:243-283``) and wipes its output dir on
every run (``src/utils/utils.py:45-58``). Here the *aggregates* become
queryable tables (driver-checkable) and the filesystem layout is resumable:
one directory per partition plus an atomic ``_manifest.json``, so a failed run
skips finished partitions instead of re-writing everything.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def domain_outcome_stats(domains: pa.Table) -> pa.Table:
    """A2: domain outcome class → count + % of total (crawler.py:254-259)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.rounding import quantize

    total = domains.num_rows
    out = (
        rd.from_arrow(domains)
        .groupby("status")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("status")
    )
    # DuckDB round lattice, not pandas half-even — the pct column is
    # value-hash-compared against the SQL oracle
    out["pct"] = quantize(out["n"] * 100.0 / max(total, 1), 2)
    return pa.Table.from_pandas(out, preserve_index=False)


def link_outcome_stats(crawl_log: pa.Table) -> pa.Table:
    """A3/A10: link success / valid / dup counts over the crawl log."""
    from ..functions.rounding import quantize

    n = crawl_log.num_rows
    ok = pc.sum(pc.cast(crawl_log["ok"], pa.int64())).as_py() or 0
    valid = pc.sum(pc.cast(crawl_log["valid"], pa.int64())).as_py() or 0
    dup = pc.sum(pc.cast(crawl_log["dup"], pa.int64())).as_py() or 0
    return pa.table(
        {
            "n_links": pa.array([n], pa.int64()),
            "n_ok": pa.array([ok], pa.int64()),
            "n_valid": pa.array([valid], pa.int64()),
            "n_dup": pa.array([dup], pa.int64()),
            "pct_ok": pa.array(quantize([ok * 100.0 / max(n, 1)], 2), pa.float64()),
            "pct_valid": pa.array(quantize([valid * 100.0 / max(n, 1)], 2), pa.float64()),
        }
    )


def summary_report(domains: pa.Table, crawl_log: pa.Table) -> str:
    """The reference's summary.txt shape: global header + per-domain trace."""
    dstats = domain_outcome_stats(domains).to_pylist()
    lstats = link_outcome_stats(crawl_log).to_pylist()[0]
    lines = ["CRAWL SUMMARY", "=" * 40]
    for r in dstats:
        lines.append(f"domains {r['status'] or '(pending)'}: {r['n']} ({r['pct']}%)")
    lines.append(
        f"links: {lstats['n_links']} total, {lstats['n_ok']} ok "
        f"({lstats['pct_ok']}%), {lstats['n_valid']} valid, {lstats['n_dup']} dup"
    )
    lines.append("-" * 40)
    by_domain: dict[str, list] = {}
    for row in crawl_log.to_pylist():
        by_domain.setdefault(row["domain"], []).append(row)
    status_of = dict(
        zip(domains["domain"].to_pylist(), domains["status"].to_pylist())
    )  # one pass, not a table filter per domain
    for d in domains["domain"].to_pylist():
        lines.append(f"{d} [{status_of[d]}]")
        for row in by_domain.get(d, []):
            lines.append(
                f"  {row['url']} sim={row['sim']:.4f} ok={row['ok']} "
                f"valid={row['valid']} dup={row['dup']}"
            )
    return "\n".join(lines) + "\n"


# ------------------------------------------------------------------ resumable sink


def write_partitioned(ds, out_dir: str, partition_col: str, run_id: str = "run0") -> dict:
    """Resumable partitioned parquet sink (K10 replacement).

    Layout: ``{out_dir}/{run_id}/{partition_col}=<v>/*.parquet`` plus a
    ``_manifest.json``. Writes land in a staging directory and the whole run
    commits with one atomic rename — a run that crashes mid-write leaves only
    the staging dir (wiped on retry), never a half-written committed run whose
    re-run would append duplicate UUID-named files. A re-run of a committed
    run_id is a no-op (never one giant file, never a wipe of committed data).
    """
    import shutil

    root = os.path.join(out_dir, run_id)
    manifest_path = os.path.join(root, "_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    if os.path.exists(root):
        # committed-manifest absent ⇒ a previous attempt died mid-write;
        # its partial files are unmanifested and safe to discard
        shutil.rmtree(root)
    staging = os.path.join(out_dir, f".{run_id}.inprogress")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging, exist_ok=True)
    ds.write_parquet(staging, partition_cols=[partition_col])
    parts = sorted(
        d for d in os.listdir(staging) if d.startswith(f"{partition_col}=")
    )
    manifest = {"run_id": run_id, "partition_col": partition_col, "partitions": parts}
    with open(os.path.join(staging, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    os.replace(staging, root)  # atomic commit of data + manifest together
    return manifest


def read_partitioned(out_dir: str, run_id: str = "run0"):
    """Read back a committed partitioned run (raises if manifest missing)."""
    import ray.data as rd

    root = os.path.join(out_dir, run_id)
    with open(os.path.join(root, "_manifest.json")) as f:
        manifest = json.load(f)
    return rd.read_parquet(root), manifest
