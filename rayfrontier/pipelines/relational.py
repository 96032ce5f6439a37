"""Relational operator demos over the driver testdata (TPC-H-ish tables).

Each function maps one SURVEY.md §2 operator family onto the generic tables so
the driver's DuckDB oracle can verify it end-to-end (CORRECTNESS gate):
groupby aggregation (A1-A3, A10), classification counts (A2), sort+limit
top-k (O1/O4), band filter (A9), broadcast join (J3), exact dedup first-wins
(D4), distinct (D1), per-group top-k (O4 per-host heap), tumbling windows
(events), string kernels (§2.9).

Float discipline: every float aggregate is rounded identically here and in
the paired oracle SQL (__ray_entry__.oracle_sql) so order-insensitive value
hashes match despite summation-order differences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    from rayfrontier.functions.blocks import read_parquet_bare

    return read_parquet_bare(f"{sf_dir}/{table}.parquet", columns=columns)


from rayfrontier.functions.rounding import quantize_cols as _round_cols


def _tbl_bytes(sf_dir: str, table: str) -> int:
    """Footer-metadata size of a source table, for auto_nparts sizing."""
    from rayfrontier.functions.groupagg import parquet_size_bytes

    return parquet_size_bytes(f"{sf_dir}/{table}.parquet")


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered groupby with sum/mean/count aggregates.

    The group count is FIXED (~6 flag×status combinations) regardless of
    data size, so the full hash-aggregate exchange is pure overhead: each
    batch emits its ≤6-row partial (sums + count; mean = sum/count at the
    end), and the driver combines #batches × 6 tiny rows — the
    partial-aggregate pattern, legitimate at any scale for fixed-cardinality
    keys (at 100 TB the combine input is still KBs).
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "rev": rev,
                "disc": t["l_discount"],
            }
        )
        agg = part.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("rev", "sum"), ("disc", "sum"), ("disc", "count")]
        )
        # select by the deterministic '<col>_<fn>' names — key/aggregate
        # column ORDER differs across pyarrow majors, so never rename by position
        return agg.select(
            ["l_returnflag", "l_linestatus", "qty_sum", "rev_sum", "disc_sum", "disc_count"]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_rev", "sum_disc", "n_rows"]
        )

    import pandas as pd

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"),
        sum_rev=("sum_rev", "sum"),
        sum_disc=("sum_disc", "sum"),
        n_rows=("n_rows", "sum"),
    )
    out["avg_disc"] = out["sum_disc"] / out["n_rows"]
    out = out.drop(columns=["sum_disc"])[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_rev", "avg_disc", "n_rows"]
    ]
    t = pa.Table.from_pandas(out, preserve_index=False)
    return _round_cols(t, {"sum_qty": 2, "sum_rev": 2, "avg_disc": 6})


def q_top_orders(sf_dir: str, k: int = 20):
    """Global top-k: sort + limit (the frontier's priority-queue shape)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_mkt_revenue(sf_dir: str):
    """Broadcast hash join (small customer side via ray.put) + groupby.

    The shuffle-free join pattern from SURVEY.md J3: the dimension table rides
    inside each actor; only the grouped partials shuffle.
    """
    import ray

    # broadcast the dimension as (sorted keys, category codes) numpy arrays:
    # plasma-backed numpy is ZERO-COPY on every ray.get, unlike a dict which
    # would re-unpickle per batch — the per-batch cost is just two searchsorted
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    cats = sorted(cust["c_mktsegment"].unique())
    code_of = {c: i for i, c in enumerate(cats)}
    keys_ref = ray.put(cust["c_custkey"].to_numpy(dtype=np.int64))
    codes_ref = ray.put(cust["c_mktsegment"].map(code_of).to_numpy(dtype=np.int32))
    cats_arr = np.array(cats)

    def join_seg(t: pa.Table) -> pa.Table:
        # join + PARTIAL aggregate in one pass: the segment count is fixed
        # (5), so each batch emits ≤5 partial rows and the driver combines
        # #batches × 5 — no grouped exchange, no joined-row materialization
        keys = ray.get(keys_ref)
        codes = ray.get(codes_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, ck)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        hit = (idx < len(keys)) & (keys[idx_c] == ck)
        code = codes[idx_c][hit]
        rev = np.bincount(code, weights=price[hit], minlength=len(cats_arr))
        n = np.bincount(code, minlength=len(cats_arr))
        present = n > 0
        return pa.table(
            {
                "c_mktsegment": pa.array(cats_arr[present], pa.string()),
                "revenue": pa.array(rev[present], pa.float64()),
                "n_orders": pa.array(n[present], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    parts = orders.map_batches(join_seg, batch_format="pyarrow", batch_size=None).to_pandas()
    out = parts.groupby("c_mktsegment", as_index=False).agg(
        revenue=("revenue", "sum"), n_orders=("n_orders", "sum")
    )
    t = pa.Table.from_pandas(out, preserve_index=False)
    return _round_cols(t, {"revenue": 2})


def q_order_status_counts(sf_dir: str):
    """A2 domain-outcome analog: classify + count per class (fixed 3-value
    key → per-batch partial counts, driver combine; no exchange)."""

    def partial(t: pa.Table) -> pa.Table:
        agg = t.group_by("o_orderstatus").aggregate([("o_orderstatus", "count")])
        # name-based select: pyarrow's key-vs-aggregate column order is not
        # stable across majors
        return agg.select(["o_orderstatus", "o_orderstatus_count"]).rename_columns(
            ["o_orderstatus", "n"]
        )

    import pandas as pd

    parts = (
        _read(sf_dir, "orders", ["o_orderstatus"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = parts.groupby("o_orderstatus", as_index=False).agg(n=("n", "sum"))
    return pa.Table.from_pandas(out, preserve_index=False)


def q_acctbal_band(sf_dir: str, lo: float = 4000.0, hi: float = 6000.0):
    """A9 borderline-band filter: vectorized predicate inside map_batches."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    out = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["c_acctbal"], pa.scalar(lo)), pc.less_equal(t["c_acctbal"], pa.scalar(hi)))
        ),
        batch_format="pyarrow",
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_distinct_event_types(sf_dir: str):
    """D-family distinct: per-batch unique + driver set-union (distinct is
    associative; each batch emits its ≤|domain| values, no shuffle)."""

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"event_type": pc.unique(t["event_type"])})

    parts = (
        _read(sf_dir, "events", ["event_type"])
        .map_batches(uniq, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return pa.table({"event_type": pa.array(sorted(set(parts["event_type"])), pa.string())})


def q_event_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: floor-to-hour inside
    map_batches (vectorized), then a grouped aggregate — the engine's
    windowed-aggregate idiom (SURVEY.md §2.11 / ray_guide streaming-shaped)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("hour", pc.floor_temporal(t["ts"], unit="hour"))

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round_cols(t, {"sum_value": 4})


def q_top_lineitems_per_flag(sf_dir: str, k: int = 3):
    """Per-group top-k — the per-host heap shape, as partial top-k per batch.

    Top-k per key is associative: each batch keeps its own top-k per flag
    (≤ 3 flags × k rows), the driver merges #batches × 3k rows and re-takes
    the top-k. No exchange at all — the previous grouped_map funneled EVERY
    row through one sort partition (3 fixed groups can't spread further)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"])
    order_cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    asc = [False, True, True]

    def topk_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().sort_values(order_cols, ascending=asc)
        from rayfrontier.functions.blocks import from_pandas_bare

        return from_pandas_bare(g.groupby("l_returnflag", sort=False).head(k))

    parts = ds.map_batches(topk_partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = (
        parts.sort_values(order_cols, ascending=asc)
        .groupby("l_returnflag", sort=False)
        .head(k)
        .sort_values(["l_returnflag"] + order_cols, ascending=[True] + asc)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def q_supplier_nation(sf_dir: str):
    """Two-level broadcast join chain (supplier→nation→region) + aggregate.

    nation⋈region collapses driver-side (25×5 rows) into a sorted
    nationkey array + parallel region-code array; each supplier batch joins
    via two searchsorted lookups (the q_mkt_revenue codes pattern — no
    per-row Python) and, since region cardinality is FIXED (5), emits a
    ≤5-row partial (sum, count) that the driver combines: no exchange.
    """
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cats = sorted(region["r_name"].unique())
    rcode = dict(zip(region["r_regionkey"], region["r_name"].map({c: i for i, c in enumerate(cats)})))
    nation = nation.sort_values("n_nationkey")
    keys_ref = ray.put(nation["n_nationkey"].to_numpy(dtype=np.int64))
    codes_ref = ray.put(nation["n_regionkey"].map(rcode).to_numpy(dtype=np.int32))
    cats_arr = np.array(cats)

    def join_partial(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        codes = ray.get(codes_ref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        bal = t["s_acctbal"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, nk)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        hit = (idx < len(keys)) & (keys[idx_c] == nk)  # inner-join: drop misses
        code = codes[idx_c][hit]
        sums = np.bincount(code, weights=bal[hit], minlength=len(cats_arr))
        n = np.bincount(code, minlength=len(cats_arr))
        present = n > 0
        return pa.table(
            {
                "r_name": pa.array(cats_arr[present], pa.string()),
                "sum_bal": pa.array(sums[present], pa.float64()),
                "n_suppliers": pa.array(n[present], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(join_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = parts.groupby("r_name", as_index=False).agg(
        sum_bal=("sum_bal", "sum"), n_suppliers=("n_suppliers", "sum")
    )
    out["avg_bal"] = out["sum_bal"] / out["n_suppliers"]
    out = out[["r_name", "n_suppliers", "avg_bal"]]
    t = pa.Table.from_pandas(out, preserve_index=False)
    return _round_cols(t, {"avg_bal": 4})


def q_part_name_kernel(sf_dir: str):
    """String kernels (§2.9): lower/contains/split-count via pyarrow compute."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def stage(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["p_name"])
        has = pc.match_substring(low, "green")
        n_words = pc.count_substring_regex(t["p_name"], r"\S+")
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_lower": low,
                "has_green": has,
                "n_words": pa.array(n_words.to_numpy(zero_copy_only=False), pa.int64()),
            }
        )

    out = ds.map_batches(stage, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_customer_no_orders(sf_dir: str):
    """Anti-join (SURVEY.md J4): customers with no orders.

    The probe side (distinct o_custkey) is the small side here, so it ships
    once via ray.put and each batch filters locally — the same broadcast
    anti-join the crawl engine uses for its URL-seen probe. At 100 TB the
    probe set becomes the sharded seen-set actor pool instead.
    """
    import ray

    keys = _read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    keys_ref = ray.put(np.array(sorted(keys), dtype=np.int64))

    def anti(t: pa.Table) -> pa.Table:
        have = ray.get(keys_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(have, ck)
        idx_c = np.clip(idx, 0, len(have) - 1)
        mask = ~((idx < len(have)) & (have[idx_c] == ck))
        return t.filter(pa.array(mask))

    out = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        anti, batch_format="pyarrow"
    )
    df = out.to_pandas()
    if len(df.columns) == 0:  # all-filtered: pin schema for the driver compare
        return pa.table({"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())})
    return pa.Table.from_pandas(df, preserve_index=False)


def q_lineitem_quantiles(sf_dir: str):
    """Exact per-group quantiles via groupby().map_groups (discrete quantile:
    sorted[ceil(q*n)-1], DuckDB quantile_disc semantics)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def quants(t: pa.Table) -> pa.Table:
        v = np.sort(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        n = len(v)

        def qd(q: float) -> float:
            return float(v[min(int(np.ceil(q * n)) - 1, n - 1)])

        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].slice(0, 1),
                "p50": pa.array([qd(0.5)], pa.float64()),
                "p90": pa.array([qd(0.9)], pa.float64()),
                "p99": pa.array([qd(0.99)], pa.float64()),
            }
        )

    from rayfrontier.functions.groupagg import grouped_map

    out = grouped_map(ds, "l_returnflag", quants, num_partitions=1)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization (the streaming-window operator family, SURVEY.md §2.11):
    per-user event stream split on >gap inactivity; one row per session.

    User cardinality scales with the data, so this routes through
    functions/groupagg.coarse_group_aggregate (data-sized partition count
    keyed on user_id, ~256 MiB of input each) instead of a native per-user
    groupby — the session logic runs once per PARTITION, fully vectorized
    over all its users at once.
    Deterministic tie-break (ts, event_id) on both engine and oracle.
    """
    from rayfrontier.functions.groupagg import coarse_group_aggregate

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        n = len(df)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same_user = uid[1:] == uid[:-1]
            new_sess[1:] = np.where(same_user & (np.diff(ts) <= gap), 0, 1)
        csum = np.cumsum(new_sess)
        # session id restarts at 1 per user: subtract the running count as of
        # each user's first row (segmented cumsum, no per-user loop)
        first_idx = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg_len = np.diff(np.r_[first_idx, n])
        base = np.repeat(csum[first_idx] - 1, seg_len)
        out = pd.DataFrame({"user_id": uid, "session_id": csum - base, "ts": ts})
        agg = out.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("ts", "size"), start_ts=("ts", "min"), end_ts=("ts", "max")
        )
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    out = coarse_group_aggregate(
        ds, ["user_id"], sessions, size_bytes=_tbl_bytes(sf_dir, "events")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_click_last_purchase(sf_dir: str):
    """As-of join: for every click event, the timestamp of the same user's
    most recent STRICTLY PRIOR purchase (SURVEY.md custom-operator case (a)).

    The as-of key (user_id) is also the partition key, so no cross-group
    state is needed; user cardinality scales with data, so partitioning is
    coarse (functions/groupagg) and the per-partition scan is a segmented
    running-max over ALL users at once (Cython groupby.cummax/shift), never a
    per-user map_groups call."""
    from rayfrontier.functions.groupagg import coarse_group_aggregate

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        pts = df["ts"].where(df["event_type"] == "purchase")
        by_user = df["user_id"]
        # cummax leaves NaT at non-purchase rows; ffill carries the running
        # max forward within each user before taking the strict predecessor
        run = pts.groupby(by_user, sort=False).cummax().groupby(by_user, sort=False).ffill()
        last = run.groupby(by_user, sort=False).shift(1)  # strict predecessor
        mask = (df["event_type"] == "click").to_numpy()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[mask],
                "user_id": df["user_id"].to_numpy()[mask],
                "ts": df["ts"].to_numpy()[mask],
                "last_purchase_ts": last.to_numpy()[mask],
            }
        )

    out = coarse_group_aggregate(
        ds, ["user_id"], asof, size_bytes=_tbl_bytes(sf_dir, "events")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q_order_lineitem_join(sf_dir: str):
    """Large×large hash-partitioned join (J-family, both sides big at scale):
    lineitem ⋈ orders on orderkey via functions.joins.hash_join (native
    Dataset.join when available), then revenue per order-priority.

    Aggregation pushdown: lineitem pre-aggregates (sum rev, count) per
    orderkey INSIDE each batch before the join, so the shuffle moves one
    partial row per (batch, orderkey) instead of every lineitem row — the
    partial-aggregate-below-the-join plan every SQL optimizer picks here.
    """
    from rayfrontier.functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})
        agg = part.group_by("l_orderkey").aggregate([("rev", "sum"), ("rev", "count")])
        return agg.select(["l_orderkey", "rev_sum", "rev_count"]).rename_columns(
            ["l_orderkey", "rev_part", "n_part"]
        )

    import ray

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    # pool ≈ ncpu/4: A/B at 32 CPUs measured 3.9 s with 8 aggregators vs
    # 5.6 s with 32 (per-actor spin-up + finalize overhead dominates once
    # the per-partition shuffle is small); at cluster scale partitions grow
    # with the cluster, just not 1:1 with cores
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = hash_join(
        li.map_batches(partial, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
        nparts=max(4, ncpu // 4),
    )
    # final rollup: 5 fixed priorities → per-batch partials over the join
    # output, driver combine (saves the post-join Aggregate exchange)
    def rollup(t: pa.Table) -> pa.Table:
        agg = t.group_by("o_orderpriority").aggregate(
            [("rev_part", "sum"), ("n_part", "sum")]
        )
        return agg.select(["o_orderpriority", "rev_part_sum", "n_part_sum"]).rename_columns(
            ["o_orderpriority", "revenue", "n_lineitems"]
        )

    import pandas as pd

    parts = joined.map_batches(rollup, batch_format="pyarrow", batch_size=None).to_pandas()
    out = parts.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum"), n_lineitems=("n_lineitems", "sum")
    )
    t = pa.Table.from_pandas(out, preserve_index=False)
    return _round_cols(t, {"revenue": 2})


def q_event_hopping(sf_dir: str, size_h: int = 2, hop_h: int = 1):
    """Hopping (sliding) windows: 2h windows every 1h — each event belongs to
    size/hop windows, emitted by a vectorized flat-map then one grouped
    aggregate (the overlapping-window idiom; tumbling = q_event_hourly)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    n_copies = size_h // hop_h

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        outs = []
        for j in range(n_copies):
            start = ((epoch - j * hop_h * 3600) // (size_h * 3600)) * (size_h * 3600) + j * hop_h * 3600
            outs.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        # epoch seconds (int64), not timestamps: DuckDB's
                        # to_timestamp() is tz-aware and would break the compare
                        "win_start": pa.array(start, pa.int64()),
                        "value": t["value"],
                    }
                )
            )
        return pa.concat_tables(outs)

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "win_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round_cols(t, {"sum_value": 4})


def q_customer_running_total(sf_dir: str):
    """Cumulative window per key: running order-value per customer in
    (date, key) order — coarse-partitioned (customer cardinality scales with
    data) with one segmented cumsum per partition (Cython groupby.cumsum)."""
    from rayfrontier.functions.groupagg import coarse_group_aggregate

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        # same per-key accumulation order as the SQL window frame → identical
        # doubles; quantization happens once, below, on the oracle's lattice
        rt = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(),
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "running_total": rt.to_numpy(),
            }
        )

    out = coarse_group_aggregate(
        ds, ["o_custkey"], running, size_bytes=_tbl_bytes(sf_dir, "orders")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round_cols(t, {"running_total": 2})
