"""hash_join (native + explicit fallback) and dedup connected components."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _sides(ray_session):
    import ray.data as rd

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64()), "lv": pa.array([10, 20, 21, 30, 50], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([1, 2, 4], pa.int64()), "rv": pa.array(["a", "b", "d"], pa.string())})
    )
    return left, right


def _check(df: pd.DataFrame):
    got = sorted(zip(df["k"], df["lv"], df["rv"]))
    assert got == [(1, 10, "a"), (2, 20, "b"), (2, 21, "b")]


def test_hash_join_native_and_fallback(ray_session):
    from rayfrontier.functions.joins import hash_join

    left, right = _sides(ray_session)
    native = hash_join(left, right, on="k", right_on="rk", how="inner", nparts=4).to_pandas()
    _check(native)
    left, right = _sides(ray_session)
    explicit = hash_join(
        left, right, on="k", right_on="rk", how="inner", nparts=4, prefer_native=False
    ).to_pandas()
    _check(explicit)


def test_dedup_components_matches_union_find(ray_session):
    import ray.data as rd

    from rayfrontier.pipelines.dedup import dedup_components

    rng = np.random.default_rng(7)
    n = 200
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(60, 2)) if a != b]
    pairs = rd.from_items([{"a": min(a, b), "b": max(a, b)} for a, b in edges])
    ids = rd.from_items([{"doc_id": i} for i in range(n)])
    out = dedup_components(pairs, ids).to_pandas().set_index("doc_id")["component_id"]

    # reference union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in range(n)}
    # component ids must induce the same partition, with min-id labels
    for i in range(n):
        assert out[i] == expect[i], (i, out[i], expect[i])


def test_dedup_components_distributed_matches_driver(ray_session):
    """The Dataset-resident label propagation (the >1e8-vertex path) must
    produce exactly the driver-vectorized components, including on chain
    graphs that need several propagation rounds."""
    import ray.data as rd

    from rayfrontier.pipelines.dedup import dedup_components, dedup_components_distributed

    rng = np.random.default_rng(11)
    n = 120
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(40, 2)) if a != b]
    # add a short chain (diameter > 1 round) in the upper id range
    edges += [(n + i, n + i + 1) for i in range(5)]
    n_total = n + 6
    pairs_rows = [{"a": min(a, b), "b": max(a, b)} for a, b in edges]
    ids_rows = [{"doc_id": i} for i in range(n_total)]

    driver = (
        dedup_components(rd.from_items(pairs_rows), rd.from_items(ids_rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dist = (
        dedup_components_distributed(rd.from_items(pairs_rows), rd.from_items(ids_rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert driver["doc_id"].tolist() == dist["doc_id"].tolist()
    assert driver["component_id"].tolist() == dist["component_id"].tolist()


def test_sketch_suite_error_bounds(ray_session):
    """Distributed HLL / Count-Min / KLL against exact answers on a skewed
    synthetic stream: HLL within 5%, CMS estimates in [exact, exact + eN/w],
    KLL quantiles within 2% rank error."""
    import collections

    import ray.data as rd

    from rayfrontier.functions.sketches import approx_distinct, approx_quantiles, heavy_hitters

    rng = np.random.default_rng(13)
    n = 100_000
    users = rng.integers(0, 8000, size=n)
    # zipf-ish skewed labels so top-k is meaningful
    labels = [f"w{int(z)}" for z in np.minimum(rng.zipf(1.5, size=n), 50)]
    values = rng.normal(100.0, 15.0, size=n)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "label": pa.array(labels, pa.string()),
                "value": pa.array(values, pa.float64()),
            }
        )
    ).repartition(16)

    exact_users = len(set(users.tolist()))
    est = approx_distinct(ds, "user_id")
    assert abs(est - exact_users) / exact_users < 0.05

    exact_counts = collections.Counter(labels)
    hh = heavy_hitters(ds, "label", k=5)
    eps_bound = int(np.e * n / 4096) + 1
    for val, approx_n in hh:
        assert exact_counts[val] <= approx_n <= exact_counts[val] + eps_bound, (val, approx_n)
    # the true #1 item must be reported first (its margin dwarfs the CMS error)
    assert hh[0][0] == exact_counts.most_common(1)[0][0]

    ranks = np.sort(values)
    for q, a in zip((0.5, 0.9, 0.99), approx_quantiles(ds, "value", [0.5, 0.9, 0.99])):
        true_rank = np.searchsorted(ranks, a) / n
        assert abs(true_rank - q) < 0.02, (q, a, true_rank)


def _skewed_sides():
    """90% of the big side shares one hot key — the salt target."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    k = np.where(rng.random(2000) < 0.9, 7, rng.integers(0, 50, 2000)).astype(np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(k, pa.int64()),
                  "lv": pa.array(np.arange(2000), pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
                  "rv": pa.array([f"v{i}" for i in range(50)], pa.string())})
    )
    return left, right


def _norm_join(df: pd.DataFrame) -> pd.DataFrame:
    # native keeps only the left key column; fallback keeps both — compare
    # plain-vs-salted on whatever the path produces
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_hash_join_salted_equals_unsalted(ray_session):
    """Forced salt on the hot key: output row-for-row identical to unsalted,
    on both the native and the explicit fallback paths, inner and left."""
    from rayfrontier.functions.joins import hash_join

    for native in (True, False):
        for how in ("inner", "left"):
            left, right = _skewed_sides()
            plain = hash_join(left, right, on="k", right_on="rk", how=how,
                              nparts=8, prefer_native=native).to_pandas()
            left, right = _skewed_sides()
            salted = hash_join(left, right, on="k", right_on="rk", how=how,
                               nparts=8, prefer_native=native,
                               salt_keys=[7], salt_factor=4).to_pandas()
            assert "_salt" not in salted.columns and "_salt_r" not in salted.columns
            pd.testing.assert_frame_equal(
                _norm_join(plain), _norm_join(salted), check_dtype=False
            )


def test_hash_join_salt_accepts_generator(ray_session):
    """salt_keys may be any iterable. A generator used to be exhausted by
    hash_join's emptiness test, leaving _salt_sides with no hot keys — a
    SILENT no-op (output is salt-invariant, so only the salting behavior
    itself can detect it): every left row got salt 0 and the hot right row
    was never replicated. Assert the distribution actually happens."""
    from rayfrontier.functions.joins import _salt_sides, hash_join

    left, right = _skewed_sides()
    l2, r2 = _salt_sides(left, right, "k", "rk", (x for x in [7]), 4)
    rt = r2.to_pandas()
    assert int((rt["rk"] == 7).sum()) == 4, "hot right row must replicate x4"
    lt = l2.to_pandas()
    assert lt.loc[lt["k"] == 7, "_salt"].nunique() > 1, "hot left rows must spread"

    # end-to-end: generator-salted join still equals the plain join
    left, right = _skewed_sides()
    plain = hash_join(left, right, on="k", right_on="rk", how="inner",
                      nparts=8, prefer_native=False).to_pandas()
    left, right = _skewed_sides()
    salted = hash_join(left, right, on="k", right_on="rk", how="inner",
                       nparts=8, prefer_native=False,
                       salt_keys=(x for x in [7]), salt_factor=4).to_pandas()
    pd.testing.assert_frame_equal(
        _norm_join(plain), _norm_join(salted), check_dtype=False
    )


def test_hash_join_salt_rejects_right_outer(ray_session):
    from rayfrontier.functions.joins import hash_join

    left, right = _skewed_sides()
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        hash_join(left, right, on="k", right_on="rk", how="right", salt_keys=[7])
