"""Mimics the driver's correctness gate: every queries() entry runs at sf0.01;
entries with oracle_sql() are compared against DuckDB (row count + column
names + order-insensitive values); rows-only entries are smoke-checked for
non-emptiness and stable schema."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(ray_res, sql, con, name):
    df_ray = ray_res.to_pandas() if not isinstance(ray_res, pd.DataFrame) else ray_res
    df_sql = con.sql(sql).df()
    assert sorted(df_ray.columns) == sorted(df_sql.columns), f"{name}: column names differ"
    assert len(df_ray) == len(df_sql), f"{name}: row count {len(df_ray)} vs {len(df_sql)}"
    a, b = _norm(df_ray), _norm(df_sql)
    b = b.astype(a.dtypes.to_dict(), errors="ignore")
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_sql_checked_queries(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        try:
            _compare(qs[name](SF_DIR), sql, con, name)
        except AssertionError as e:
            failures.append(f"{name}: {str(e)[:300]}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries(entrymod):
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    for name, fn in qs.items():
        if name in oracles:
            continue
        res = fn(SF_DIR)
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df.columns) > 0, f"{name} lost its schema"
        # pair finders can legitimately find nothing at this scale:
        may_be_empty = {
            "docs_simhash_pairs", "embed_dups", "docs_minhash_pairs", "docs_ngram_pairs",
        }
        if name not in may_be_empty:
            assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) > 0
    assert list(df.columns) == ["domain", "url", "sim", "ok", "valid", "dup", "seq"]


def test_knn_ivf_recall(entrymod):
    """IVF must recover most of the brute-force top-10 (recall >= 0.6)."""
    brute = entrymod.queries()["knn_brute"](SF_DIR).to_pandas()
    ivf = entrymod.queries()["knn_ivf"](SF_DIR).to_pandas()
    recall = len(set(brute["vec_id"]) & set(ivf["vec_id"])) / len(brute)
    assert recall >= 0.6, f"IVF recall {recall}"


def test_registry_exactly_fifty(entrymod):
    """The driver records only the FIRST 50 queries() entries; a 51st would
    silently push a SQL-checked query past the recording window (VERDICT r4
    directive #8). Every entry keeps its oracle, and vice versa."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) == 50, f"registry must stay at exactly 50 entries, got {len(q)}"
    assert set(o) <= set(q), f"oracle-only keys: {set(o) - set(q)}"
