"""Pre-validates the driver's correctness gate: every queries() entry must
match its oracle_sql() DuckDB twin — row count, column names, and values
(order-insensitive) — on the same parquet tables."""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def dk():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df):
    """pandas frame -> sorted list of canonical row tuples."""
    df = df[sorted(df.columns)]

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if hasattr(v, "tolist"):  # numpy arrays / scalars
            t = v.tolist()
            return canon(t) if isinstance(t, list) else canon_scalar(t)
        return v

    def canon_scalar(v):
        return canon(v)

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows


ALL = sorted(entry.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, dk, name):
    q = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    if sql is None:
        pytest.skip(f"{name}: rows-only (no oracle)")
    got = q(spark, SF_DIR).toPandas()
    want = dk.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name} columns: {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    mism = [i for i, (x, y) in enumerate(zip(g, w)) if x != y][:5]
    assert g == w, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={g[i]} duckdb={w[i]}" for i in mism[:2]
    )
