"""Local mirror of the driver's correctness gate: every oracle-backed
queries() entry must match its DuckDB oracle_sql() twin EXACTLY —
same columns, same dtypes-compatible schema, same values (bitwise for
doubles: the driver hashes values, so rounding slop is not allowed).

Run at sf0.001 by default (fast); set SPARK_GRAFT_SF_SMALL=/root/testdata/sf0.01
to mirror the driver's exact scale.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ccspark.registry import ALL

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_NAMES = sorted(n for n, (_f, sql) in ALL.items() if sql is not None)
ROWS_ONLY_NAMES = sorted(n for n, (_f, sql) in ALL.items() if sql is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn, sql = ALL[name]
    got = fn(spark, sf_dir).toPandas()
    want = duck.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}")
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gc, wc = g[c], w[c]
        if str(wc.dtype).startswith("float") or str(gc.dtype).startswith("float"):
            pd.testing.assert_series_equal(
                gc.astype("float64"), wc.astype("float64"),
                check_names=False, check_exact=True, obj=f"{name}.{c}")
        else:
            pd.testing.assert_series_equal(
                gc.astype(str), wc.astype(str),
                check_names=False, obj=f"{name}.{c}")


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(name, spark, sf_dir):
    fn, _ = ALL[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
