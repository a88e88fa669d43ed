"""Mimics the evaluation driver: run every ``queries()`` entry at sf0.01 and
compare against its ``oracle_sql()`` DuckDB result (row count + schema +
order-insensitive values)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got = _norm(_to_df(QUERIES[name](SF_DIR)))
    exp = _norm(_duck(ORACLES[name]))
    assert list(got.columns) == list(exp.columns), f"{name}: {got.columns} vs {exp.columns}"
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g):
            assert np.allclose(g.fillna(math.nan), e.fillna(math.nan), equal_nan=True), f"{name}.{c}"
        else:
            assert g.astype(object).fillna("∅").tolist() == e.astype(object).fillna("∅").tolist(), (
                f"{name}.{c}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_df(QUERIES[name](SF_DIR))
    assert len(got) >= 0 and len(got.columns) > 0


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
