"""Mimics the evaluation driver: run every ``queries()`` entry at sf0.01 and
compare against its ``oracle_sql()`` DuckDB result two ways:

* a diagnostic per-column comparison (``test_query_matches_oracle``) that
  localizes a failure to a column, and
* the driver's EXACT canonical comparison (``test_driver_hash_parity``):
  columns sorted by name, rows sorted, ``to_csv(float_format="%.6g")``,
  md5 — so a dtype drift (e.g. DuckDB HUGEINT rendering as float64 while
  the engine emits int64) can never pass pytest while failing the driver.

Each query runs ONCE per session; both tests read the memoized result.
"""

import hashlib
import math
from functools import lru_cache

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


@lru_cache(maxsize=None)
def _run_pair(name: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One engine run + one oracle run per query per session."""
    got = _to_df(QUERIES[name](SF_DIR))
    exp = _duck(ORACLES[name])
    return got, exp


def _driver_hash(df: pd.DataFrame) -> str:
    """The driver's canonical value hash, byte-for-byte."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6g")
    return hashlib.md5(payload.encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got_raw, exp_raw = _run_pair(name)
    got, exp = _norm(got_raw), _norm(exp_raw)
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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_driver_hash_parity(name):
    got, exp = _run_pair(name)
    assert _driver_hash(got) == _driver_hash(exp), (
        f"{name}: driver canonical hash mismatch (dtypes {dict(got.dtypes)} "
        f"vs {dict(exp.dtypes)})"
    )


def test_every_query_has_an_oracle():
    # Was a rows-only runner for oracle-less queries; since round 4 every
    # QUERIES entry ships a DuckDB oracle, so the parametrized form skipped
    # on an empty set.  Keep the invariant as a positive assertion instead.
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
