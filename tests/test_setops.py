"""Distinct set ops (INTERSECT / EXCEPT) vs DuckDB (SURVEY §2.9)."""

import duckdb
import pyarrow as pa
import ray.data

from airbyte_ray.functions.setops import except_distinct, intersect_distinct

EV = "/root/testdata/sf0.001/events.parquet"


def test_intersect_except_match_duckdb():
    ev = ray.data.read_parquet(EV, columns=["user_id", "event_type"])
    import pyarrow.compute as pc

    def of(v):
        return lambda t: t.filter(pc.equal(t["event_type"], v)).select(["user_id"])

    clicks = ev.map_batches(of("click"), batch_format="pyarrow")
    errors = ev.map_batches(of("error"), batch_format="pyarrow")
    def vals(ds):
        df = ds.to_pandas()
        # an all-empty Dataset loses its column schema in to_pandas
        return sorted(df["user_id"]) if "user_id" in df.columns else []

    inter = vals(intersect_distinct(clicks, errors, ["user_id"]))
    exc = vals(except_distinct(clicks, errors, ["user_id"]))
    e_inter = sorted(duckdb.sql(
        f"""SELECT user_id FROM '{EV}' WHERE event_type='click'
            INTERSECT SELECT user_id FROM '{EV}' WHERE event_type='error'"""
    ).df()["user_id"])
    e_exc = sorted(duckdb.sql(
        f"""SELECT user_id FROM '{EV}' WHERE event_type='click'
            EXCEPT SELECT user_id FROM '{EV}' WHERE event_type='error'"""
    ).df()["user_id"])
    assert inter == e_inter and exc == e_exc


def test_setops_multicol_and_nulls():
    """Row-equality semantics: null fields MATCH (SQL set-op behavior,
    unlike join equality), and multi-column keys don't cross-contaminate."""
    l = ray.data.from_arrow(pa.table({"a": [1, 1, 2, None], "b": ["x", "y", None, "z"]}))
    r = ray.data.from_arrow(pa.table({"a": [1, 2, None], "b": ["y", None, "z"]}))
    inter = intersect_distinct(l, r, ["a", "b"]).to_pandas()
    exc = except_distinct(l, r, ["a", "b"]).to_pandas()
    assert len(inter) == 3        # (1,y), (2,null), (null,z) all match
    assert len(exc) == 1 and exc["a"].iloc[0] == 1 and exc["b"].iloc[0] == "x"


def test_row_key_injective_on_separator_values():
    """Length-prefixed encoding: values containing the old separator or
    null sentinel must NOT collide (review finding)."""
    l = ray.data.from_arrow(pa.table({"a": ["a\x01b", "N"], "b": ["c", "z"]}))
    r = ray.data.from_arrow(pa.table({"a": ["a", None], "b": ["b\x01c", "z"]}))
    inter = intersect_distinct(l, r, ["a", "b"]).to_pandas()
    assert len(inter) == 0  # ('a\x01b','c') != ('a','b\x01c'); 'N' != NULL
