"""Join operators vs duckdb oracles (SURVEY §2.6)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from airbyte_ray.joins import anti_join, broadcast_join, hash_join, semi_join

SF = "/root/testdata/sf0.001"


def _sorted_df(x, cols):
    df = x.to_pandas() if not hasattr(x, "sort_values") else x
    return df.sort_values(cols, ignore_index=True)


def test_broadcast_join_inner():
    orders = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    cust = cust.rename_columns(["o_custkey", "c_name"])
    got = _sorted_df(pa.Table.from_pylist(broadcast_join(orders, cust, on="o_custkey").take_all()),
                     ["o_orderkey"])
    exp = duckdb.sql(
        f"""SELECT o_orderkey, o_custkey, c_name FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey ORDER BY o_orderkey"""
    ).df()
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert got["c_name"].tolist() == exp["c_name"].tolist()


def test_broadcast_join_left_keeps_unmatched():
    big = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    small = pa.table({"k": [1], "w": [9]})
    out = _sorted_df(pa.Table.from_pylist(broadcast_join(big, small, on="k", how="left").take_all()), ["k"])
    assert out["w"].tolist()[0] == 9 and len(out) == 3


def test_hash_join_matches_duckdb():
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"])
    orders = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderstatus"]), batch_format="pyarrow"
    )
    got = _sorted_df(
        pa.Table.from_pylist(hash_join(li, orders, on="l_orderkey", num_buckets=8).take_all()),
        ["l_orderkey", "l_linenumber"],
    )
    exp = duckdb.sql(
        f"""SELECT l_orderkey, l_linenumber, o_orderstatus
            FROM '{SF}/lineitem.parquet' l JOIN '{SF}/orders.parquet' o
            ON l.l_orderkey = o.o_orderkey ORDER BY l_orderkey, l_linenumber"""
    ).df()
    assert len(got) == len(exp)
    assert got["o_orderstatus"].tolist() == exp["o_orderstatus"].tolist()


def test_semi_anti_join():
    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    keys = [1, 2, 3]
    s = semi_join(ev, keys, on="user_id").take_all()
    a = anti_join(ev, keys, on="user_id").take_all()
    assert all(r["user_id"] in keys for r in s)
    assert all(r["user_id"] not in keys for r in a)
    assert len(s) + len(a) == ev.count()
