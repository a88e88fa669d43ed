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


def test_range_join_matches_duckdb():
    """Overlapping bands + explicit bounds — the driver query's shape at
    sf0.001, checked against the DuckDB inequality join."""
    import numpy as np

    from airbyte_ray.joins import range_join

    i = np.arange(12, dtype=np.int64)
    bands = pa.table({"band_id": i, "lo": (i * 40).astype(np.float64),
                      "hi": (i * 40 + 60).astype(np.float64)})
    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    got = _sorted_df(
        range_join(ev, ray.data.from_arrow(bands), on="value", lo="lo", hi="hi",
                   bounds=np.linspace(0.0, 500.0, 9)[1:-1]).to_pandas(),
        ["event_id", "band_id"],
    )
    exp = duckdb.sql(
        f"""SELECT e.event_id, e.value, b.band_id, b.lo, b.hi
            FROM '{SF}/events.parquet' e JOIN (
              SELECT CAST(i AS BIGINT) band_id, i*40.0 lo, i*40.0+60.0 hi
              FROM generate_series(0,11) t(i)) b
            ON e.value >= b.lo AND e.value < b.hi
            ORDER BY e.event_id, b.band_id"""
    ).df()
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["band_id"].tolist() == exp["band_id"].tolist()


def test_range_join_sampled_bounds_and_edges():
    """bounds=None (sampled-quantile path), an EMPTY interval (matches
    nothing), and a domain-spanning interval (replicated to every bucket,
    matches everything exactly once)."""
    import numpy as np

    from airbyte_ray.joins import range_join

    left = ray.data.from_arrow(pa.table({
        "x": np.linspace(0.0, 99.0, 100), "row": np.arange(100, dtype=np.int64)
    }))
    right = ray.data.from_arrow(pa.table({
        "iid": [0, 1, 2],
        "lo": [50.0, 7.0, -1e9],
        "hi": [50.0, 9.0, 1e9],  # empty / small / whole-domain
    }))
    out = range_join(left, right, on="x", lo="lo", hi="hi", num_buckets=4).to_pandas()
    assert (out["iid"] == 0).sum() == 0                       # empty interval
    assert sorted(out[out["iid"] == 1]["x"]) == [7.0, 8.0]    # [7, 9)
    assert (out["iid"] == 2).sum() == 100                     # once per left row
    assert len(out) == 102


def test_hash_join_full_outer():
    """Unmatched rows of BOTH sides surface exactly once with null other
    side; matched keys coalesce."""
    l = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
    r = ray.data.from_arrow(pa.table({"k": [2, 3, 4], "rv": [20, 30, 40]}))
    out = hash_join(l, r, on="k", how="outer").to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].tolist() == ["a", "b", "c", None]
    assert out["rv"].fillna(-1).tolist() == [-1, 20, 30, 40]


def _skew_fixture():
    import numpy as np

    # one scorching key (5k rows), a warm key (500), 200 cold keys
    keys = [7] * 5000 + [11] * 500 + list(range(100, 300)) * 3
    rng = np.random.default_rng(3)
    rng.shuffle(keys)
    left = pa.table({"k": pa.array(keys, pa.int64()),
                     "lv": pa.array(range(len(keys)), pa.int64())})
    right = pa.table({"k": pa.array([7, 11] + list(range(100, 250)), pa.int64()),
                      "rv": pa.array([f"r{k}" for k in
                                      [7, 11] + list(range(100, 250))])})
    return left, right


def test_skew_join_matches_hash_join():
    from airbyte_ray.joins import skew_join

    left, right = _skew_fixture()
    for how in ("inner", "left"):
        got = _sorted_df(
            pa.Table.from_pylist(
                skew_join(ray.data.from_arrow(left).repartition(6),
                          ray.data.from_arrow(right), "k",
                          how=how, hot_min_count=400).take_all()),
            ["k", "lv"])
        exp = _sorted_df(
            pa.Table.from_pylist(
                hash_join(ray.data.from_arrow(left),
                          ray.data.from_arrow(right), "k",
                          how=how).take_all()),
            ["k", "lv"])
        assert got["k"].tolist() == exp["k"].tolist(), how
        assert got["lv"].tolist() == exp["lv"].tolist(), how
        assert got["rv"].fillna("∅").tolist() == exp["rv"].fillna("∅").tolist(), how


def test_skew_join_no_hot_keys_falls_back():
    from airbyte_ray.joins import skew_join

    left, right = _skew_fixture()
    got = skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k", hot_min_count=10_000)  # nothing qualifies
    exp = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k")
    assert sorted((r["k"], r["lv"]) for r in got.take_all()) == \
        sorted((r["k"], r["lv"]) for r in exp.take_all())


def test_skew_join_hot_key_without_right_partner():
    from airbyte_ray.joins import skew_join

    left = pa.table({"k": pa.array([1] * 1000 + [2, 3], pa.int64()),
                     "lv": pa.array(range(1002), pa.int64())})
    right = pa.table({"k": pa.array([2, 3], pa.int64()),
                      "rv": pa.array(["a", "b"])})
    inner = skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      "k", how="inner", hot_min_count=100)
    assert sorted(r["k"] for r in inner.take_all()) == [2, 3]
    lft = skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k", how="left", hot_min_count=100)
    rows = lft.take_all()
    assert len(rows) == 1002  # every left row preserved
    assert all(r["rv"] is None for r in rows if r["k"] == 1)


def test_skew_join_broadcast_cap_raises():
    import pytest as _pt

    from airbyte_ray.joins import skew_join

    left = pa.table({"k": pa.array([1] * 1000, pa.int64()),
                     "lv": pa.array(range(1000), pa.int64())})
    right = pa.table({"k": pa.array([1] * 50, pa.int64()),
                      "rv": pa.array([f"r{i}" for i in range(50)])})
    with _pt.raises(ValueError, match="cap"):
        skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  "k", hot_min_count=100, broadcast_cap_rows=10)


def test_skew_join_routes_hot_rows_off_the_exchange():
    from airbyte_ray.joins import skew_join

    left, right = _skew_fixture()
    stats = {}
    out = skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k", hot_min_count=400, detect_sample=1.0,
                    stats_out=stats)
    assert out.count() > 0
    # keys 7 (5000 rows) and 11 (500) are hot at threshold 400; 5500 of
    # 6100 left rows bypass the exchange
    assert stats["hot_keys"] == 2
    assert stats["hot_left_rows"] == 5500
    assert stats["exchange_frac"] == round(600 / 6100, 4)
