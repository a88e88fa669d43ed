"""Grouped top-N and pivoted counts."""

import duckdb
import pyarrow as pa
import ray.data

from airbyte_ray.functions.agg import grouped_topn, pivot_counts

EV = "/root/testdata/sf0.001/events.parquet"


def test_grouped_topn_matches_window_rank():
    ds = ray.data.read_parquet(EV, columns=["user_id", "event_id", "value"]).repartition(6)
    got = (
        grouped_topn(ds, key="user_id", order_col="value", n=3, tie_col="event_id")
        .to_pandas().sort_values(["user_id", "rnk"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT user_id, event_id, value, rnk FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rnk
              FROM '{EV}') WHERE rnk <= 3
            ORDER BY user_id, rnk"""
    ).df()
    assert got[["user_id", "event_id", "rnk"]].values.tolist() == \
        exp[["user_id", "event_id", "rnk"]].values.tolist()


def test_grouped_topn_ascending_and_small_groups():
    t = pa.table({"k": ["a", "a", "a", "b"], "v": [3.0, 1.0, 2.0, 9.0],
                  "id": [1, 2, 3, 4]})
    got = (
        grouped_topn(ray.data.from_arrow(t), "k", "v", n=2,
                     descending=False, tie_col="id")
        .to_pandas().sort_values(["k", "rnk"])
    )
    assert got[["k", "id"]].values.tolist() == [["a", 2], ["a", 3], ["b", 4]]


def test_pivot_counts_matches_conditional_agg():
    ds = ray.data.read_parquet(EV, columns=["user_id", "event_type"]).repartition(5)
    vals = ["click", "error", "purchase", "signup", "view"]
    got = (
        pivot_counts(ds, "user_id", "event_type", vals)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT user_id,
              {', '.join(f"CAST(sum(CASE WHEN event_type = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS {v}" for v in vals)}
            FROM '{EV}' GROUP BY user_id ORDER BY user_id"""
    ).df()
    for v in vals:
        assert list(got[v]) == list(exp[v]), v
    assert (got[vals].sum(axis=1) > 0).all()
