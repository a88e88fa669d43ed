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


def test_running_agg_matches_window_sum():
    """Segmented cumulative sum + lag vs the DuckDB window, string key,
    many partitions (keys split across blocks must still stitch)."""
    from airbyte_ray.functions.agg import running_agg

    ds = ray.data.read_parquet(EV, columns=["user_id", "event_id"]).repartition(6)
    ds = ds.map_batches(
        lambda t: pa.table({
            "k": t["user_id"].cast(pa.string()),
            "event_id": t["event_id"],
            "v": t["event_id"],  # int payload: exact sums
        }),
        batch_format="pyarrow",
    )
    got = (
        running_agg(ds, key="k", order_col="event_id", val_col="v",
                    out="rs", lag_out="prev", num_partitions=5)
        .to_pandas().sort_values(["k", "event_id"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT CAST(user_id AS VARCHAR) k, event_id, event_id v,
                   CAST(SUM(event_id) OVER w AS BIGINT) rs,
                   lag(event_id) OVER w prev
            FROM '{EV}'
            WINDOW w AS (PARTITION BY CAST(user_id AS VARCHAR) ORDER BY event_id)
            ORDER BY k, event_id"""
    ).df()
    assert got["rs"].tolist() == exp["rs"].tolist()
    # lag: null at every key head, prior event_id elsewhere
    assert got["prev"].isna().tolist() == exp["prev"].isna().tolist()
    m = ~exp["prev"].isna()
    assert got["prev"][m].astype("int64").tolist() == exp["prev"][m].astype("int64").tolist()


def test_running_agg_float_left_associated():
    """Float running sum is the left-associated sequential scan —
    bit-identical to an explicit Python accumulation in order."""
    from airbyte_ray.functions.agg import running_agg

    t = pa.table({"k": ["a"] * 5 + ["b"] * 3,
                  "o": list(range(5)) + list(range(3)),
                  "v": [0.1, 0.2, 0.7, 1e16, 1.0, 3.5, 0.25, -1.0]})
    got = (running_agg(ray.data.from_arrow(t), "k", "o", "v", out="rs")
           .to_pandas().sort_values(["k", "o"]))
    exp = []
    for ks in ("a", "b"):
        acc = 0.0
        for v in t.filter(pa.compute.equal(t["k"], ks))["v"].to_pylist():
            acc += v
            exp.append(acc)
    assert got["rs"].tolist() == exp


def test_rollup_agg_levels_and_gid():
    """All prefix levels present; gid follows SQL GROUPING() bits; totals
    consistent across levels."""
    from airbyte_ray.functions.agg import rollup_agg

    t = pa.table({"a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 4]})
    got = (rollup_agg(ray.data.from_arrow(t).repartition(2), ["a", "b"], "v")
           .to_pandas())
    grand = got[got.gid == 3]
    assert len(grand) == 1 and grand.sum_val.iloc[0] == 7 and grand.n.iloc[0] == 3
    lvl_a = got[got.gid == 1].set_index("a")
    assert lvl_a.loc["x"].sum_val == 3 and lvl_a.loc["y"].sum_val == 4
    assert got[got.gid == 1].b.isna().all()
    assert len(got[got.gid == 0]) == 3  # (x,p) (x,q) (y,p)
    assert got.sum_val.sum() == 7 * 3  # each level re-sums the corpus


def test_unpivot_melts_and_casts():
    from airbyte_ray.stages.transforms import unpivot

    t = pa.table({"id": [1, 2], "m1": [1.5, 2.5], "m2": pa.array([3, 4], pa.int64())})
    out = pa.Table.from_pylist(
        ray.data.from_arrow(t)
        .map_batches(unpivot(["id"], ["m1", "m2"]), batch_format="pyarrow")
        .take_all()
    ).to_pandas().sort_values(["variable", "id"])
    assert out.variable.tolist() == ["m1", "m1", "m2", "m2"]
    assert out.value.tolist() == [1.5, 2.5, 3.0, 4.0]  # m2 widened to float64


def test_window_aggs_null_faithful():
    """SQL NULL semantics (VERDICT r4 item 4): SUM skips nulls; a window
    that has seen zero non-null values yields NULL, not 0 — including an
    all-null running prefix and a rolling window that slides past the
    last non-null.  Output schema stays the value column's type."""
    from airbyte_ray.functions.agg import rolling_agg, running_agg

    t = pa.table({
        "k": ["a"] * 5 + ["b"] * 2,
        "o": [1, 2, 3, 4, 5, 1, 2],
        "v": pa.array([None, None, 7, None, 3, None, 1], pa.int64()),
    })
    run = (running_agg(ray.data.from_arrow(t).repartition(3), "k", "o", "v",
                       out="rs")
           .to_pandas().sort_values(["k", "o"]))
    assert run["rs"].tolist()[:2] == [None, None] or run["rs"].isna().tolist()[:2] == [True, True]
    assert run["rs"].tolist()[2:5] == [7, 7, 10]
    assert run["rs"].isna().tolist()[5:] == [True, False]
    assert run["rs"].iloc[6] == 1

    roll = (rolling_agg(ray.data.from_arrow(t).repartition(2), "k", "o", "v",
                        preceding=1, out="w2")
            .to_pandas().sort_values(["k", "o"]))
    # windows (size ≤2): [N],[N,N],[N,7],[7,N],[N,3] | [N],[N,1]
    assert roll["w2"].isna().tolist() == [True, True, False, False, False,
                                          True, False]
    assert roll["w2"].dropna().tolist() == [7, 7, 3, 1]

    # DuckDB parity on the same table
    exp = duckdb.sql(
        """SELECT k, o,
                  CAST(SUM(v) OVER (PARTITION BY k ORDER BY o) AS BIGINT) rs,
                  CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
                       ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) w2
           FROM t ORDER BY k, o"""
    ).df()
    assert run["rs"].isna().tolist() == exp["rs"].isna().tolist()
    assert run["rs"].dropna().tolist() == exp["rs"].dropna().tolist()
    assert roll["w2"].isna().tolist() == exp["w2"].isna().tolist()
    assert roll["w2"].dropna().tolist() == exp["w2"].dropna().tolist()


def test_rolling_agg_window_semantics():
    """Window never crosses a key boundary; width > segment = running sum."""
    from airbyte_ray.functions.agg import rolling_agg

    t = pa.table({"k": ["a"] * 5 + ["b"] * 2,
                  "o": [1, 2, 3, 4, 5, 1, 2],
                  "v": [1, 2, 4, 8, 16, 100, 200]})
    got = (rolling_agg(ray.data.from_arrow(t).repartition(3), "k", "o", "v",
                       preceding=1, out="w2")
           .to_pandas().sort_values(["k", "o"]))
    assert got["w2"].tolist() == [1, 3, 6, 12, 24, 100, 300]
    wide = (rolling_agg(ray.data.from_arrow(t), "k", "o", "v",
                        preceding=99, out="w")
            .to_pandas().sort_values(["k", "o"]))
    assert wide["w"].tolist() == [1, 3, 7, 15, 31, 100, 300]


def test_rollup_agg_null_sum_col_count_star():
    """COUNT is COUNT(*) even when sum_col has nulls, and an all-null sum
    stays SQL NULL (review findings)."""
    from airbyte_ray.functions.agg import rollup_agg

    t = pa.table({"a": ["x", "x", "y"], "b": ["p", "p", "q"],
                  "v": pa.array([1, None, None], pa.int64())})
    got = (rollup_agg(ray.data.from_arrow(t), ["a", "b"], "v")
           .to_pandas())
    grand = got[got.gid == 3].iloc[0]
    assert grand.n == 3 and grand.sum_val == 1
    xp = got[(got.gid == 0) & (got.a == "x")].iloc[0]
    assert xp.n == 2 and xp.sum_val == 1          # COUNT(*) counts the null row
    import pandas as pd

    yq = got[(got.gid == 0) & (got.a == "y")].iloc[0]
    assert yq.n == 1 and pd.isna(yq.sum_val)  # all-null sum stays SQL NULL


def test_grouped_quantiles_matches_duckdb():
    """Per-key quantile_disc rank rule vs DuckDB, uneven group sizes."""
    from airbyte_ray.functions.agg import grouped_quantiles

    ds = ray.data.read_parquet(EV, columns=["user_id", "event_id"]).repartition(4)
    got = (grouped_quantiles(ds, "user_id", "event_id", [0.0, 0.25, 0.5, 1.0])
           .to_pandas().sort_values(["user_id", "q"]).reset_index(drop=True))
    union = " UNION ALL ".join(
        f"""SELECT user_id, CAST({q} AS DOUBLE) q,
                   quantile_disc(event_id, {q}) AS value
            FROM '{EV}' GROUP BY user_id"""
        for q in (0.0, 0.25, 0.5, 1.0)
    )
    exp = duckdb.sql(f"SELECT * FROM ({union}) ORDER BY user_id, q").df()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["value"].tolist() == exp["value"].tolist()


def test_null_and_large_int_keys_segment_correctly():
    """NULL keys form ONE group (not one per row) and int64 keys above
    2^53 stay distinct — the float64-NaN segmentation bug (review
    finding)."""
    from airbyte_ray.functions.agg import grouped_quantiles, running_agg

    big = 2**53
    t = pa.table({
        "k": pa.array([None, None, None, big, big + 1], pa.int64()),
        "o": [1, 2, 3, 1, 1],
        "v": pa.array([5, 7, 9, 10, 20], pa.int64()),
    })
    gq = grouped_quantiles(ray.data.from_arrow(t), "k", "v", [0.5]).to_pandas()
    assert len(gq) == 3                                  # NULL, big, big+1
    assert gq[gq.k.isna()]["value"].iloc[0] == 7          # one NULL group, p50
    assert sorted(gq[~gq.k.isna()]["value"]) == [10, 20]  # 2^53 keys distinct
    ra = (running_agg(ray.data.from_arrow(t), "k", "o", "v", out="rs")
          .to_pandas().sort_values(["o"]))
    assert ra[ra.k.isna()]["rs"].tolist() == [5, 12, 21]  # one NULL segment


def test_window_ranks_matches_duckdb():
    """row_number / dense_rank / ntile vs DuckDB, ties present (duplicate
    values per key exercise dense_rank) and groups smaller than n."""
    from airbyte_ray.functions.agg import window_ranks

    t = pa.table({"k": ["a"] * 7 + ["b"] * 2,
                  "v": [5, 5, 3, 3, 3, 9, 1, 2, 2],
                  "id": list(range(9))})
    got = (window_ranks(ray.data.from_arrow(t).repartition(3), "k", "v", "id",
                        ntile=3)
           .to_pandas().sort_values(["k", "v", "id"]).reset_index(drop=True))
    exp = duckdb.sql(
        """SELECT k, v, id,
                  row_number() OVER (PARTITION BY k ORDER BY v, id) rn,
                  dense_rank() OVER (PARTITION BY k ORDER BY v) dr,
                  ntile(3) OVER (PARTITION BY k ORDER BY v, id) nt
           FROM t ORDER BY k, v, id"""
    ).df()
    for c in ("rn", "dr", "nt"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_window_nav_matches_duckdb():
    """lag/lead/first/last/percent_rank vs DuckDB, including a singleton
    group (pr=0, lag/lead NULL) and nulls in the value column (gathers
    must preserve them)."""
    from airbyte_ray.functions.agg import window_nav

    t = pa.table({"k": ["a"] * 4 + ["b"] * 1 + ["c"] * 3,
                  "o": [1, 2, 3, 4, 1, 1, 2, 3],
                  "v": [10, None, 30, 40, 7, 1, 2, 3]})
    got = (window_nav(ray.data.from_arrow(t).repartition(3), "k", "o", "v")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    exp = duckdb.sql(
        """SELECT k, o, v,
                  lag(v) OVER w AS lag_val,
                  lead(v) OVER w AS lead_val,
                  first_value(v) OVER w AS first_val,
                  last_value(v) OVER (PARTITION BY k ORDER BY o
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
                  percent_rank() OVER w AS pr
           FROM t WINDOW w AS (PARTITION BY k ORDER BY o) ORDER BY k, o"""
    ).df()
    import numpy as np
    for c in ("lag_val", "lead_val", "first_val", "last_val", "pr"):
        g, e = got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float)
        assert ((g == e) | (np.isnan(g) & np.isnan(e))).all(), c


def test_cube_agg_matches_duckdb():
    """All 2^n grouping sets (incl. the non-prefix marginal ROLLUP lacks)
    with SQL GROUPING() bit semantics."""
    from airbyte_ray.functions.agg import cube_agg

    t = pa.table({"x": ["p", "p", "q", "q", "q"],
                  "y": ["u", "v", "u", "u", "v"],
                  "v": [1, 2, 3, 4, 5]})
    got = (cube_agg(ray.data.from_arrow(t).repartition(2), ["x", "y"], "v")
           .to_pandas().sort_values(["gid", "x", "y"]).reset_index(drop=True))
    exp = duckdb.sql(
        """SELECT x, y, CAST(GROUPING(x, y) AS BIGINT) gid,
                  SUM(v) sum_val, COUNT(*) n
           FROM t GROUP BY CUBE(x, y) ORDER BY gid, x, y"""
    ).df()
    assert len(got) == len(exp) == 9  # 4 pairs + 2 x-marginals + 2 y-marginals + grand
    assert got.gid.tolist() == exp.gid.tolist()
    assert got.sum_val.astype(float).tolist() == exp.sum_val.astype(float).tolist()
    assert got.n.tolist() == exp.n.tolist()


def test_grouped_stats_exact_moments_and_null_contract():
    """Moments match DuckDB bit-for-bit (the IEEE-pinned derivation);
    n==1 keys get NULL var/std; all-null keys are omitted; a float
    column raises (exactness requires integers)."""
    from airbyte_ray.functions.agg import grouped_stats

    t = pa.table({"k": ["a"] * 5 + ["b"] + ["c"] * 3 + ["d"] * 2,
                  "v": [3, 7, 7, 1, 9, 42, None, 5, 11, None, None]})
    got = (grouped_stats(ray.data.from_arrow(t).repartition(3), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql(
        """WITH c AS (SELECT k, v FROM t WHERE v IS NOT NULL),
           m AS (SELECT k, COUNT(*) n, CAST(SUM(v) AS BIGINT) s,
                        CAST(SUM(v*v) AS BIGINT) ssq FROM c GROUP BY k)
           SELECT k, n, s, ssq, CAST(s AS DOUBLE)/CAST(n AS DOUBLE) mean,
             CASE WHEN n > 1 THEN GREATEST((CAST(ssq AS DOUBLE)
               - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE)-1), 0) END var_samp
           FROM m ORDER BY k"""
    ).df()
    assert got.k.tolist() == ["a", "b", "c"]  # 'd' is all-null → omitted
    assert got.n.tolist() == exp.n.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got["mean"].tolist() == exp["mean"].tolist()  # bit-exact
    import numpy as np
    g, e = got.var_samp.to_numpy(float), exp.var_samp.to_numpy(float)
    assert ((g == e) | (np.isnan(g) & np.isnan(e))).all()
    import pytest as _pytest

    with _pytest.raises(Exception):
        grouped_stats(ray.data.from_arrow(
            pa.table({"k": ["a"], "v": [1.5]})), "k", "v").materialize()


def test_profile_table_counts_and_minmax():
    from airbyte_ray.functions.profile import profile_table

    t = pa.table({"a": [1, 2, 2, None, 10, 9],
                  "s": ["x", None, "x", "aa", "zz", "m"]})
    got = (profile_table(ray.data.from_arrow(t).repartition(3), ["a", "s"])
           .to_pandas().set_index("col_name"))
    assert got.loc["a"].n == 6 and got.loc["a"].n_null == 1
    assert got.loc["a"].n_distinct == 4  # {1,2,9,10}, null excluded
    # min/max fold in NATIVE type: "10" would sort before "9" as a string
    assert got.loc["a"].min_s == "1" and got.loc["a"].max_s == "10"
    assert got.loc["s"].n_distinct == 4 and got.loc["s"].min_s == "aa"
    assert got.loc["s"].max_s == "zz"


def test_grouped_corr_and_histogram():
    """corr matches a hand-derived value (perfect ±1 and mixed cases,
    NULL-pair exclusion, constant series → NULL); histogram bins match
    DuckDB with range-edge values."""
    import numpy as np

    from airbyte_ray.functions.agg import grouped_corr, histogram

    t = pa.table({
        "k": ["up"] * 4 + ["down"] * 3 + ["flat"] * 3 + ["nul"] * 3,
        "x": [1, 2, 3, 4,   1, 2, 3,   5, 6, 7,    1, None, 3],
        "y": [2, 4, 6, 8,   9, 6, 3,   4, 4, 4,    7, 9, None],
    })
    got = (grouped_corr(ray.data.from_arrow(t).repartition(3), "k", "x", "y")
           .to_pandas().set_index("k"))
    assert abs(got.loc["up"]["corr"] - 1.0) < 1e-12
    assert abs(got.loc["down"]["corr"] + 1.0) < 1e-12
    assert np.isnan(got.loc["flat"]["corr"])  # zero variance → NULL
    assert got.loc["nul"].n == 1 and np.isnan(got.loc["nul"]["corr"])

    h = pa.table({"v": [0.0, 24.999, 25.0, 499.999, 500.0, -0.1, None, 30.0]})
    out = (histogram(ray.data.from_arrow(h).repartition(2), "v", 0.0, 500.0, 20)
           .to_pandas().set_index("bin").sort_index())
    assert out.loc[0].n == 2      # 0.0, 24.999
    assert out.loc[1].n == 2      # 25.0, 30.0
    assert out.loc[19].n == 1     # 499.999; 500.0/-0.1/None dropped
    assert out.n.sum() == 5


def test_grouped_quantiles_linear_matches_duckdb():
    """quantile_cont parity at binary-fraction q on an int grid (uneven
    group sizes, singleton group)."""
    from airbyte_ray.functions.agg import grouped_quantiles

    t = pa.table({"k": ["a"] * 5 + ["b"] * 2 + ["c"],
                  "v": [10, 30, 20, 50, 40, 7, 9, 100]})
    got = (grouped_quantiles(ray.data.from_arrow(t).repartition(3), "k", "v",
                             [0.25, 0.5, 0.75], interpolation="linear")
           .to_pandas().sort_values(["k", "q"]).reset_index(drop=True))
    exp = duckdb.sql(
        """SELECT * FROM (
             SELECT k, 0.25 AS q, quantile_cont(v, 0.25) AS value FROM t GROUP BY k
             UNION ALL
             SELECT k, 0.5, quantile_cont(v, 0.5) FROM t GROUP BY k
             UNION ALL
             SELECT k, 0.75, quantile_cont(v, 0.75) FROM t GROUP BY k
           ) ORDER BY k, q"""
    ).df()
    assert got.value.tolist() == exp.value.tolist()  # bit-exact
