"""Count-min / heavy-hitters and HyperLogLog sketches."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from airbyte_ray.functions.sketch import (
    CountMinSketch,
    HyperLogLog,
    approx_distinct,
    build_cms,
    heavy_hitters,
)


def _zipf_table(n=20000, n_keys=500, seed=7):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    w = ranks ** -1.3
    w /= w.sum()
    keys = rng.choice(n_keys, n, p=w)
    return pa.table({"k": pa.array([f"key-{i}" for i in keys])})


def test_cms_never_underestimates_and_merges():
    t = _zipf_table()
    keys = np.asarray(t["k"].to_pylist(), object)
    import collections
    true = collections.Counter(keys)
    s1, s2 = CountMinSketch(4, 1 << 12), CountMinSketch(4, 1 << 12)
    s1.update(keys[:10000])
    s2.update(keys[10000:])
    merged = s1.merge(s2)
    uniq = np.asarray(sorted(true), object)
    est = merged.query(uniq)
    exact = np.array([true[k] for k in uniq])
    assert (est >= exact).all()                      # CMS only overestimates
    assert (est[exact >= 100] <= exact[exact >= 100] * 1.5).all()  # tight on HH


def test_heavy_hitters_exact_vs_duckdb():
    t = _zipf_table()
    ds = ray.data.from_arrow(t).repartition(8)
    got = (
        heavy_hitters(ds, "k", min_count=150)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT k, count(*) AS n FROM t GROUP BY k HAVING count(*) >= 150 ORDER BY k"
    ).df()
    assert list(got["k"]) == list(exp["k"])
    assert list(got["n"]) == list(exp["n"])
    assert len(exp) > 3  # fixture actually has heavy hitters


def test_hll_error_bounds_and_merge():
    rng = np.random.default_rng(11)
    a = np.array([f"u{i}" for i in range(60000)], object)
    h = HyperLogLog(12)
    h.update(a)
    est = h.estimate()
    assert abs(est - 60000) / 60000 < 0.05  # 3σ ≈ 4.9% at p=12
    # merge of overlapping halves estimates the union, not the sum
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.update(a[:40000])
    h2.update(a[20000:])
    est_u = h1.merge(h2).estimate()
    assert abs(est_u - 60000) / 60000 < 0.05


def test_approx_distinct_distributed():
    t = pa.table({"k": pa.array([f"u{i % 5000}" for i in range(40000)])})
    ds = ray.data.from_arrow(t).repartition(16)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 5000) / 5000 < 0.05


def test_exact_quantiles_matches_quantile_disc():
    from airbyte_ray.functions.sketch import exact_quantiles

    rng = np.random.default_rng(5)
    # 997 DISTINCT values and a prime n: ties or n%20==0 would mask a
    # wrong rank formula (review finding: floor((n-1)q) passed by luck)
    vals = rng.permutation(997).astype(np.float64)
    t = pa.table({"v": pa.array(vals)})
    qs = [0.0, 0.1, 0.33, 0.5, 0.9, 1.0]
    got = exact_quantiles(ray.data.from_arrow(t).repartition(7), "v", qs)
    con = duckdb.connect()
    con.register("t", t)
    for q, v in zip(got["q"].to_pylist(), got["value"].to_pylist()):
        exp = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert v == exp, (q, v, exp)


def test_exact_quantiles_nulls_and_empty():
    from airbyte_ray.functions.sketch import exact_quantiles

    t = pa.table({"v": pa.array([None, 3.0, None, 1.0, 2.0])})
    got = exact_quantiles(ray.data.from_arrow(t), "v", [0.5])
    assert got["value"].to_pylist() == [2.0]
    # empty input matches the SQL shape: one row per q, value NULL
    empty = pa.table({"v": pa.array([], pa.float64())})
    e = exact_quantiles(ray.data.from_arrow(empty), "v", [0.5])
    assert e["q"].to_pylist() == [0.5] and e["value"].to_pylist() == [None]


def test_two_hashes_distinct_for_numeric_keys():
    """Review finding: pd.util.hash_array ignores hash_key for numeric
    dtypes, so a keyed second SipHash silently collapsed double hashing
    for int64 key columns (the driver's user_id/c_custkey).  The
    splitmix64-derived stream must differ for every dtype."""
    from airbyte_ray.functions.sketch import _two_hashes

    for arr in (np.arange(1000, dtype=np.int64),
                np.array([f"k{i}" for i in range(1000)], object)):
        h1, h2 = _two_hashes(arr)
        assert (h1 != h2).all()
        # and h2 must not be a trivial shift of h1 across elements
        assert len(np.unique(h2)) == len(h2)


def test_percentile_filter_matches_subquery():
    from airbyte_ray.functions.sketch import percentile_filter

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1000, 500)
    t = pa.table({"id": pa.array(range(500)), "v": pa.array(vals)})
    got = (
        percentile_filter(ray.data.from_arrow(t).repartition(5), "v", 0.25)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT id, v FROM t WHERE v >= (SELECT quantile_disc(v, 0.25) FROM t) ORDER BY id"
    ).df()
    assert list(got["id"]) == list(exp["id"])


def test_percentile_filter_all_null_keeps_nothing():
    from airbyte_ray.functions.sketch import percentile_filter

    t = pa.table({"id": pa.array(range(10)), "v": pa.array([None] * 10, pa.float64())})
    got = percentile_filter(ray.data.from_arrow(t), "v", 0.5)
    assert got.count() == 0  # col >= NULL is false for every row
    import pytest as _pytest
    with _pytest.raises(ValueError):
        percentile_filter(ray.data.from_arrow(t), "v", 1.5)
