"""Bloom filter membership + exact bloom anti-join."""

import numpy as np
import pyarrow as pa
import ray.data

from airbyte_ray.functions.bloom import BloomFilter, bloom_anti_join, build_bloom


def test_bloom_no_false_negatives_and_low_fp():
    b = BloomFilter.sized(10000, 0.01)
    members = np.array([f"k{i}" for i in range(10000)], object)
    b.add(members)
    assert b.contains(members).all()  # never a false negative
    others = np.array([f"x{i}" for i in range(20000)], object)
    fp = b.contains(others).mean()
    assert fp < 0.03  # ~1% target


def test_build_bloom_distributed_matches_local():
    t = pa.table({"k": pa.array([f"k{i}" for i in range(5000)])})
    ds = ray.data.from_arrow(t).repartition(8)
    b = build_bloom(ds, "k", est_keys=5000)
    local = BloomFilter(b.n_bits, b.k)
    local.add(np.array([f"k{i}" for i in range(5000)], object))
    assert np.array_equal(b.bits, local.bits)  # OR-fold == single pass


def test_bloom_anti_join_exact_vs_setminus():
    big = pa.table({
        "id": pa.array(list(range(3000))),
        "v": pa.array([f"v{i}" for i in range(3000)]),
    })
    keys = pa.table({"id": pa.array(list(range(0, 3000, 4)))})  # every 4th
    got = bloom_anti_join(
        ray.data.from_arrow(big).repartition(6),
        ray.data.from_arrow(keys).repartition(3),
        on="id", est_keys=1000, fp_rate=0.05,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    expect = [i for i in range(3000) if i % 4 != 0]
    assert list(got["id"]) == expect
    assert list(got["v"]) == [f"v{i}" for i in expect]  # payload survives
