"""Hot-key skew (north-rule salting evidence) + retried-task idempotence."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from airbyte_ray import gen
from airbyte_ray.oracle import replay_oracle
from airbyte_ray.pipelines.replay import (
    LakeTable,
    ReplayConfig,
    _merge_partition,
    _pre_reduce,
    lww_reduce,
)


def test_extreme_hot_key_all_paths(tmp_path):
    """One key receives ~half of all updates (zipf α=2.2).  All three
    exchange paths must agree with the oracle; the per-batch combiner
    bounds the hot key's shuffle contribution to one row per block."""
    base = gen.gen_base(100, seed=61)
    ev = gen.gen_events(3000, 100, seed=62, zipf_alpha=2.2, update_ratio=0.8,
                        delete_ratio=0.02)
    p = tmp_path / "hot.parquet"
    pq.write_table(ev, p)
    expected = replay_oracle(base, [ev])

    for name, cfg in (
        ("salted", ReplayConfig(num_partitions=4, salt_factor=4)),
        ("plain", ReplayConfig(num_partitions=4, salt_factor=1)),
        ("actors", ReplayConfig(num_partitions=4, exchange="actors", num_appliers=2)),
    ):
        lake = LakeTable(str(tmp_path / f"lake_{name}"), cfg)
        lake.init_snapshot(ray.data.from_arrow(base))
        lake.apply_log(str(p))
        assert lake.to_table().equals(expected), name

    # combiner property: within any batch, the hot key collapses to 1 row
    pre = _pre_reduce(ev, num_partitions=4, salt_factor=1)
    ids = pre["doc_id"].to_pylist()
    assert len(ids) == len(set(ids))


def test_merge_task_idempotent_under_retry(tmp_path):
    """A retried merge task (same inputs, same ctx) must write identical
    segment bytes and identical lineage — the exactly-once guarantee under
    Ray task retries (deterministic segment paths, SURVEY hard-part #1)."""
    base = gen.gen_base(50, seed=71)
    ev = gen.gen_events(300, 50, seed=72)
    t = ev.append_column("n_src", pa.array(np.ones(ev.num_rows, np.int64)))
    t = lww_reduce(t)
    t = t.append_column("part", pa.array(np.zeros(t.num_rows, np.int64)))

    from airbyte_ray.schemas import BASE_SCHEMA

    ctx = {
        "lake_dir": str(tmp_path / "lake"),
        "schema": BASE_SCHEMA.serialize().to_pybytes(),
        "old_segments": {},
        "run_lsn_hi": 1,
    }
    lin1 = _merge_partition(t, ctx).to_pylist()
    seg = tmp_path / "lake" / lin1[0]["path"]
    bytes1 = seg.read_bytes()
    lin2 = _merge_partition(t, ctx).to_pylist()  # the "retry"
    assert lin1 == lin2
    assert seg.read_bytes() == bytes1
