"""Nested child-stream normalization, SubstreamPartitionRouter,
datetime-cursor windows/lookback, and GLOBAL shared-offset catalog sync."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from airbyte_ray import gen
from airbyte_ray.oracle import replay_oracle
from airbyte_ray.stages.nested import normalize_nested


# -- nested normalization ---------------------------------------------------

def test_normalize_nested_structs_and_lists():
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "meta": pa.array(
                [{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": "y"}}],
                pa.struct([("a", pa.int64()), ("b", pa.struct([("c", pa.string())]))]),
            ),
            "tags": pa.array([["t1", "t2"], []], pa.list_(pa.string())),
            "items": pa.array(
                [[{"k": 1, "v": 1.5}], [{"k": 2, "v": 2.5}, {"k": 3, "v": 3.5}]],
                pa.list_(pa.struct([("k", pa.int64()), ("v", pa.float64())])),
            ),
        }
    )
    streams = normalize_nested(ray.data.from_arrow(t), "s", key_cols=["id"])
    assert set(streams) == {"s", "s_tags", "s_items"}

    parent = pa.Table.from_pylist(streams["s"].take_all())
    assert set(parent.schema.names) == {"id", "meta_a", "meta_b_c", "_airbyte_s_hashid"}
    assert parent["meta_b_c"].to_pylist() == ["x", "y"]

    tags = pa.Table.from_pylist(streams["s_tags"].take_all())
    assert tags["value"].to_pylist() == ["t1", "t2"]
    assert tags["_airbyte_index"].to_pylist() == [0, 1]

    items = pa.Table.from_pylist(streams["s_items"].take_all())
    assert sorted(items["k"].to_pylist()) == [1, 2, 3]
    # FK chains child rows to the parent hashid
    fk = set(items["_airbyte_s_hashid"].to_pylist())
    assert fk <= set(parent["_airbyte_s_hashid"].to_pylist())


# -- substream partition router --------------------------------------------

def test_substream_router_derives_slices(tmp_path):
    from airbyte_ray.sources.paginated import read_paginated, substream_slices

    parent = pa.table({"pid": pa.array(["p1", "p2", "p1"], pa.string())})
    pp = tmp_path / "parent.parquet"
    pq.write_table(parent, pp)
    slices = substream_slices(str(pp), "pid", slice_field="parent")
    assert slices == [{"parent": "p1"}, {"parent": "p2"}]

    # end-to-end: parent_stream in the spec drives the page fan-out
    for p in ("p1", "p2"):
        os.makedirs(tmp_path / "api" / p, exist_ok=True)
        with open(tmp_path / "api" / p / "page-0.json", "w") as f:
            json.dump({"data": [{"id": 1, "who": p}]}, f)
    spec = {
        "api_dir": str(tmp_path / "api"),
        "path_template": "{parent}/page-{page}.json",
        "paginator": "page",
        "paginator_args": {"page_size": 10},
        "record_path": "data",
        "parent_stream": {"path": str(pp), "key": "pid", "field": "parent"},
    }
    rows = read_paginated(spec).take_all()
    assert {(r["parent"], r["who"]) for r in rows} == {("p1", "p1"), ("p2", "p2")}


# -- datetime cursor windows + lookback ------------------------------------

def test_windowed_incremental_with_lookback(tmp_path):
    from airbyte_ray.config import StreamConfig
    from airbyte_ray.pipelines.incremental import SyncEngine

    n = 1000
    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "pk": pa.array(np.arange(n), pa.int64()),
            "cur": pa.array(np.arange(n, dtype=np.float64)),  # numeric cursor
            "val": pa.array(rng.integers(0, 100, n)),
        }
    )
    p1, p2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pq.write_table(t.slice(0, 600), p1)
    pq.write_table(t, p2)  # second sync source includes everything

    eng = SyncEngine(str(tmp_path / "dest"))
    cfg = StreamConfig(
        "s", "incremental", "append_dedup", cursor_field="cur", primary_key=["pk"],
        num_partitions=4, slice_window_s=100.0, lookback_s=50.0,
    )
    windows = eng.stream_slices(cfg, str(p1), {"cursor": None})
    # first sync: windows tile (min-step, max] with no gaps
    bounds = [(lo.as_py(), hi.as_py()) for lo, hi in windows]
    assert bounds[0][0] < 0 and bounds[-1][1] == 599.0
    for (_, h1), (l2, _) in zip(bounds, bounds[1:]):
        assert h1 == l2

    s1 = eng.sync(cfg, str(p1))
    assert s1["rows"] == 600 and s1["cursor"] == 599.0
    # second sync re-reads the lookback region (cur > 549) + new rows
    w2 = eng.stream_slices(cfg, str(p2), {"cursor": 599.0})
    assert w2[0][0].as_py() == 549.0  # lowered by lookback
    s2 = eng.sync(cfg, str(p2))
    assert s2["rows"] == n and s2["cursor"] == float(n - 1)
    got = pa.Table.from_pylist(eng.read("s", dedup=True).take_all())
    assert got.num_rows == n  # dedup made the lookback re-read idempotent


# -- GLOBAL shared-offset catalog ------------------------------------------

def test_shared_wal_global_state(tmp_path):
    from airbyte_ray.pipelines.catalog_sync import CdcCatalogEngine, CdcStreamConfig
    from airbyte_ray.pipelines.replay import ReplayConfig

    ev_a = gen.gen_events(400, 80, seed=21)
    ev_b = gen.gen_events(300, 60, seed=22, start_lsn=gen.next_lsn(ev_a))
    log = pa.concat_tables(
        [
            ev_a.append_column("stream", pa.array(["a"] * ev_a.num_rows)),
            ev_b.append_column("stream", pa.array(["b"] * ev_b.num_rows)),
        ]
    )
    lp = tmp_path / "wal.parquet"
    pq.write_table(log, lp)

    cfgs = [
        CdcStreamConfig("a", str(lp), replay=ReplayConfig(num_partitions=4)),
        CdcStreamConfig("b", str(lp), replay=ReplayConfig(num_partitions=4)),
    ]
    eng = CdcCatalogEngine(str(tmp_path / "root"), cfgs)
    out = eng.sync_shared(str(lp))
    assert out["applied_events"] > 0
    assert eng.load_global()["watermark"] == out["watermark"]

    for name, ev in (("a", ev_a), ("b", ev_b)):
        got = eng.lake(name).to_table()
        assert got.equals(replay_oracle(None, [ev]))

    # redelivery: shared offset short-circuits the whole catalog
    again = eng.sync_shared(str(lp))
    assert again["applied_events"] == 0

    # crash-resume: wipe the global offset (commit never landed) — per-lake
    # watermarks make the rerun a no-op per stream, then the offset commits
    os.remove(eng._global_state_path())
    resumed = eng.sync_shared(str(lp))
    assert resumed["applied_events"] == 0
    assert eng.load_global()["watermark"] == out["watermark"]
