"""SCD2 history-table semantics vs a DuckDB window-function oracle.

Mirrors the reference's SCD model (``stream_processor.py:742-1011``):
history carries every version with start/end validity and an active flag;
the active slice equals the final dedup table (minus tombstones).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from airbyte_ray.pipelines.scd import ACTIVE_ROW, END_AT, START_AT, scd2_history

EVENTS = "/root/testdata/sf0.001/events.parquet"

ORACLE = """
SELECT user_id, event_id,
       event_id AS _airbyte_start_at,
       lead(event_id) OVER w AS _airbyte_end_at,
       CAST(CASE WHEN lead(event_id) OVER w IS NULL AND event_type <> 'error'
                 THEN 1 ELSE 0 END AS INTEGER) AS _airbyte_active_row
FROM read_parquet('{path}')
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
ORDER BY user_id, event_id
"""


def _history(path: str) -> pa.Table:
    ds = ray.data.read_parquet(path, columns=["user_id", "event_id", "event_type"])
    hist = scd2_history(
        ds, key="user_id", cursor="event_id",
        deleted_mask=lambda t: pc.equal(t["event_type"], "error"),
        num_partitions=8,
    )
    import ray as _ray

    refs = hist.map_batches(
        lambda t: t.select(["user_id", "event_id", START_AT, END_AT, ACTIVE_ROW]),
        batch_format="pyarrow",
    ).to_arrow_refs()
    out = pa.concat_tables([_ray.get(r) for r in refs], promote_options="default")
    return out.take(
        pc.sort_indices(out, sort_keys=[("user_id", "ascending"), ("event_id", "ascending")])
    )


def test_scd2_matches_window_oracle():
    got = _history(EVENTS)
    exp = duckdb.connect().execute(ORACLE.format(path=EVENTS)).arrow()
    exp = exp.cast(got.schema)
    assert got.equals(exp), f"{got.slice(0, 5)}\n!=\n{exp.slice(0, 5)}"


def test_scd2_active_slice_is_final_table():
    got = _history(EVENTS)
    active = got.filter(pc.equal(got[ACTIVE_ROW], 1))
    exp = duckdb.connect().execute(f"""
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM read_parquet('{EVENTS}')) WHERE rn = 1 AND event_type <> 'error'
        ORDER BY user_id
    """).arrow()
    assert active.select(["user_id", "event_id"]).equals(
        exp.cast(active.select(["user_id", "event_id"]).schema)
    )


def test_scd2_incremental_from_append_syncs(tmp_path):
    """The incremental workflow: two append-mode syncs, history built from
    the committed raw table equals history over the full input."""
    import os

    from airbyte_ray.config import StreamConfig
    from airbyte_ray.pipelines.incremental import SyncEngine

    full = pq.read_table(EVENTS, columns=["user_id", "event_id", "event_type", "ts"])
    full = full.take(pc.sort_indices(full, sort_keys=[("event_id", "ascending")]))
    cut = full.num_rows // 2
    p1, p2 = tmp_path / "e1.parquet", tmp_path / "e2.parquet"
    pq.write_table(full.slice(0, cut), p1)
    pq.write_table(full.slice(cut), p2)

    eng = SyncEngine(str(tmp_path / "dest"))
    cfg = StreamConfig("events", "incremental", "append", cursor_field="event_id")
    eng.sync(cfg, str(p1))
    eng.sync(cfg, [str(p1), str(p2)])  # second sync reads only cursor > state

    hist = scd2_history(
        eng.read("events"), key="user_id", cursor="event_id",
        deleted_mask=lambda t: pc.equal(t["event_type"], "error"), num_partitions=4,
    )
    got = pa.Table.from_pylist(
        hist.map_batches(
            lambda t: t.select(["user_id", "event_id", END_AT, ACTIVE_ROW]),
            batch_format="pyarrow",
        ).take_all()
    )
    got = got.take(pc.sort_indices(got, sort_keys=[("user_id", "ascending"), ("event_id", "ascending")]))

    direct = scd2_history(
        ray.data.read_parquet(EVENTS, columns=["user_id", "event_id", "event_type"]),
        key="user_id", cursor="event_id",
        deleted_mask=lambda t: pc.equal(t["event_type"], "error"), num_partitions=4,
    )
    exp = pa.Table.from_pylist(
        direct.map_batches(
            lambda t: t.select(["user_id", "event_id", END_AT, ACTIVE_ROW]),
            batch_format="pyarrow",
        ).take_all()
    )
    exp = exp.take(pc.sort_indices(exp, sort_keys=[("user_id", "ascending"), ("event_id", "ascending")]))
    assert got.equals(exp)
