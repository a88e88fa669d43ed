"""File source (mtime cursor) + declarative pipeline builder."""

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from airbyte_ray.declarative import build_pipeline, register_component, run_pipeline
from airbyte_ray.sources.file_source import list_files, read_files_incremental

SF = "/root/testdata/sf0.001"


def test_file_source_incremental(tmp_path):
    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pq.write_table(pa.table({"x": [1, 2]}), a)
    pq.write_table(pa.table({"x": [3]}), b)
    os.utime(a, (1000, 1000))
    os.utime(b, (2000, 2000))

    ds, cur = read_files_incremental(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 3 and cur == 2000
    assert {r["_ab_source_file"].split("/")[-1] for r in rows} == {"a.parquet", "b.parquet"}

    # second sync from committed cursor: the boundary file (mtime == cursor)
    # is RE-READ (>= semantics, the same-mtime-tick race guard — reference
    # IncrementalFileStream behavior); at-least-once, dedup absorbs it
    ds2, cur2 = read_files_incremental(str(tmp_path), cursor=cur)
    assert cur2 == cur
    assert {r["_ab_source_file"].split("/")[-1] for r in ds2.take_all()} == {"b.parquet"}

    # strict mode restores exclusive-cursor semantics: nothing new
    from airbyte_ray.sources.file_source import list_files as _lf

    assert _lf(str(tmp_path), min_mtime=cur, strict=True) == []

    # a new file appears → only it is read
    c = tmp_path / "c.parquet"
    pq.write_table(pa.table({"x": [9]}), c)
    os.utime(c, (3000, 3000))
    ds3, cur3 = read_files_incremental(str(tmp_path), cursor=cur)
    rows3 = ds3.take_all()
    # boundary file (mtime == cursor) re-read + the genuinely new file
    assert sorted(r["x"] for r in rows3) == [3, 9] and cur3 == 3000
    assert list_files(str(tmp_path), min_mtime=2999)[0].path.endswith("c.parquet")


def test_declarative_pipeline(tmp_path):
    spec = {
        "source": {
            "format": "parquet",
            "path": f"{SF}/events.parquet",
            "columns": ["event_id", "value", "props"],
        },
        "transforms": [
            {"type": "flatten_json", "column": "props"},
            {"type": "record_filter", "expr": "value > 0"},
            {"type": "add_fields", "fields": {"v2": "value * 2"}},
            {"type": "remove_fields", "names": ["value"]},
            {"type": "hash_id", "cols": ["event_id"]},
        ],
        "sink": {"format": "parquet", "path": str(tmp_path / "out")},
    }
    out = run_pipeline(spec)
    assert out["written"]
    t = pq.read_table(str(tmp_path / "out"))
    assert set(t.schema.names) == {"event_id", "k", "v2", "_airbyte_hashid"}
    assert t.num_rows > 0


def test_declarative_custom_component():
    @register_component("double_col")
    def _double(cfg):
        col = cfg["column"]

        def fn(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index(col), col, pc.multiply(t[col], 2)
            )

        return fn

    spec = {
        "source": {"format": "parquet", "path": f"{SF}/region.parquet"},
        "transforms": [{"type": "double_col", "column": "r_regionkey"}],
    }
    ds = build_pipeline(spec)
    assert sorted(r["r_regionkey"] for r in ds.take_all()) == [0, 2, 4, 6, 8]


def test_interpolation_macros_and_config():
    """InterpolatedString analog (macros.py:18-131): {{ }} placeholders over
    config + the macro library, AST-whitelisted — no Jinja, no eval."""
    import datetime as dt

    from airbyte_ray.declarative import interpolate, interpolate_spec

    now = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    ctx = {"config": {"start_date": "2024-01-02", "base": "api"},
           "stream_state": {"cursor": 41}}

    assert interpolate("{{ config.start_date }}", ctx) == "2024-01-02"
    assert interpolate("{{ stream_state.cursor + 1 }}", ctx) == 42
    assert interpolate("{{ config['base'] }}/v1", ctx) == "api/v1"
    assert interpolate("{{ now_utc() }}", ctx, now=now) == now
    assert interpolate("{{ timestamp('1970-01-01T00:01:00+00:00') }}", ctx) == 60.0
    assert interpolate("{{ day_delta(1) }}", ctx, now=now).startswith("2026-03-02T12:00:00")
    assert interpolate("{{ duration('P1DT2H') }}", ctx) == dt.timedelta(days=1, hours=2)
    assert interpolate(
        "{{ format_datetime(config.start_date, '%Y/%m/%d') }}", ctx) == "2024/01/02"
    assert interpolate("{{ max(3, stream_state.cursor) }}", ctx) == 41

    # spec-tree walk leaves per-batch exprs alone
    spec = {"source": {"path": "{{ config.base }}/x.parquet"},
            "transforms": [{"type": "record_filter", "expr": "value > 0"}]}
    out = interpolate_spec(spec, ctx)
    assert out["source"]["path"] == "api/x.parquet"
    assert out["transforms"][0]["expr"] == "value > 0"

    # code execution stays impossible
    import pytest as _pytest
    with _pytest.raises(ValueError):
        interpolate("{{ __import__('os') }}", ctx)
    with _pytest.raises(ValueError):
        interpolate("{{ config.__class__ }}", ctx)


def test_declarative_incremental_sync(tmp_path):
    """One spec = source + transforms + cursor state + append_dedup dest;
    the second run reads only cursor > state and the committed view matches
    latest-per-PK SQL over the full input."""
    import duckdb

    from airbyte_ray.declarative import run_sync
    from airbyte_ray.pipelines.incremental import SyncEngine

    full = pq.read_table("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    full = full.sort_by("event_id")
    cut = full.num_rows // 2
    src = tmp_path / "src.parquet"
    pq.write_table(full.slice(0, cut), src)

    spec = {
        "config": {"dest": str(tmp_path / "dest")},
        "source": {"format": "parquet", "path": str(src)},
        "transforms": [{"type": "add_fields", "fields": {"v2": "value * 2"}}],
        "incremental": {"cursor_field": "event_id"},
        "sink": {"path": "{{ config.dest }}", "stream": "events",
                 "mode": "append_dedup", "primary_key": ["user_id"],
                 "num_partitions": 4},
    }
    s1 = run_sync(spec)
    assert s1["cursor"] == full["event_id"][cut - 1].as_py()

    pq.write_table(full, src)  # more data arrives
    s2 = run_sync(spec)
    assert s2["cursor"] == full["event_id"][-1].as_py()

    eng = SyncEngine(str(tmp_path / "dest"))
    got = pa.Table.from_pylist(eng.read("events", dedup=True).take_all())
    got = got.select(["user_id", "event_id", "v2"]).sort_by("user_id")
    exp = duckdb.connect().execute("""
        SELECT user_id, event_id, value * 2 AS v2 FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM read_parquet('{}')) WHERE rn = 1 ORDER BY user_id
    """.format(src)).arrow()
    assert got.equals(exp.cast(got.schema))
