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

    # second sync from committed cursor: nothing new
    ds2, cur2 = read_files_incremental(str(tmp_path), cursor=cur)
    assert ds2 is None and cur2 == cur

    # a new file appears → only it is read
    c = tmp_path / "c.parquet"
    pq.write_table(pa.table({"x": [9]}), c)
    os.utime(c, (3000, 3000))
    ds3, cur3 = read_files_incremental(str(tmp_path), cursor=cur)
    rows3 = ds3.take_all()
    assert [r["x"] for r in rows3] == [9] and cur3 == 3000
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
