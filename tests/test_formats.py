"""Pure-Python Avro object-container codec (airbyte_ray.formats).

Round-trip contract for the Avro destination format without fastavro —
AvroSerializedBuffer.java parity at the file-format level (public Avro
1.x spec)."""
import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from airbyte_ray.formats import (
    _read_zigzag,
    _zigzag,
    arrow_to_avro_schema,
    read_avro_file,
    write_avro_file,
)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip_int64(n):
    import io

    assert _read_zigzag(io.BytesIO(_zigzag(n))) == n


def test_roundtrip_all_types(tmp_path):
    t = pa.table({
        "i": pa.array([1, None, -(2**62), 2**62], pa.int64()),
        "f": pa.array([1.5, None, -0.0, 1e300], pa.float64()),
        "s": pa.array(["a", "üñï©ödé", None, ""], pa.string()),
        "b": pa.array([True, False, None, True], pa.bool_()),
        "raw": pa.array([b"\x00\xff", None, b"", b"xyz"], pa.binary()),
        "ts": pa.array([datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
                        None,
                        datetime.datetime(1969, 12, 31, 23, 59, 59),
                        datetime.datetime(2200, 6, 1)], pa.timestamp("us")),
        "d": pa.array([datetime.date(2024, 2, 29), None,
                       datetime.date(1969, 1, 1), datetime.date(2100, 1, 1)],
                      pa.date32()),
    })
    p = str(tmp_path / "t.avro")
    write_avro_file(t, p)
    back = read_avro_file(p)
    assert back.equals(t)


def test_roundtrip_multiblock_and_ns_timestamps(tmp_path):
    n = 10_000
    t = pa.table({
        "i": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_000 + i for i in range(n)],
                       pa.int64()).cast(pa.timestamp("ns")),
    })
    p = str(tmp_path / "t.avro")
    write_avro_file(t, p, block_rows=1024)  # forces 10 container blocks
    back = read_avro_file(p)
    assert back.num_rows == n
    # ns input lands as timestamp-micros (Avro logical type)
    assert back.schema.field("ts").type == pa.timestamp("us")
    assert back.column("ts").cast(pa.int64()).to_pylist() == \
        t.column("ts").cast(pa.timestamp("us"), safe=False).cast(pa.int64()).to_pylist()


def test_roundtrip_empty(tmp_path):
    t = pa.table({"x": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
    p = str(tmp_path / "e.avro")
    write_avro_file(t, p)
    back = read_avro_file(p)
    assert back.num_rows == 0
    assert back.schema.names == ["x", "s"]


def test_corrupt_sync_marker_detected(tmp_path):
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "c.avro")
    write_avro_file(t, p)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip last sync byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_file(p)


def test_schema_mapping_nullable_unions():
    sch = arrow_to_avro_schema(pa.schema([
        ("a", pa.int32()), ("b", pa.float32()), ("c", pa.string()),
    ]))
    for f in sch["fields"]:
        assert f["type"][0] == "null"
    assert sch["fields"][0]["type"][1] == "long"
    assert sch["fields"][1]["type"][1] == "double"
    assert sch["fields"][2]["type"][1] == "string"


def test_sync_engine_avro_end_to_end(tmp_path, ray_session):
    """Full-refresh append sync with format=avro, read back distributed
    (_read_avro) and compare values to the parquet source."""
    from airbyte_ray.config import StreamConfig
    from airbyte_ray.pipelines.incremental import SyncEngine

    src = str(tmp_path / "src.parquet")
    t = pa.table({
        "pk": pa.array(range(500), pa.int64()),
        "v": pa.array([i * 0.5 for i in range(500)], pa.float64()),
        "name": pa.array([f"u{i}" for i in range(500)], pa.string()),
    })
    pq.write_table(t, src)
    eng = SyncEngine(str(tmp_path / "dest"))
    eng.sync(StreamConfig("t", "full_refresh", "append", format="avro"), src)
    back = eng.read("t", format="avro").to_pandas().sort_values("pk").reset_index(drop=True)
    assert len(back) == 500
    assert list(back["pk"]) == list(range(500))
    assert list(back["name"]) == [f"u{i}" for i in range(500)]
    assert back["v"].tolist() == [i * 0.5 for i in range(500)]
