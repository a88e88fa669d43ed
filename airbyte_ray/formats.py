"""Minimal Apache Avro *Object Container File* codec, pure Python.

Implements the published Avro 1.x specification (binary encoding + the
object-container framing, ``null`` codec) so the Avro destination format
works in environments without ``fastavro``.  Scope is exactly what the
sink emits: flat records whose fields are nullable primitives —
``union ["null", long | double | string | boolean | bytes]`` — plus
``timestamp-micros`` / ``date`` logical longs for Arrow temporal columns.

Reference parity: the Avro serialized buffer of the reference destination
(airbyte-integrations/bases/base-java-s3/src/main/java/io/airbyte/
integrations/destination/s3/avro/AvroSerializedBuffer.java).  This is a
from-scratch implementation of the public format, not a port: the writer
is column-preconverted (one Arrow→Python pass per column, then a tight
row loop over prebuilt encoders), and files are written one per Ray block
so the sink stays distributed.

Container layout (spec §"Object Container Files"):
    magic "Obj\\x01"
    file metadata  — an Avro map<bytes>: {"avro.schema": json, "avro.codec": "null"}
    16-byte sync marker
    repeat: block = long(n_records) · long(n_bytes) · payload · sync
"""
from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Callable, Iterator

import pyarrow as pa

MAGIC = b"Obj\x01"


# -- primitive binary encoding (spec §"Binary Encoding") --------------------

def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


_ENC_DOUBLE = struct.Struct("<d")
_ENC_FLOAT = struct.Struct("<f")


def _read_zigzag(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        c = buf.read(1)
        if not c:
            raise EOFError("truncated varint")
        b = c[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# -- schema mapping ---------------------------------------------------------

_ARROW_PRIM: list[tuple[Callable[[pa.DataType], bool], str | dict]] = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_timestamp,
     {"type": "long", "logicalType": "timestamp-micros"}),
    (pa.types.is_date,
     {"type": "int", "logicalType": "date"}),
    (pa.types.is_integer, "long"),
    (pa.types.is_floating, "double"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]


def arrow_to_avro_schema(schema: pa.Schema, name: str = "rec") -> dict:
    """Avro record schema for a flat Arrow schema; every field nullable
    (the sink's contract — Airbyte records carry no NOT NULL)."""
    fields = []
    for f in schema:
        avro_t: str | dict = "string"
        for pred, t in _ARROW_PRIM:
            if pred(f.type):
                avro_t = t
                break
        fields.append({"name": f.name, "type": ["null", avro_t], "default": None})
    return {"type": "record", "name": name, "fields": fields}


def _col_encoder(avro_t: str | dict) -> Callable[[Any], bytes]:
    """Value encoder for one nullable-union field.  Union framing: branch
    index as long (0 = null, 1 = the value) then the branch encoding."""
    base = avro_t["type"] if isinstance(avro_t, dict) else avro_t
    if base == "boolean":
        def enc(v):
            return b"\x02\x01" if v else b"\x02\x00"
    elif base in ("long", "int"):
        def enc(v):
            return b"\x02" + _zigzag(int(v))
    elif base == "double":
        def enc(v):
            return b"\x02" + _ENC_DOUBLE.pack(float(v))
    elif base == "bytes":
        def enc(v):
            return b"\x02" + _enc_bytes(bytes(v))
    else:  # string (and the str() fallback for exotic types)
        def enc(v):
            return b"\x02" + _enc_str(v if isinstance(v, str) else str(v))
    return enc


def _col_pylist(col: pa.ChunkedArray | pa.Array, avro_t: str | dict) -> list:
    """One vectorized Arrow→Python conversion per column (the row loop
    below then only dispatches prebuilt encoders)."""
    t = col.type
    if isinstance(avro_t, dict) and avro_t.get("logicalType") == "timestamp-micros":
        # safe=False: ns inputs truncate to the Avro logical precision (us)
        col = col.cast(pa.timestamp("us", tz=getattr(t, "tz", None)), safe=False)
        return col.cast(pa.int64()).to_pylist()
    if isinstance(avro_t, dict) and avro_t.get("logicalType") == "date":
        return col.cast(pa.date32()).cast(pa.int32()).to_pylist()
    return col.to_pylist()


# -- writer -----------------------------------------------------------------

def write_avro_file(table: pa.Table, path: str, *, block_rows: int = 65536,
                    sync: bytes | None = None) -> None:
    """Write one Avro object-container file for one Arrow table (= one Ray
    block).  Streaming by row-blocks; memory is O(block_rows)."""
    schema = arrow_to_avro_schema(table.schema)
    sync = sync or os.urandom(16)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    field_types = [f["type"][1] for f in schema["fields"]]
    encoders = [_col_encoder(t) for t in field_types]
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {"avro.schema": json.dumps(schema).encode(),
                "avro.codec": b"null"}
        fh.write(_zigzag(len(meta)))
        for k, v in meta.items():
            fh.write(_enc_str(k))
            fh.write(_enc_bytes(v))
        fh.write(_zigzag(0))  # map terminator
        fh.write(sync)
        n = table.num_rows
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            # Arrow→Python per row-block, not whole-table up front: the
            # pylists are the memory hog (review finding — a 1 GB string
            # block is several GB as Python objects), so conversion must
            # track the block_rows window the docstring promises.
            sl = table.slice(lo, hi - lo)
            cols = [_col_pylist(sl.column(i), field_types[i])
                    for i in range(sl.num_columns)]
            buf = bytearray()
            for i in range(hi - lo):
                for col, enc in zip(cols, encoders):
                    v = col[i]
                    buf += b"\x00" if v is None else enc(v)
            fh.write(_zigzag(hi - lo))
            fh.write(_zigzag(len(buf)))
            fh.write(buf)
            fh.write(sync)


# -- reader -----------------------------------------------------------------

def _value_decoder(avro_t: str | dict) -> Callable[[io.BytesIO], Any]:
    base = avro_t["type"] if isinstance(avro_t, dict) else avro_t
    if base == "boolean":
        return lambda b: b.read(1) == b"\x01"
    if base in ("long", "int"):
        return _read_zigzag
    if base == "double":
        return lambda b: _ENC_DOUBLE.unpack(b.read(8))[0]
    if base == "float":
        return lambda b: _ENC_FLOAT.unpack(b.read(4))[0]
    if base == "bytes":
        return lambda b: b.read(_read_zigzag(b))
    if base == "string":
        return lambda b: b.read(_read_zigzag(b)).decode("utf-8")
    raise NotImplementedError(f"avro type {avro_t!r}")


def _iter_records(payload: bytes, n: int, fields: list[dict]) -> Iterator[dict]:
    buf = io.BytesIO(payload)
    decs = []
    for f in fields:
        t = f["type"]
        if isinstance(t, list):  # nullable union
            branches = [None if b == "null" else _value_decoder(b) for b in t]
            def dec(b, branches=branches):
                idx = _read_zigzag(b)
                d = branches[idx]
                return None if d is None else d(b)
        else:
            dec = _value_decoder(t)
        decs.append((f["name"], dec))
    for _ in range(n):
        yield {name: dec(buf) for name, dec in decs}


def _avro_field_arrow_type(avro_t) -> pa.DataType:
    if isinstance(avro_t, list):
        nonnull = [b for b in avro_t if b != "null"]
        return _avro_field_arrow_type(nonnull[0]) if nonnull else pa.null()
    if isinstance(avro_t, dict):
        lt = avro_t.get("logicalType")
        if lt == "timestamp-micros":
            return pa.timestamp("us")
        if lt == "date":
            return pa.date32()
        return _avro_field_arrow_type(avro_t["type"])
    return {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "bytes": pa.binary(), "string": pa.string()}[avro_t]


def read_avro_file(path: str) -> pa.Table:
    """Decode one object-container file back to an Arrow table (logical
    timestamp-micros/date restored as Arrow temporal types)."""
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:  # map may arrive in multiple blocks; 0 terminates
            cnt = _read_zigzag(fh)  # type: ignore[arg-type]
            if cnt == 0:
                break
            if cnt < 0:  # negative count: block byte-size follows (spec)
                _read_zigzag(fh)  # type: ignore[arg-type]
                cnt = -cnt
            for _ in range(cnt):
                k = fh.read(_read_zigzag(fh)).decode()  # type: ignore[arg-type]
                meta[k] = fh.read(_read_zigzag(fh))  # type: ignore[arg-type]
        if meta.get("avro.codec", b"null") not in (b"null", b""):
            raise NotImplementedError(f"codec {meta['avro.codec']!r}")
        schema = json.loads(meta["avro.schema"])
        sync = fh.read(16)
        rows: list[dict] = []
        while True:
            head = fh.read(1)
            if not head:
                break
            fh.seek(-1, 1)
            n = _read_zigzag(fh)  # type: ignore[arg-type]
            size = _read_zigzag(fh)  # type: ignore[arg-type]
            payload = fh.read(size)
            rows.extend(_iter_records(payload, n, schema["fields"]))
            if fh.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    arrow_schema = pa.schema([
        pa.field(f["name"], _avro_field_arrow_type(f["type"]))
        for f in schema["fields"]
    ])
    if not rows:
        return arrow_schema.empty_table()
    cols = {f.name: [r[f.name] for r in rows] for f in arrow_schema}
    # timestamps decoded as int micros → cast through the logical unit
    arrays = []
    for f in arrow_schema:
        vals = cols[f.name]
        if pa.types.is_timestamp(f.type):
            arrays.append(pa.array(vals, pa.int64()).cast(f.type))
        elif pa.types.is_date(f.type):
            arrays.append(pa.array(vals, pa.int32()).cast(f.type))
        else:
            arrays.append(pa.array(vals, f.type))
    return pa.Table.from_arrays(arrays, schema=arrow_schema)
