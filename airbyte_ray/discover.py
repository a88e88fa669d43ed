"""discover / check lifecycle verbs — the connector handshake analog.

Reference: every connector answers ``spec | check | discover`` before a sync
is configured (``airbyte-cdk/python/airbyte_cdk/sources/abstract_source.py:
42-61`` — ``check_connection`` + ``discover`` returning an AirbyteCatalog;
CLI dispatch in ``entrypoint.py:26-137``).  Here the "connection" is a
lake-native source (parquet/json/csv paths), so:

* :func:`check` proves the source is readable (schema + one sample row);
* :func:`discover` emits a catalog: one stream per source with a JSON-schema
  rendering of the Arrow schema, supported sync modes, and inferred default
  cursor candidates (monotonic-looking columns — timestamps, ``*_id``,
  ``lsn``, ``*_at``);
* :func:`configure` turns a discovered stream + user choices into the
  :class:`~airbyte_ray.config.StreamConfig` the sync engine runs — the
  ConfiguredAirbyteCatalog analog.

Metadata-only where possible: parquet discovery reads footers, never data.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .config import DestinationSyncMode, StreamConfig, SyncMode


def _arrow_to_json_schema(t: pa.DataType) -> dict:
    """Arrow type → JSON-schema fragment (the reference's JsonSchemaType)."""
    if pa.types.is_boolean(t):
        return {"type": "boolean"}
    if pa.types.is_integer(t):
        return {"type": "integer"}
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return {"type": "number"}
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return {"type": "string", "format": "date-time"}
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return {"type": "array", "items": _arrow_to_json_schema(t.value_type)}
    if pa.types.is_struct(t):
        return {
            "type": "object",
            "properties": {f.name: _arrow_to_json_schema(f.type) for f in t},
        }
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return {"type": "string", "contentEncoding": "base64"}
    return {"type": "string"}


_CURSOR_HINTS = ("lsn", "cursor", "ts", "mtime", "updated_at", "modified_at")


def _hinted(name: str) -> bool:
    """Token-boundary hint match — substring matching promoted unrelated
    string columns (e.g. 'commenTS') to cursors; underscore-padded
    containment also catches multi-token hints inside longer names
    ('updated_at_ms')."""
    padded = "_" + name.lower().replace("-", "_") + "_"
    return any(f"_{h}_" in padded for h in _CURSOR_HINTS)


def _cursor_candidates(schema: pa.Schema) -> list[str]:
    """Monotonic-looking columns, best first: timestamps, then hinted
    ORDERABLE (numeric/temporal) names, then integer ``*_id`` columns (the
    reference's source-defined cursor)."""
    def orderable(t: pa.DataType) -> bool:
        return (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_timestamp(t) or pa.types.is_date(t))

    out = []
    for f in schema:
        if pa.types.is_timestamp(f.type) or pa.types.is_date(f.type):
            out.append(f.name)
    for f in schema:
        if f.name not in out and _hinted(f.name) and orderable(f.type):
            out.append(f.name)
    for f in schema:
        # exact 'id' or '*_id' only — a bare endswith('id') promoted value
        # columns like 'paid'/'bid'/'valid' to cursors (review finding, the
        # same substring class _hinted was hardened against)
        nm = f.name.lower()
        if f.name not in out and pa.types.is_integer(f.type) and (
            nm == "id" or nm.endswith("_id")
        ):
            out.append(f.name)
    return out


def _source_schema(path: str, fmt: str) -> pa.Schema:
    if fmt == "parquet":
        return pq.read_schema(path)  # footer only — no data scan
    if fmt == "json":
        from pyarrow import json as pa_json

        return pa_json.read_json(path).schema  # sample file; small by contract
    if fmt == "csv":
        from pyarrow import csv as pa_csv

        return pa_csv.read_csv(path).schema
    raise ValueError(f"unknown source format {fmt}")


_FMT_EXT = {"parquet": ("*.parquet",), "json": ("*.json", "*.jsonl"), "csv": ("*.csv",)}


def _expand(paths: str | list[str], fmt: str = "parquet") -> list[str]:
    paths = [paths] if isinstance(paths, str) else list(paths)
    pats = _FMT_EXT.get(fmt, ("*.*",))
    out = []
    for p in paths:
        if os.path.isdir(p):
            # only the format's own extensions: '**/*.*' swept in sidecars
            # (_SUCCESS.crc, .json manifests) whose footer read then failed
            # a perfectly valid source (review finding)
            for pat in pats:
                out.extend(sorted(glob.glob(os.path.join(p, "**", pat), recursive=True)))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        else:
            out.append(p)
    return out


def check(paths: str | list[str], fmt: str = "parquet") -> dict:
    """Connection check: source exists and is readable.  Returns the
    AirbyteConnectionStatus analog {status: SUCCEEDED|FAILED, message}."""
    try:
        files = _expand(paths, fmt)
        if not files:
            return {"status": "FAILED", "message": f"no files match {paths}"}
        schema = _source_schema(files[0], fmt)
        if fmt == "parquet":
            n = sum(pq.read_metadata(f).num_rows for f in files)
        else:
            n = None
        return {
            "status": "SUCCEEDED",
            "message": f"{len(files)} file(s), {len(schema)} column(s)"
            + (f", {n} rows" if n is not None else ""),
        }
    except Exception as e:  # the check verb reports, never raises
        return {"status": "FAILED", "message": f"{type(e).__name__}: {e}"}


def discover(paths: str | list[str], fmt: str = "parquet",
             stream_name: str | None = None) -> dict:
    """Schema discovery → catalog (the AirbyteCatalog analog): one stream
    per call with a JSON-schema of the columns, supported sync modes, and
    cursor candidates.  Metadata-only for parquet."""
    files = _expand(paths, fmt)
    if not files:
        raise FileNotFoundError(f"no files match {paths}")
    schema = _source_schema(files[0], fmt)
    name = stream_name or os.path.splitext(os.path.basename(files[0]))[0]
    cursors = _cursor_candidates(schema)
    return {
        "streams": [
            {
                "name": name,
                "json_schema": {
                    "type": "object",
                    "properties": {f.name: _arrow_to_json_schema(f.type) for f in schema},
                },
                "supported_sync_modes": (
                    ["full_refresh", "incremental"] if cursors else ["full_refresh"]
                ),
                "source_defined_cursor": bool(cursors),
                "default_cursor_field": cursors[:1],
                "source_files": files,
                "format": fmt,
            }
        ]
    }


def configure(
    catalog: dict,
    stream: str,
    sync_mode: str = "incremental",
    destination_sync_mode: str = "append_dedup",
    cursor_field: str | None = None,
    primary_key: list[str] | None = None,
    **kwargs,
) -> StreamConfig:
    """Catalog + user choices → a runnable StreamConfig (the
    ConfiguredAirbyteStream analog).  Validates the cursor exists and the
    stream supports the requested mode."""
    entry = next((s for s in catalog["streams"] if s["name"] == stream), None)
    if entry is None:
        raise KeyError(f"stream {stream!r} not in catalog")
    if sync_mode not in entry["supported_sync_modes"]:
        raise ValueError(f"stream {stream!r} does not support {sync_mode}")
    cursor = cursor_field or (entry["default_cursor_field"] or [None])[0]
    if sync_mode == "incremental":
        if cursor is None:
            raise ValueError("incremental sync requires a cursor_field")
        if cursor not in entry["json_schema"]["properties"]:
            raise ValueError(f"cursor {cursor!r} not a column of {stream!r}")
    if destination_sync_mode == "append_dedup" and not primary_key:
        raise ValueError("append_dedup requires a primary_key")
    for pk in primary_key or []:
        if pk not in entry["json_schema"]["properties"]:
            raise ValueError(f"primary key {pk!r} not a column of {stream!r}")
    return StreamConfig(
        stream,
        SyncMode(sync_mode),
        DestinationSyncMode(destination_sync_mode),
        cursor_field=cursor if sync_mode == "incremental" else None,
        primary_key=list(primary_key or []),
        **kwargs,
    )
