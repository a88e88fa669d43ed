"""Catalog-driven nested normalization — parent/child stream explosion.

Reference: normalization walks a stream's JSON schema and emits one child
table per nested array, keyed back to the parent by its hashid
(``base-normalization/normalization/transform_catalog/stream_processor.py:
386-426``; nested corpus ``integration_tests/resources/test_nested_streams``).

Rules re-expressed over Arrow schemas:

* struct column  → flattened into the parent as ``<col>_<field>`` columns
  (recursive);
* list column    → removed from the parent and emitted as a CHILD stream
  ``<stream>_<col>`` with the parent's ``_airbyte_<stream>_hashid`` foreign
  key + ``_airbyte_index`` position; list<struct> children flatten their
  element fields, list<primitive> children carry a single ``value`` column;
* the parent keeps scalar columns + the hashid.

Everything is vectorized (offsets/np.repeat — no per-row Python) and each
stream is a lazy Dataset: the explosion happens inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .transforms import hash_id


def _flatten_structs(t: pa.Table, prefix: str = "") -> pa.Table:
    """Recursively flatten struct columns into ``<col>_<field>``."""
    out_cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in t.schema.names:
        col = t[name]
        if pa.types.is_struct(col.type):
            flat = col.combine_chunks().flatten()
            sub = pa.table({f"{name}_{f.name}": a for f, a in zip(col.type, flat)})
            sub = _flatten_structs(sub)
            for n in sub.schema.names:
                out_cols[n] = sub[n]
        else:
            out_cols[name] = col
    return pa.table(out_cols)


def ragged_positions(lengths: np.ndarray) -> np.ndarray:
    """0-based position within each run, fully vectorized — the per-row
    ``np.concatenate([np.arange(n) for n in lengths])`` idiom allocated one
    tiny ndarray per row on the hot explode path (review finding)."""
    lengths = np.asarray(lengths, np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.array([], np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )


def _explode_list(t: pa.Table, col: str, fk: str) -> pa.Table:
    """Child-stream rows for one list column: (fk, _airbyte_index, fields…)."""
    lists = t[col].combine_chunks()
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64)).astype(np.int64)
    fk_vals = np.repeat(t[fk].to_numpy(zero_copy_only=False), lengths)
    idx = ragged_positions(lengths)
    flat = lists.flatten()
    cols = {fk: pa.array(fk_vals, pa.string()), "_airbyte_index": pa.array(idx.astype(np.int64))}
    if pa.types.is_struct(flat.type):
        sub = pa.table({f.name: a for f, a in zip(flat.type, flat.flatten())})
        sub = _flatten_structs(sub)
        for n in sub.schema.names:
            cols[n] = sub[n]
    else:
        cols["value"] = flat
    return pa.table(cols)


def normalize_nested(
    ds: ray.data.Dataset, stream: str, key_cols: list[str]
) -> dict[str, ray.data.Dataset]:
    """Split a stream with nested columns into the catalog of flat streams:
    ``{stream: parent_without_lists, f"{stream}_{col}": child, …}``.
    ``key_cols`` feed the parent hashid (``_airbyte_<stream>_hashid``) that
    children carry as their foreign key — the reference's unique-key chain."""
    fk = f"_airbyte_{stream}_hashid"
    schema = ds.schema()
    list_cols = [
        n for n, ty in zip(schema.names, schema.types)
        if pa.types.is_list(ty) or pa.types.is_large_list(ty) or pa.types.is_fixed_size_list(ty)
    ]
    stamp = hash_id(key_cols, name=fk)

    def parent_fn(t: pa.Table) -> pa.Table:
        return _flatten_structs(stamp(t).drop_columns(list_cols))

    out = {stream: ds.map_batches(parent_fn, batch_format="pyarrow")}
    for col in list_cols:
        def child_fn(t: pa.Table, _col=col) -> pa.Table:
            return _explode_list(stamp(t), _col, fk)

        out[f"{stream}_{col}"] = ds.map_batches(child_fn, batch_format="pyarrow")
    return out
