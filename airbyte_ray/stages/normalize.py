"""Type coercion — the ``TypeTransformer`` / ``_ab2`` cast model.

Reference: ``airbyte-cdk/python/airbyte_cdk/sources/utils/transform.py:38-189``
(best-effort recursive cast to the declared schema, logging — never failing —
on mismatch, with a custom-transform registration hook) and the
normalization column-typing model (``stream_processor.py:471-603``).

Here the declared schema is a ``pyarrow.Schema`` and the cast is one
vectorized ``pc.cast`` per column; cells that cannot be cast become null
(on_error="null", the reference's tolerance contract) or raise
(on_error="raise").  Scalars declared as lists are wrapped to 1-element
lists, mirroring ``transform.py:117-121``.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

CustomHook = Callable[[pa.ChunkedArray, pa.Field], pa.ChunkedArray | None]


class TypeCoercer:
    """Callable batch stage: coerce batches to ``schema``.

    Use as ``ds.map_batches(TypeCoercer(schema), batch_format="pyarrow")`` —
    stateless, so Ray runs it as cheap tasks.  ``register(hook)`` adds a
    custom transform tried before the default cast (the
    ``registerCustomTransform`` analog, ``transform.py:61-73``)."""

    #: column holding captured per-row coercion errors (on_error="capture")
    ERRORS_COL = "_ab_errors"

    def __init__(self, schema: pa.Schema, on_error: str = "null", keep_extra: bool = True):
        assert on_error in ("null", "raise", "capture")
        self.schema = schema
        self.on_error = on_error
        self.keep_extra = keep_extra
        self._hooks: list[CustomHook] = []
        self._captured: dict[int, list[str]] = {}

    def register(self, hook: CustomHook) -> "TypeCoercer":
        self._hooks.append(hook)
        return self

    def _coerce(self, col: pa.ChunkedArray, field: pa.Field) -> pa.ChunkedArray:
        for hook in self._hooks:
            out = hook(col, field)
            if out is not None:
                return out
        if col.type.equals(field.type):
            return col
        # scalar declared as list → wrap to 1-element list (transform.py:117-121)
        if pa.types.is_list(field.type) and not pa.types.is_list(col.type):
            inner = self._coerce(col, pa.field(field.name, field.type.value_type))
            flat = inner.combine_chunks()
            offsets = pa.array(range(len(flat) + 1), pa.int32())
            wrapped = pa.ListArray.from_arrays(offsets, flat)
            if col.null_count:
                wrapped = pc.if_else(pc.is_null(col), pa.nulls(len(flat), field.type), wrapped)
            # pc.if_else over a chunked condition returns a ChunkedArray —
            # re-wrapping THAT in pa.chunked_array([...]) iterated it as
            # scalars and crashed on null cells (review finding)
            if isinstance(wrapped, pa.ChunkedArray):
                return wrapped
            return pa.chunked_array([wrapped])
        try:
            return col.cast(field.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
            if self.on_error == "raise":
                raise
            # per-cell tolerance: cast what casts, null the rest (cold path —
            # only hit when a whole-column cast fails).  "capture" records
            # WHICH cells were nulled and why — the AirbyteErrorTraceMessage
            # analog, per row instead of per sync
            # (``airbyte-cdk/python/airbyte_cdk/utils/traced_exception.py:57``).
            cells = []
            for i, v in enumerate(col.to_pylist()):
                try:
                    cells.append(pa.array([v]).cast(field.type)[0].as_py())
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    cells.append(None)
                    if self.on_error == "capture" and v is not None:
                        self._captured.setdefault(i, []).append(
                            f"{field.name}: cannot cast {v!r} to {field.type}"
                        )
            return pa.chunked_array([pa.array(cells, field.type)])

    def __call__(self, t: pa.Table) -> pa.Table:
        self._captured = {}
        arrays, fields = [], []
        for f in self.schema:
            idx = t.schema.get_field_index(f.name)
            if idx == -1:
                arrays.append(pa.nulls(t.num_rows, f.type))
            else:
                arrays.append(self._coerce(t.column(idx), f))
            fields.append(f)
        if self.keep_extra:
            for f in t.schema:
                if self.schema.get_field_index(f.name) == -1:
                    arrays.append(t[f.name])
                    fields.append(f)
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        if self.on_error == "capture":
            errs = [self._captured.get(i, []) for i in range(t.num_rows)]
            out = out.append_column(self.ERRORS_COL, pa.array(errs, pa.list_(pa.string())))
            self._captured = {}
        return out


def type_transform(schema: pa.Schema, on_error: str = "null") -> TypeCoercer:
    return TypeCoercer(schema, on_error=on_error)


def coerce_with_dlq(
    schema: pa.Schema, dlq_dir: str, keep_extra: bool = True
) -> Callable[[pa.Table], pa.Table]:
    """Coerce + dead-letter quarantine in ONE task stage, zero exchange:
    rows whose coercion nulled at least one non-null cell are written —
    with their ``_ab_errors`` reasons — to a parquet file under
    ``dlq_dir`` and removed from the stream; clean rows flow on.

    The DLQ filename is a content hash of the quarantined rows, so a
    retried task overwrites its own file instead of duplicating it (the
    same idempotence discipline as the lake's segment writer).  This is
    the row-level analog of the reference's error trace channel
    (``traced_exception.py``): instead of one failure message per sync,
    every rejected record is preserved, inspectable, and replayable.

    Use as ``ds.map_batches(coerce_with_dlq(schema, dlq), batch_format=
    "pyarrow")``.
    """
    import hashlib
    import os

    import pyarrow.parquet as _pq

    def fn(t: pa.Table) -> pa.Table:
        coercer = TypeCoercer(schema, on_error="capture", keep_extra=keep_extra)
        out = coercer(t)
        nerr = pc.list_value_length(out[TypeCoercer.ERRORS_COL])
        bad_mask = pc.greater(nerr, 0)
        if pc.any(bad_mask).as_py():
            bad = out.filter(bad_mask)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, bad.schema) as w:
                w.write_table(bad)
            tag = hashlib.md5(sink.getvalue().to_pybytes()).hexdigest()[:16]
            os.makedirs(dlq_dir, exist_ok=True)
            _pq.write_table(bad, os.path.join(dlq_dir, f"dlq-{tag}.parquet"))
            out = out.filter(pc.invert(bad_mask))
        return out.drop_columns([TypeCoercer.ERRORS_COL])

    return fn
