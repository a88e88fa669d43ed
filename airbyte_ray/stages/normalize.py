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

    def __init__(self, schema: pa.Schema, on_error: str = "null", keep_extra: bool = True):
        assert on_error in ("null", "raise")
        self.schema = schema
        self.on_error = on_error
        self.keep_extra = keep_extra
        self._hooks: list[CustomHook] = []

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
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            if self.on_error == "raise":
                raise
            # per-cell tolerance: cast what casts, null the rest (cold path —
            # only hit when a whole-column cast fails)
            cells = []
            for v in col.to_pylist():
                try:
                    cells.append(pa.array([v]).cast(field.type)[0].as_py())
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    cells.append(None)
            return pa.chunked_array([pa.array(cells, field.type)])

    def __call__(self, t: pa.Table) -> pa.Table:
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
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def type_transform(schema: pa.Schema, on_error: str = "null") -> TypeCoercer:
    return TypeCoercer(schema, on_error=on_error)
