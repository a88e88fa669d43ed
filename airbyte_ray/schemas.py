"""Arrow schemas for the tokenized-sequence lake and its change-event log.

Data model per BASELINE.json ``input_hint`` and SURVEY.md §1.4:

* base/lake table: ``doc_id:string, tokens:list<int32>, n_tok:int32,
  source:string`` — the pre-tokenized training-sequence table.
* change-event log: the Debezium-style flattened envelope (reference:
  ``airbyte-integrations/bases/debezium/.../DebeziumEventUtils.java:21-64``)
  with ``lsn`` (monotonic, unique — pg LSN analog), ``op`` in
  {insert, update, delete}, the payload columns, and the CDC metadata
  columns ``_ab_cdc_updated_at`` / ``_ab_cdc_deleted_at``
  (``docs/understanding-airbyte/cdc.md:15-29``).  Deletes are tombstones:
  payload columns are null, only key + metadata are carried.

Schema evolution (SURVEY §2.11; reference ``star_intersect.sql`` +
``JsonToAvroSchemaConverter.java:116-250`` union-widening): handled by
:func:`unify_schemas` / :func:`conform_table` — added columns are
null-filled, integer types widen, old-only columns pass through.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Canonical schemas (v1)
# ---------------------------------------------------------------------------

TOKENS_TYPE = pa.list_(pa.int32())

BASE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", TOKENS_TYPE),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: CDC metadata columns injected by the event flattener (reference:
#: DebeziumEventUtils.java:17-19,44-64).
CDC_UPDATED_AT = "_ab_cdc_updated_at"
CDC_DELETED_AT = "_ab_cdc_deleted_at"

EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # insert | update | delete
        pa.field("doc_id", pa.string()),
        pa.field("tokens", TOKENS_TYPE),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field(CDC_UPDATED_AT, pa.timestamp("us", tz="UTC")),
    ]
)

#: Payload columns (everything that is not key / lsn / op / metadata).
PAYLOAD_COLUMNS = ("tokens", "n_tok", "source")

OPS = ("insert", "update", "delete")


# ---------------------------------------------------------------------------
# Schema evolution
# ---------------------------------------------------------------------------

_INT_ORDER = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}
_FLOAT_ORDER = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Widen two field types to a common type (int widening, float widening,
    int→float promotion).  Mirrors the reference's union-widening rules
    (json-avro-conversion.md / JsonToAvroSchemaConverter) in Arrow terms."""
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if (a in _INT_ORDER and b in _FLOAT_ORDER) or (a in _FLOAT_ORDER and b in _INT_ORDER):
        return pa.float64()
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(_widen(a.value_type, b.value_type))
    raise pa.ArrowTypeError(f"cannot unify field types {a} and {b}")


def unify_schemas(old: pa.Schema, new: pa.Schema) -> pa.Schema:
    """Unified schema: columns in both take the widened type; columns only in
    one side pass through (nullable).  Column order: old columns first (their
    order), then new-only columns — so repeated evolution is stable."""
    fields: list[pa.Field] = []
    new_names = set(new.names)
    for f in old:
        if f.name in new_names:
            nf = new.field(f.name)
            fields.append(pa.field(f.name, _widen(f.type, nf.type)))
        else:
            fields.append(pa.field(f.name, f.type))
    for f in new:
        if old.get_field_index(f.name) == -1:
            fields.append(pa.field(f.name, f.type))
    return pa.schema(fields)


def conform_table(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: missing columns null-filled, narrower
    types widened, column order normalized.  Zero-copy when already
    conforming."""
    if table.schema.equals(schema):
        return table
    arrays = []
    n = table.num_rows
    for f in schema:
        idx = table.schema.get_field_index(f.name)
        if idx == -1:
            arrays.append(pa.nulls(n, type=f.type))
        else:
            col = table.column(idx)
            arrays.append(col if col.type.equals(f.type) else col.cast(f.type))
    return pa.Table.from_arrays(arrays, schema=schema)
