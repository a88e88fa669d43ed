"""Pure-Python sequential replay oracle — the reference final-table contract.

Reproduces the append-dedup / SCD2 "active rows" semantics of the reference
normalization (``base-normalization/.../stream_processor.py:884-898,973-1008``:
``row_number() over (partition by unique_key order by cursor desc …) = 1`` and
``_airbyte_active_row`` requires ``_ab_cdc_deleted_at is null``), collapsed for
a unique monotonic LSN cursor:

* apply events in lsn order; an event applies iff ``lsn > applied_lsn[key]``
  (strict — identical redeliveries are dropped: exactly-once from
  at-least-once input, the reference's replay-dedup row_number trick);
* the latest applied event's payload **replaces** the row wholesale
  (missing columns in an evolved schema become null — ``star_intersect``
  semantics for updated rows);
* a delete tombstone removes the key from the final table.

Used by every pytest as the independent ground truth (FIXTURES.md F5).
Intentionally simple and row-at-a-time — do NOT optimize; it must stay
obviously-correct.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from .schemas import unify_schemas


def replay_oracle(base: pa.Table | None, event_tables: Iterable[pa.Table]) -> pa.Table:
    """Sequentially replay ``event_tables`` over ``base``; return the final
    table (unified schema, sorted by doc_id)."""
    event_tables = list(event_tables)

    schema = base.schema if base is not None else None
    payload_schemas = []
    for t in event_tables:
        drop = [c for c in ("lsn", "op", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
                            "_ab_cdc_snapshot")  # engine meta col (snapshot flag)
                if c in t.schema.names]
        payload_schemas.append(t.drop_columns(drop).schema)
    for s in payload_schemas:
        schema = s if schema is None else unify_schemas(schema, s)

    live: dict[str, dict] = {}
    applied: dict[str, int] = {}

    if base is not None:
        for row in base.to_pylist():
            live[row["doc_id"]] = row
            applied[row["doc_id"]] = 0

    events: list[dict] = []
    for t in event_tables:
        events.extend(t.to_pylist())
    events.sort(key=lambda e: e["lsn"])

    for e in events:
        key = e["doc_id"]
        if e["lsn"] <= applied.get(key, -1):
            continue  # duplicate / stale redelivery
        applied[key] = e["lsn"]
        if e["op"] == "delete":
            live.pop(key, None)
        else:
            live[key] = {
                f.name: e.get(f.name) for f in schema
            }

    rows = [live[k] for k in sorted(live)]
    if not rows:
        return schema.empty_table()
    return pa.Table.from_pylist(rows, schema=schema)
