"""SCD Type-2 history table (the reference's append-dedup second output).

Reference: normalization emits BOTH a history ("SCD") table and the final
active view per stream — ``base-normalization/normalization/
transform_catalog/stream_processor.py:742-1011``; the SCD columns
``_airbyte_start_at`` / ``_airbyte_end_at`` / ``_airbyte_active_row`` are
defined at 884-898 and the active-row predicate (latest row AND not deleted)
at 966-967/1076-1115.

Ray-Data-first plan: ONE hash exchange keyed by the record key, then a fully
vectorized per-partition window pass (sort by (key, cursor); end_at is the
next version's start via an array shift; active_row marks the last version
when it isn't a delete).  No per-row Python, no driver materialization —
the history streams out partition by partition.

Partitioning assumption: all versions of one key fit a task (same contract
as the lake's LWW merge); version counts per key are bounded by the change
rate, not the corpus size.

Incremental use: compose with an append-mode raw table — the reference's
SCD model also (re)builds from the raw ``_airbyte_raw`` table, so
``scd2_history(SyncEngine.read(stream))`` after each append sync is the
incremental workflow (see ``tests/test_scd.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .replay import stable_hash

START_AT = "_airbyte_start_at"
END_AT = "_airbyte_end_at"
ACTIVE_ROW = "_airbyte_active_row"


def scd2_history(
    ds: ray.data.Dataset,
    key: str,
    cursor: str,
    deleted_mask: "callable | None" = None,
    num_partitions: int = 64,
    tiebreakers: list[str] | None = None,
) -> ray.data.Dataset:
    """Expand a change stream into SCD2 history rows.

    Every input row becomes one history row carrying ``_airbyte_start_at``
    (its own cursor), ``_airbyte_end_at`` (the NEXT version's cursor within
    the same key, null when open) and ``_airbyte_active_row`` (1 for the
    open row unless ``deleted_mask`` marks it — tombstones appear in history
    but are never active, matching the reference's deleted_at handling).

    ``deleted_mask``: optional ``pa.Table -> pa.BooleanArray`` evaluated on
    the sorted partition table.

    ``tiebreakers``: extra sort columns after the cursor.  The (key, cursor,
    *tiebreakers) chain must be a TOTAL order per key — with cursor ties and
    no tiebreaker, which row closes which is exchange-order-dependent and
    the history is not reproducible (the reference appends
    ``_airbyte_emitted_at`` for the same reason).
    """

    def part_fn(t: pa.Table) -> pa.Table:
        h = stable_hash(t[key].cast(pa.string()))
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    order_keys = [(key, "ascending"), (cursor, "ascending")] + [
        (c, "ascending") for c in (tiebreakers or [])
    ]

    def window(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        t = t.take(pc.sort_indices(t, sort_keys=order_keys))
        k = t[key].to_numpy(zero_copy_only=False)
        has_next = np.r_[k[1:] == k[:-1], False]  # next row is a newer version
        start = t[cursor].combine_chunks()
        shifted = pa.concat_arrays([start.slice(1), pa.nulls(1, start.type)])
        end = pc.if_else(pa.array(has_next), shifted, pa.nulls(t.num_rows, start.type))
        dead = (
            deleted_mask(t).to_numpy(zero_copy_only=False)
            if deleted_mask is not None
            else np.zeros(t.num_rows, bool)
        )
        active = (~has_next) & ~dead
        t = t.append_column(START_AT, start)
        t = t.append_column(END_AT, end)
        return t.append_column(ACTIVE_ROW, pa.array(active.astype(np.int32)))

    return (
        ds.map_batches(part_fn, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(window, batch_format="pyarrow")
    )
