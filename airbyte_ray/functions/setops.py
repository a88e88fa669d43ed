"""Distinct set operations between two Datasets — SQL ``INTERSECT`` /
``EXCEPT`` (SURVEY §2.9; the reference's set ops are stream unions and
per-PK dedup — these complete the family).

Plan: ONE exchange total.  Each side locally dedups inside the combiner
(so the shuffle carries ≤ |distinct rows| per batch, not the corpus),
both sides union tagged, and one hash-partition exchange + a segmented
run-length pass (no per-group Python dispatch) emits each distinct row
once with (in_left, in_right) membership flags — intersect / except are
then vectorized filters over the flags.  NULL column values participate
like SQL set ops (row-equality, not join equality): two all-equal rows
match even on null fields.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def row_key(t: pa.Table, cols: list[str]) -> pa.Array | pa.ChunkedArray:
    """Injective composite row key over ``cols``: each field is encoded as
    ``"N"`` for NULL or ``"<byte-length>:<value>"`` otherwise, fields
    joined with ``|``.  The length prefix makes the encoding prefix-free,
    so values containing the separator (or the literal ``"N"``) can never
    collide with other rows — a plain sentinel-join would."""
    parts = []
    for c in cols:
        s = t[c].cast(pa.string())
        enc = pc.binary_join_element_wise(
            pc.binary_length(s).cast(pa.string()), s, ":"
        )
        parts.append(pc.coalesce(enc, pa.scalar("N")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "|")


def set_compare(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distinct rows of ``left ∪ right`` over ``cols`` with boolean
    ``in_left`` / ``in_right`` membership columns — the shared exchange
    behind :func:`intersect_distinct` and :func:`except_distinct`."""
    from ..pipelines.replay import stable_hash

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            k = row_key(t, cols)
            # local distinct: the exchange sees each batch's unique rows once
            _, first_idx = np.unique(k.to_numpy(zero_copy_only=False), return_index=True)
            take = pa.array(np.sort(first_idx))
            t = t.take(take).append_column("__k", k.take(take))
            part = stable_hash(t["__k"]) % np.uint64(num_partitions)
            t = t.append_column("__part", pa.array(part.astype(np.int64)))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    l = left.map_batches(prep(0), batch_format="pyarrow")
    r = right.map_batches(prep(1), batch_format="pyarrow")

    def judge(g: pa.Table) -> pa.Table:
        from .agg import _segments

        idx = pc.sort_indices(g, sort_keys=[("__k", "ascending")])
        g = g.take(idx).combine_chunks()
        k = g["__k"].to_numpy(zero_copy_only=False)
        _, starts, _ = _segments(k)
        side = g["__side"].to_numpy(zero_copy_only=False)
        in_l = np.minimum.reduceat(side, starts) == 0
        in_r = np.maximum.reduceat(side, starts) == 1
        first = g.take(pa.array(starts)).select(cols)
        first = first.append_column("in_left", pa.array(in_l))
        return first.append_column("in_right", pa.array(in_r))

    return l.union(r).groupby("__part").map_groups(judge, batch_format="pyarrow")


def intersect_distinct(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL ``INTERSECT``: distinct rows present on BOTH sides."""
    cmp = set_compare(left, right, cols)
    return cmp.map_batches(
        lambda t: t.filter(pc.and_(t["in_left"], t["in_right"])).select(cols),
        batch_format="pyarrow",
    )


def except_distinct(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL ``EXCEPT``: distinct left rows absent from the right."""
    cmp = set_compare(left, right, cols)
    return cmp.map_batches(
        lambda t: t.filter(pc.and_(t["in_left"], pc.invert(t["in_right"]))).select(cols),
        batch_format="pyarrow",
    )
