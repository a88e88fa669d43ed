"""Distinct set operations between two Datasets — SQL ``INTERSECT`` /
``EXCEPT`` (SURVEY §2.9; the reference's set ops are stream unions and
per-PK dedup — these complete the family).

Plan: ONE exchange total.  Each side locally dedups inside the combiner
(so the shuffle carries ≤ |distinct rows| per batch, not the corpus),
both sides union tagged, and one groupby over a composite row key emits
each distinct row once with (in_left, in_right) membership flags —
intersect / except are then vectorized filters over the flags.  NULL
column values participate like SQL set ops (row-equality, not join
equality): two all-equal rows match even on null fields, because the
composite key encodes null distinctly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _row_key(t: pa.Table, cols: list[str]) -> pa.Array:
    parts = []
    for c in cols:
        parts.append(pc.coalesce(t[c].cast(pa.string()), pa.scalar("\x00∅")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x01")


def set_compare(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """Distinct rows of ``left ∪ right`` over ``cols`` with boolean
    ``in_left`` / ``in_right`` membership columns — the shared exchange
    behind :func:`intersect_distinct` and :func:`except_distinct`."""

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            k = _row_key(t, cols)
            # local distinct: the exchange sees each batch's unique rows once
            _, first_idx = np.unique(k.to_numpy(zero_copy_only=False), return_index=True)
            take = pa.array(np.sort(first_idx))
            t = t.take(take).append_column("__k", k.take(take))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    l = left.map_batches(prep(0), batch_format="pyarrow")
    r = right.map_batches(prep(1), batch_format="pyarrow")

    def judge(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        row = {c: g[c].slice(0, 1) for c in cols}
        row["in_left"] = pa.array([bool((side == 0).any())])
        row["in_right"] = pa.array([bool((side == 1).any())])
        return pa.table(row)

    return l.union(r).groupby("__k").map_groups(judge, batch_format="pyarrow")


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
