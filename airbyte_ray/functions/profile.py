"""Distributed table profiling — the data-quality scan a pipeline runs
before trusting a new source (the discover/dbt-test adjacency: per-column
row count, null count, exact distinct count, min/max).

Two streaming passes over a column-pruned read:

* **moments** — each batch combines to ONE wide row (per column: n,
  nulls, native-typed min/max), folded by a single global Arrow
  aggregate; min/max stay in their native type through the fold and
  stringify only at the very end (folding stringified numbers would
  compare "10" < "9").
* **distinct** — per batch, each column's values reduce to their unique
  injective ``row_key`` strings (nulls excluded — SQL COUNT(DISTINCT)
  semantics), then one ``(column, key)`` exchange dedups globally and a
  per-column count finishes.  Exchange volume ∝ Σ per-column distincts,
  never rows × columns.

Output: one row per profiled column —
``(col_name, n, n_null, n_distinct, min_s, max_s)`` with min/max as
strings (``CAST(... AS VARCHAR)``-compatible for ints and strings; pass
floats through your own quantization first if you need them
hash-comparable).

Reference analog: dbt schema tests / ``discover``'s catalog stats —
re-expressed as one distributed operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _stringify(v) -> str | None:
    return None if v is None else str(v)


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Profile ``columns`` of ``ds`` → one row per column (see module
    docstring for the exact output schema and the two-pass plan)."""
    sel = ds.select_columns(columns)

    # ---- pass 1: moments (n / nulls / native min / native max) ----
    def moments(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for c in columns:
            col = t[c]
            mm = pc.min_max(col)
            cols[f"{c}__n"] = pa.array([t.num_rows], pa.int64())
            cols[f"{c}__nulls"] = pa.array([col.null_count], pa.int64())
            cols[f"{c}__min"] = pa.array([mm["min"].as_py()], t.schema.field(c).type)
            cols[f"{c}__max"] = pa.array([mm["max"].as_py()], t.schema.field(c).type)
        return pa.table(cols)

    aggs = []
    for c in columns:
        aggs += [(f"{c}__n", "sum"), (f"{c}__nulls", "sum"),
                 (f"{c}__min", "min"), (f"{c}__max", "max")]
    parts = pa.concat_tables(
        [t for t in ray.get(
            sel.map_batches(moments, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows]
    )
    folded = pa.TableGroupBy(
        parts.append_column("__g", pa.array(np.zeros(parts.num_rows, np.int8))),
        "__g",
    ).aggregate(aggs)

    # ---- pass 2: exact distinct counts via one (column, key) exchange ----
    from .setops import row_key

    def dparts(t: pa.Table) -> pa.Table:
        tabs = []
        for c in columns:
            vc = t.select([c]).filter(pc.is_valid(t[c]))
            keys = pc.unique(row_key(vc, [c]))
            tabs.append(pa.table({
                "col_name": pa.array([c] * len(keys)),
                "k": keys,
            }))
        return pa.concat_tables(tabs)

    def count_distinct(g: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(
            g.drop_columns(["__part"]), ["col_name", "k"]
        ).aggregate([])
        cnt = pa.TableGroupBy(gb, "col_name").aggregate([("k", "count")])
        return pa.table({
            "col_name": cnt["col_name"],
            "nd": cnt["k_count"].cast(pa.int64()),
        })

    def route(t: pa.Table) -> pa.Table:
        from ..pipelines.replay import stable_hash

        h = stable_hash(t["k"]) % np.uint64(num_partitions)
        return t.append_column("__part", pa.array(h.astype(np.int64)))

    dists = (
        sel.map_batches(dparts, batch_format="pyarrow")
        .map_batches(route, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_distinct, batch_format="pyarrow")
        .take_all()
    )
    nd: dict[str, int] = {}
    for r in dists:  # a column's keys spread over partitions — sum them
        nd[r["col_name"]] = nd.get(r["col_name"], 0) + int(r["nd"])

    rows = {
        "col_name": [], "n": [], "n_null": [], "n_distinct": [],
        "min_s": [], "max_s": [],
    }
    for c in columns:
        rows["col_name"].append(c)
        rows["n"].append(int(folded[f"{c}__n_sum"][0].as_py() or 0))
        rows["n_null"].append(int(folded[f"{c}__nulls_sum"][0].as_py() or 0))
        rows["n_distinct"].append(nd.get(c, 0))
        rows["min_s"].append(_stringify(folded[f"{c}__min_min"][0].as_py()))
        rows["max_s"].append(_stringify(folded[f"{c}__max_max"][0].as_py()))
    return ray.data.from_arrow(pa.table({
        "col_name": pa.array(rows["col_name"]),
        "n": pa.array(rows["n"], pa.int64()),
        "n_null": pa.array(rows["n_null"], pa.int64()),
        "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
        "min_s": pa.array(rows["min_s"], pa.string()),
        "max_s": pa.array(rows["max_s"], pa.string()),
    }))
