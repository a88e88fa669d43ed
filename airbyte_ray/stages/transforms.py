"""Per-batch transform stages — the reference's record-level operators,
re-expressed as vectorized Arrow batch functions for ``map_batches``.

Reference parity (SURVEY §2.3):

* :func:`add_fields` / :func:`remove_fields` — the declarative
  ``AddFields`` / ``RemoveFields`` transformations
  (``airbyte-cdk/.../declarative/transformations/add_fields.py:33-120``,
  ``remove_fields.py``);
* :func:`record_filter` — ``RecordFilter.filter_records``
  (``declarative/extractors/record_filter.py:28-38``);
* :func:`flatten_json` — the ``_ab1`` JSON-parse normalization model
  (``base-normalization/.../stream_processor.py:386-470``) done with
  pyarrow's C++ JSON-Lines reader instead of per-row SQL ``json_extract``;
* :func:`hash_id` — the ``_ab3`` md5 row-hash model
  (``stream_processor.py:675-705``) / ``surrogate_key`` macro;
* :func:`emitted_at` — the ``_airbyte_emitted_at`` stamp
  (``basic-normalization.md:29-70``);
* :func:`normalize_name` — identifier normalization
  (``destination_name_transformer.py``), reduced to a simple sanitizer.

Every function here is ``pa.Table -> pa.Table`` (or a factory returning
one), so stages compose inside a single ``map_batches`` without extra
passes.  Dataset-level sugar: ``ds.map_batches(fn, batch_format="pyarrow")``.
"""

from __future__ import annotations

import hashlib
import io
import re
from typing import Callable, Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ColumnExpr = Callable[[pa.Table], pa.Array]


def add_fields(fields: Mapping[str, ColumnExpr | object]) -> Callable[[pa.Table], pa.Table]:
    """Append computed (or constant) columns.  ``fields`` maps name →
    either a callable ``Table -> Array`` or a constant scalar."""

    def fn(t: pa.Table) -> pa.Table:
        for name, expr in fields.items():
            col = expr(t) if callable(expr) else pa.array([expr] * t.num_rows)
            if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                col = pa.array(np.asarray(col))
            if name in t.schema.names:
                t = t.set_column(t.schema.get_field_index(name), name, col)
            else:
                t = t.append_column(name, col)
        return t

    return fn


def remove_fields(names: list[str]) -> Callable[[pa.Table], pa.Table]:
    def fn(t: pa.Table) -> pa.Table:
        return t.drop_columns([n for n in names if n in t.schema.names])

    return fn


def record_filter(predicate: Callable[[pa.Table], pa.Array]) -> Callable[[pa.Table], pa.Table]:
    """Keep rows where the vectorized predicate (Table → boolean Array) holds."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(predicate(t))

    return fn


def flatten_json(
    column: str,
    keep: list[str] | None = None,
    prefix: str = "",
    drop_source: bool = True,
    deep: bool = False,
) -> Callable[[pa.Table], pa.Table]:
    """Parse a string column of single-line JSON objects into typed columns
    using pyarrow's C++ JSON-Lines reader (vectorized — no per-row Python).

    ``deep=True`` recursively flattens nested objects into ``a_b_c`` columns
    (the multi-level DpathExtractor path — round-1 gap; ``keep`` then
    selects flattened names).  Null / empty / whitespace-only cells become
    all-null extracted columns; raw newlines inside a cell (invalid JSON
    anyway) are replaced to preserve row alignment.

    Streaming note: with ``keep=None`` the extracted column set derives from
    each batch's parsed payload, so an EMPTY block contributes no extracted
    columns — pass ``keep`` explicitly when the dataset may contain empty
    blocks (post-filter) to keep block schemas identical."""
    import pyarrow.json as pj

    def fn(t: pa.Table) -> pa.Table:
        col = t[column]
        s = col.cast(pa.string())
        # empty/whitespace-only cells would be DROPPED by the JSONL reader,
        # desyncing row counts (review finding); raw newlines would split a
        # cell across lines — both coerce to the row-preserving '{}' / space
        s = pc.replace_substring(s, "\n", " ")
        blank = pc.equal(pc.utf8_trim_whitespace(pc.fill_null(s, "")), "")
        filled = pc.if_else(
            pc.or_(pc.is_null(col), blank), pa.scalar("{}"), s
        ).combine_chunks()
        if t.num_rows:
            # join every row into one JSONL buffer without a Python loop
            as_list = pa.ListArray.from_arrays(pa.array([0, t.num_rows], pa.int32()), filled)
            payload = pc.binary_join(as_list, "\n")[0].as_py()
        else:
            payload = "{}"
        parsed = pj.read_json(
            io.BytesIO(payload.encode()),
            parse_options=pj.ParseOptions(newlines_in_values=False),
        )
        if deep:
            from .nested import _flatten_structs

            parsed = _flatten_structs(parsed)
        names = keep if keep is not None else parsed.schema.names
        out = t.drop_columns([column]) if drop_source else t
        for n in names:
            if n in parsed.schema.names:
                out = out.append_column(prefix + n, parsed[n])
            else:
                out = out.append_column(prefix + n, pa.nulls(t.num_rows))
        return out

    return fn


def hash_id(
    cols: list[str], name: str = "_airbyte_hashid"
) -> Callable[[pa.Table], pa.Table]:
    """md5 surrogate key over string-cast columns joined with ``|`` —
    byte-compatible with DuckDB ``md5(concat_ws('|', …))`` so the driver's
    SQL oracle can reproduce it.  md5 has no Arrow kernel; the digest loop
    is C-speed hashlib over a pre-joined (vectorized) string column."""

    def fn(t: pa.Table) -> pa.Table:
        # null_handling="skip" drops NULL components AND their separators —
        # exactly concat_ws semantics (concat_ws('|','a',NULL)='a'), so
        # surrogate keys agree with the oracle even on null key columns.
        # CAVEAT (review finding, verified): the Arrow kernel drops the
        # whole OUTPUT ROW when every component is null, shortening the
        # array; DuckDB's concat_ws gives '' there — splice '' back in.
        arrs = [t[c].cast(pa.string()) for c in cols]
        joined = pc.binary_join_element_wise(*arrs, "|", null_handling="skip")
        vals = joined.to_pylist()
        if len(vals) != t.num_rows:
            import numpy as np

            any_valid = np.zeros(t.num_rows, bool)
            for a in arrs:
                any_valid |= pc.is_valid(a).to_numpy(zero_copy_only=False)
            full = np.full(t.num_rows, "", object)
            full[any_valid] = vals
            vals = full.tolist()
        digests = pa.array(
            [hashlib.md5(s.encode()).hexdigest() if s is not None else None
             for s in vals]
        )
        return t.append_column(name, digests)

    return fn


def emitted_at(name: str = "_airbyte_emitted_at") -> Callable[[pa.Table], pa.Table]:
    """Stamp batches with a read-time timestamp (batch-level, like the
    reference's per-message ``emitted_at``)."""
    import datetime as _dt

    def fn(t: pa.Table) -> pa.Table:
        now = _dt.datetime.now(_dt.timezone.utc)
        return t.append_column(
            name, pa.array([now] * t.num_rows, pa.timestamp("us", tz="UTC"))
        )

    return fn


_NAME_RE = re.compile(r"[^A-Za-z0-9_]+")


def normalize_name(name: str) -> str:
    """Identifier sanitizer: lowercase, non-alphanumerics → ``_``, leading
    digit prefixed."""
    s = _NAME_RE.sub("_", name.strip()).lower().strip("_") or "field"
    return f"_{s}" if s[0].isdigit() else s


def compose(*fns: Callable[[pa.Table], pa.Table]) -> Callable[[pa.Table], pa.Table]:
    """Chain stages into one map_batches body (single pass per batch)."""

    def fn(t: pa.Table) -> pa.Table:
        for f in fns:
            t = f(t)
        return t

    return fn


def unpivot(
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Melt wide columns into (variable, value) rows — SQL ``UNPIVOT`` /
    the inverse of :func:`airbyte_ray.functions.agg.pivot_counts`.  Pure
    per-batch reshape (rows × |value_cols| out), zero exchange; value
    columns must share a castable common type (widened to the first
    col's type via Arrow cast, lossless or it raises)."""

    def fn(t: pa.Table) -> pa.Table:
        vt = t[value_cols[0]].type
        outs = []
        for vc in value_cols:
            cols = {c: t[c] for c in id_cols}
            cols[var_name] = pa.array([vc] * t.num_rows, pa.string())
            cols[value_name] = t[vc].cast(vt)
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return fn
