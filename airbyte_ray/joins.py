"""Joins & lookups, Ray-Data-first (SURVEY §2.6).

The reference has no general relational join — its only joins are the SCD
incremental semi-join (``stream_processor.py:928-938``) and parent→child
substream lookups.  At 100 TB the two shapes we provide cover both and more:

* :func:`broadcast_join` — small side (dimension table / key set) is put in
  the object store ONCE (``ray.put``) and joined into every batch with an
  Arrow-native ``pa.Table.join``.  No shuffle at all; this is the right plan
  whenever one side fits a worker heap (the reference's substream lookup
  and SCD key-set semi-join both reduce to this).
* :func:`hash_join` — both sides large: add ``bucket = hash(key) % B`` to
  each side, tag, union, ONE ``groupby(bucket)`` shuffle, and an Arrow
  join inside each bucket group.  B must be chosen so each bucket pair
  fits a task heap; skewed keys can be salted by raising B (buckets are
  uniform in the key hash, so only exact-key hot spots matter — those are
  broadcast-join territory instead).
* :func:`semi_join` / :func:`anti_join` — broadcast the key set and filter
  with a vectorized ``is_in`` mask.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .pipelines.replay import stable_hash
from .schemas import conform_table


def _key_hash(t: pa.Table, on: list[str]) -> np.ndarray:
    h = np.zeros(t.num_rows, np.uint64)
    with np.errstate(over="ignore"):
        for c in on:
            h = h * np.uint64(1099511628211) + stable_hash(t[c].cast(pa.string()))
    return h


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table | pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join a large Dataset against a small in-memory table without any
    shuffle.  ``how`` ∈ {inner, left}.  Arrow-native per-batch join — a
    pandas merge degraded null-bearing int columns to float64 and produced
    batch-dependent schemas on left joins (review finding); non-key column
    collisions raise (same contract as hash_join) instead of silently
    suffixing."""
    on = [on] if isinstance(on, str) else list(on)
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    overlap = set(big.schema().names) & set(small.schema.names) - set(on)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    join_type = {"inner": "inner", "left": "left outer"}[how]
    ref = ray.put(small.combine_chunks())

    def merge(t: pa.Table) -> pa.Table:
        sm = ray.get(ref)
        out = t.combine_chunks().join(sm, keys=on, join_type=join_type, use_threads=False)
        return out.select(list(t.schema.names) + [c for c in sm.schema.names if c not in on])

    return big.map_batches(merge, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str] | str,
    how: str = "inner",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Partitioned hash join: bucket by key hash, tag sides, union, single
    groupby(bucket) shuffle, per-bucket Arrow join.  ``how`` ∈ {inner,
    left, outer}: full-outer is bucket-local-correct because every key
    value hashes to exactly one bucket, so unmatched rows of either side
    surface exactly once (keys are assumed non-null — SQL null keys never
    match and should be pre-filtered)."""
    on = [on] if isinstance(on, str) else list(on)

    lcols = left.schema().names
    rcols = right.schema().names
    l_only = [c for c in lcols if c not in on]
    r_only = [c for c in rcols if c not in on]
    overlap = set(l_only) & set(r_only)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            b = (_key_hash(t, on) % np.uint64(num_buckets)).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array(np.full(t.num_rows, side, np.int8)))

        return fn

    l = left.map_batches(prep(0), batch_format="pyarrow")
    r = right.map_batches(prep(1), batch_format="pyarrow")

    # conform to the union schema (other side's columns null-filled)
    def widen(missing: list[str], other_schema):
        def fn(t: pa.Table) -> pa.Table:
            for name in missing:
                t = t.append_column(name, pa.nulls(t.num_rows, other_schema[name]))
            return t

        return fn

    r_types = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    l_types = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    l = l.map_batches(widen(r_only, r_types), batch_format="pyarrow")
    r = r.map_batches(widen(l_only, l_types), batch_format="pyarrow")
    col_order = on + l_only + r_only + ["__bucket", "__side"]
    l = l.select_columns(col_order)
    r = r.select_columns(col_order)

    # In-bucket join is Arrow-native (pa.Table.join) so integer columns stay
    # integers — a pandas merge would degrade any null-bearing int column to
    # float64 (the round-1 hash_match failure).
    join_type = {"inner": "inner", "left": "left outer", "outer": "full outer"}[how]
    out_cols = on + l_only + r_only

    def bucket_merge(g: pa.Table) -> pa.Table:
        is_left = pc.equal(g["__side"], 0)
        lt = g.filter(is_left).select(on + l_only).combine_chunks()
        rt = g.filter(pc.invert(is_left)).select(on + r_only).combine_chunks()
        out = lt.join(rt, keys=on, join_type=join_type, use_threads=False)
        return out.select(out_cols)

    return l.union(r).groupby("__bucket").map_groups(bucket_merge, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    num_buckets: int = 32,
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction="backward") within the same ``by``
    key.  Plan: bucket both sides by ``hash(by)``, one groupby(bucket)
    shuffle, then ``pd.merge_asof`` over the sorted bucket — the guide's
    documented pattern.  Partitioning assumption: a (by, on) group fits a
    task; buckets are uniform in the key hash."""
    lcols = left.schema().names
    rcols = right.schema().names
    r_only = [c for c in rcols if c not in (by, on)]
    overlap = set(lcols) & set(r_only)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            b = (_key_hash(t, [by]) % np.uint64(num_buckets)).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array(np.full(t.num_rows, side, np.int8)))

        return fn

    l = left.map_batches(prep(0), batch_format="pyarrow")
    r = right.map_batches(prep(1), batch_format="pyarrow")

    r_types = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    l_types = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    l_only = [c for c in lcols if c not in (by, on)]

    def widen(missing, types):
        def fn(t: pa.Table) -> pa.Table:
            for name in missing:
                t = t.append_column(name, pa.nulls(t.num_rows, types[name]))
            return t

        return fn

    col_order = [by, on] + l_only + r_only + ["__bucket", "__side"]
    l = l.map_batches(widen(r_only, r_types), batch_format="pyarrow").select_columns(col_order)
    r = r.map_batches(widen(l_only, l_types), batch_format="pyarrow").select_columns(col_order)

    # pd.merge_asof is the matching kernel, but ONLY (by, on, positional
    # index) go through pandas: the old whole-table to_pandas round-trip
    # degraded null-bearing int64 value columns to float64, silently
    # corrupting ids above 2^53 — the schema conform restored the dtype but
    # not the precision (review finding).  Values are gathered Arrow-side
    # by index; a null match index takes as a null row.
    out_schema = pa.schema(
        [(by, l_types[by]), (on, l_types[on])]
        + [(c, l_types[c]) for c in l_only]
        + [(on + "_right", r_types[on])]
        + [(c, r_types[c]) for c in r_only]
    )

    def bucket_asof(g: pa.Table) -> pa.Table:
        is_left = pc.equal(g["__side"], 0)
        lt = g.filter(is_left).select([by, on] + l_only).combine_chunks()
        rt = g.filter(pc.invert(is_left)).select([by, on] + r_only).combine_chunks()
        if lt.num_rows == 0:
            return out_schema.empty_table()
        if rt.num_rows == 0:
            ridx = pa.array([None] * lt.num_rows, pa.int64())
            l_take, r_take = lt, rt
        else:
            ldf = pd.DataFrame({
                by: lt[by].to_numpy(zero_copy_only=False),
                on: lt[on].to_numpy(zero_copy_only=False),
                "__lidx": np.arange(lt.num_rows, dtype=np.int64),
            }).sort_values(on, kind="stable")
            rdf = pd.DataFrame({
                by: rt[by].to_numpy(zero_copy_only=False),
                "__ron": rt[on].to_numpy(zero_copy_only=False),
                "__ridx": np.arange(rt.num_rows, dtype=np.int64),
            }).sort_values("__ron", kind="stable")
            m = pd.merge_asof(ldf, rdf, left_on=on, right_on="__ron",
                              by=by, direction=direction)
            lidx = m["__lidx"].to_numpy(np.int64)
            rraw = m["__ridx"].to_numpy(np.float64)  # NaN = no match
            matched = ~np.isnan(rraw)
            l_take = lt.take(pa.array(lidx))
            ridx = pa.array(np.where(matched, rraw, 0).astype(np.int64),
                            mask=~matched)
            r_take = rt.take(ridx)
        cols = {by: l_take[by], on: l_take[on]}
        for c in l_only:
            cols[c] = l_take[c]
        if rt.num_rows == 0:
            cols[on + "_right"] = pa.nulls(lt.num_rows, r_types[on])
            for c in r_only:
                cols[c] = pa.nulls(lt.num_rows, r_types[c])
        else:
            cols[on + "_right"] = r_take[on]
            for c in r_only:
                cols[c] = r_take[c]
        return conform_table(pa.table(cols), out_schema)

    return l.union(r).groupby("__bucket").map_groups(bucket_asof, batch_format="pyarrow")


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    lo: str,
    hi: str,
    bounds: list | np.ndarray | None = None,
    num_buckets: int = 32,
    chunk: int = 4096,
) -> ray.data.Dataset:
    """Interval (range) join: inner-join each left row to every right row
    whose half-open interval ``[lo, hi)`` contains ``left.on``.

    The reference has no such operator (its joins are key-equality only);
    this is the classic distributed plan for the shape Ray Data lacks:

    * Partition the VALUE DOMAIN — not a key hash — into ``num_buckets``
      contiguous ranges (``bounds`` = the inner cut points; when omitted
      they are derived from a seeded 1 % sample of ``left.on`` quantiles,
      so skewed value distributions still ballast evenly).
    * Each left row routes to exactly ONE bucket (the range holding its
      value), so the output has no duplicates to reconcile.
    * Each right interval is REPLICATED to every bucket its span overlaps
      (intervals are assumed small-ish relative to the domain — a single
      interval spanning the whole domain degrades to a broadcast, which
      is then the right plan anyway).
    * ONE ``groupby(bucket)`` exchange; in-bucket matching is a chunked
      dense compare (``len(left) × chunk`` bools at a time), fully
      vectorized, memory bounded by ``chunk``.

    Partitioning assumption: each (bucket's left rows × bucket's
    intervals) pair fits a task heap — raise ``num_buckets`` to shrink
    buckets; hot VALUE ranges (not hot keys) are what skews this plan.
    """
    lcols = left.schema().names
    rcols = right.schema().names
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    if bounds is None:
        smp = (
            left.select_columns([on])
            .random_sample(0.01, seed=7)
            .limit(100_000)
            .to_pandas()[on]
            .to_numpy()
        )
        qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
        bounds = np.unique(np.quantile(smp, qs)) if len(smp) else np.array([0.0])
    cuts = np.asarray(bounds, np.float64)
    cuts_ref = ray.put(cuts)

    def route_left(t: pa.Table) -> pa.Table:
        v = t[on].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(ray.get(cuts_ref), v, side="right")
        t = t.append_column("__bucket", pa.array(b.astype(np.int64)))
        return t.append_column("__side", pa.array(np.full(t.num_rows, 0, np.int8)))

    def route_right(t: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        los = t[lo].to_numpy(zero_copy_only=False).astype(np.float64)
        his = t[hi].to_numpy(zero_copy_only=False).astype(np.float64)
        first = np.searchsorted(c, los, side="right")
        last = np.searchsorted(c, his, side="left")  # hi is EXCLUSIVE
        n_rep = np.maximum(last - first + 1, 0)
        n_rep[his <= los] = 0  # empty intervals match nothing
        idx = np.repeat(np.arange(t.num_rows), n_rep)
        starts = np.concatenate([[0], np.cumsum(n_rep)])[:-1]
        within = np.arange(int(n_rep.sum())) - np.repeat(starts, n_rep)
        b = np.repeat(first, n_rep) + within
        t = t.take(pa.array(idx)).append_column("__bucket", pa.array(b.astype(np.int64)))
        return t.append_column("__side", pa.array(np.full(len(idx), 1, np.int8)))

    l = left.map_batches(route_left, batch_format="pyarrow")
    r = right.map_batches(route_right, batch_format="pyarrow")

    # conform both sides to the union schema before the exchange
    l_types = {n: t for n, t in zip(lcols, left.schema().types)}
    r_types = {n: t for n, t in zip(rcols, right.schema().types)}

    def widen(missing, types):
        def fn(t: pa.Table) -> pa.Table:
            for name in missing:
                t = t.append_column(name, pa.nulls(t.num_rows, types[name]))
            return t

        return fn

    col_order = lcols + rcols + ["__bucket", "__side"]
    l = l.map_batches(widen(rcols, r_types), batch_format="pyarrow").select_columns(col_order)
    r = r.map_batches(widen(lcols, l_types), batch_format="pyarrow").select_columns(col_order)

    out_cols = lcols + rcols

    def bucket_match(g: pa.Table) -> pa.Table:
        is_left = pc.equal(g["__side"], 0)
        lt = g.filter(is_left).select(lcols).combine_chunks()
        rt = g.filter(pc.invert(is_left)).select(rcols).combine_chunks()
        sch = pa.schema([(c, l_types[c]) for c in lcols] + [(c, r_types[c]) for c in rcols])
        if lt.num_rows == 0 or rt.num_rows == 0:
            return sch.empty_table()
        v = lt[on].to_numpy(zero_copy_only=False).astype(np.float64)
        los = rt[lo].to_numpy(zero_copy_only=False).astype(np.float64)
        his = rt[hi].to_numpy(zero_copy_only=False).astype(np.float64)
        li_all, ri_all = [], []
        for c0 in range(0, rt.num_rows, chunk):
            m = (los[None, c0 : c0 + chunk] <= v[:, None]) & (
                v[:, None] < his[None, c0 : c0 + chunk]
            )
            li, ri = np.nonzero(m)
            li_all.append(li)
            ri_all.append(ri + c0)
        li = pa.array(np.concatenate(li_all))
        ri = pa.array(np.concatenate(ri_all))
        l_take, r_take = lt.take(li), rt.take(ri)
        return pa.table(
            {**{c: l_take[c] for c in lcols}, **{c: r_take[c] for c in rcols}}
        ).select(out_cols)

    return l.union(r).groupby("__bucket").map_groups(bucket_match, batch_format="pyarrow")


def semi_join(
    big: ray.data.Dataset, keys: pa.Table | list, on: str, anti: bool = False
) -> ray.data.Dataset:
    """Filter ``big`` to rows whose ``on`` value is (not, for anti) in the
    broadcast key set."""
    if isinstance(keys, pa.Table):
        keys = keys[on].to_pylist()
    # drop nulls (is_in never matches null; sorting mixed None/str raised)
    ref = ray.put([k for k in set(keys) if k is not None])

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(t[on], value_set=pa.array(ks, t[on].type))
        return t.filter(pc.invert(mask) if anti else mask)

    return big.map_batches(fn, batch_format="pyarrow")


def anti_join(big: ray.data.Dataset, keys, on: str) -> ray.data.Dataset:
    return semi_join(big, keys, on, anti=True)


def skew_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    hot_min_count: int = 100_000,
    num_buckets: int = 32,
    broadcast_cap_rows: int = 1_000_000,
    detect_sample: float = 0.05,
    hot_keys: list | None = None,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Skew-aware join: keys hot on the LEFT (fact) side never enter the
    shuffle.  A plain hash join sends every row of a hot key to ONE bucket
    task, which must hold that key's full row set (and its join output) in
    a single heap — at 10^10 rows a hostage key is an OOM, not a slowdown.
    Here the hot rows stay in streaming ``map_batches`` (peak memory =
    batch size) and the exchange carries only the cold tail — the bench
    measures the exchange-volume reduction directly.  (Wall-time on a
    single node breaks even only at extreme skew: Arrow's in-bucket join
    is fast, and this plan spends extra passes on detection + routing —
    measured honestly in BASELINE.md.)  Plan:

    1. detect hot left keys with the exact-output CMS pass
       (``sketch.heavy_hitters``: count ≥ ``hot_min_count``) — one pass,
       no false negatives, candidates verified exactly;
    2. hot left rows join in-task against the BROADCAST right rows of
       those keys (``ray.put`` once, fetched once per worker) — zero
       exchange for precisely the rows a shuffle handles worst;
    3. cold rows of both sides take the normal partitioned
       :func:`hash_join`;
    4. union — each left row travels exactly one path, so inner/left
       multiplicities are exact.

    ``how`` ∈ {inner, left}.  The broadcast side is bounded by
    |hot keys| × rows-per-key on the RIGHT (the dimension side, small by
    contract); ``broadcast_cap_rows`` fails loudly if that contract is
    violated rather than silently OOMing workers.  With no hot keys this
    IS ``hash_join``."""
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    key_type = left.schema().types[left.schema().names.index(on)]
    if hot_keys is None:
        # Detection on a deterministic md5 SAMPLE: a false negative only
        # routes that key through the hash path (correctness unaffected —
        # hot routing is a pure optimization), so sampling is safe and
        # cuts the detection pass to detect_sample of the left side.  The
        # threshold halves on top of the scaling to keep marginal hot
        # keys detected w.h.p.
        from .functions.sketch import heavy_hitters

        det = left
        thr = hot_min_count
        if 0 < detect_sample < 1.0:
            # batch-local stride sample — row-level, so a hot key's count
            # scales by detect_sample (a per-KEY md5 draw would keep or
            # drop a key wholesale).  Which keys get detected may vary
            # with block layout; the OUTPUT never does (both paths emit
            # identical rows — pytest-pinned against hash_join).
            stride = max(2, int(round(1.0 / detect_sample)))

            def _stride(t: pa.Table) -> pa.Table:
                return t.take(pa.array(
                    np.arange(0, t.num_rows, stride, dtype=np.int64)))

            det = left.select_columns([on]).map_batches(
                _stride, batch_format="pyarrow")
            thr = max(2, int(hot_min_count / stride * 0.5))
        hot_rows = heavy_hitters(det, on, thr).take_all()
        hot_keys = [r[on] for r in hot_rows]
    if not hot_keys:
        if stats_out is not None:
            stats_out.update({"hot_keys": 0, "hot_left_rows": 0,
                              "exchange_frac": 1.0})
        return hash_join(left, right, on, how=how, num_buckets=num_buckets)
    # pin both sides: the split below reads each side twice; without the
    # pin the upstream parquet scan would execute per consumer (at true
    # 100-TB scale pass hot_keys explicitly and accept the re-scan instead
    # of pinning the corpus)
    left = left.materialize()
    right = right.materialize()
    hot_arr = pa.array(list(hot_keys), key_type)
    href = ray.put(hot_arr)

    def split(want_hot: bool):
        def fn(t: pa.Table) -> pa.Table:
            from .config import _worker_state

            ks = _worker_state(("skew_hot", href.hex()), lambda: ray.get(href))
            m = pc.is_in(t[on], value_set=ks)
            return t.filter(m if want_hot else pc.invert(m))

        return fn

    right_hot_parts = [
        t for t in ray.get(
            right.map_batches(split(True), batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    right_hot = (pa.concat_tables(right_hot_parts).combine_chunks()
                 if right_hot_parts else None)
    if right_hot is not None and right_hot.num_rows > broadcast_cap_rows:
        raise ValueError(
            f"right side holds {right_hot.num_rows} rows for the "
            f"{len(hot_keys)} hot keys (> cap {broadcast_cap_rows}); the "
            "broadcast contract needs a small right side — raise "
            "hot_min_count or pre-aggregate the right side")

    l_only = [c for c in left.schema().names if c != on]
    r_only = [c for c in right.schema().names if c != on]
    out_cols = [on] + l_only + r_only
    left_hot = left.map_batches(split(True), batch_format="pyarrow")
    left_cold = left.map_batches(split(False), batch_format="pyarrow")
    right_cold = right.map_batches(split(False), batch_format="pyarrow")
    if stats_out is not None:
        # measured routing: only the cold tail enters the exchange (both
        # inputs are pinned, so these counts are cheap object-store scans)
        n_left = left.count()
        n_hot = left_hot.count()
        stats_out.update({
            "hot_keys": len(hot_keys),
            "hot_left_rows": int(n_hot),
            "exchange_frac": round((n_left - n_hot) / max(n_left, 1), 4),
        })

    if right_hot is None or right_hot.num_rows == 0:
        # hot keys have no right partners: inner drops them, left
        # null-extends them — both via a left-broadcast against an empty
        # lookup only for how='left'
        if how == "inner":
            hot_out = None
        else:
            empty = pa.table({c: pa.array([], t) for c, t in zip(
                right.schema().names, right.schema().types)})
            hot_out = broadcast_join(left_hot, empty, on, how="left")
    else:
        hot_out = broadcast_join(left_hot, right_hot, on, how=how)
    cold_out = hash_join(left_cold, right_cold, on, how=how,
                         num_buckets=num_buckets)
    cold_out = cold_out.select_columns(out_cols)
    if hot_out is None:
        return cold_out
    return hot_out.select_columns(out_cols).union(cold_out)
