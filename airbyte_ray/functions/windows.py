"""Event-time windowed aggregates over an ordered, keyed log.

Ray Data has no native event-time windows (SURVEY §2.11 / guide): windows
are expressed as ``groupby(key).map_groups`` over the per-key group sorted
by timestamp (tumbling/session), or as a window-id explosion +
groupby-aggregate (sliding).  Ordering assumption: each (key) group fits a
task and is sorted in-task; the shuffle is the one groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count


def _epoch_us(col) -> np.ndarray:
    """Column → epoch-microsecond int64, resolution-aware: timestamp columns
    cast by UNIT first (a raw int64 cast of timestamp[ns] silently treated
    nanoseconds as microseconds — review finding); integer columns are
    assumed to already be epoch-us."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.timestamp("us", tz=t.tz))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling(ds: ray.data.Dataset, key: str, ts: str, width_s: int) -> ray.data.Dataset:
    """Count per (key, window-start-second) for tumbling windows — window id
    computed vectorized per batch, then one small groupby-aggregate."""

    def win(t: pa.Table) -> pa.Table:
        us = _epoch_us(t[ts])
        w = (us // (width_s * 1_000_000)) * width_s
        return t.select([key]).append_column("w_start", pa.array(w.astype(np.int64)))

    return ds.map_batches(win, batch_format="pyarrow").groupby([key, "w_start"]).aggregate(
        Count(alias_name="n")
    )


def sliding(
    ds: ray.data.Dataset, key: str, ts: str, width_s: int, slide_s: int
) -> ray.data.Dataset:
    """Count per (key, window) for sliding windows: each event explodes to
    its ``width/slide`` containing windows (the standard reshuffle-free
    explosion), then one groupby-aggregate over the partials."""
    k = width_s // slide_s
    assert width_s % slide_s == 0, "width must be a multiple of slide"

    def explode(t: pa.Table) -> pa.Table:
        us = _epoch_us(t[ts])
        base = us // (slide_s * 1_000_000)
        parts = []
        for j in range(k):
            w = ((base - j) * slide_s).astype(np.int64)
            parts.append(t.select([key]).append_column("w_start", pa.array(w)))
        return pa.concat_tables(parts)

    return ds.map_batches(explode, batch_format="pyarrow").groupby([key, "w_start"]).aggregate(
        Count(alias_name="n")
    )


def session(
    ds: ray.data.Dataset, key: str, ts: str, gap_s: int, bucket_s: int | None = None
) -> ray.data.Dataset:
    """Gap-based session windows: per key, a new session starts when the
    inter-event gap exceeds ``gap_s``.  Returns one row per session:
    (key, session_id starting at 1, s_start, s_end, n).

    ``bucket_s=None`` runs the single-pass plan (one group per key — fine
    while every key's history fits a task).  ``bucket_s`` set runs the
    SCALE plan (the round-1 100-TB flag): events group by
    ``(key, coarse time bucket)`` so a hot key's history splits across
    tasks; each bucket emits *partial* sessions vectorized, and a second,
    tiny per-key pass stitches partials whose boundary gap ≤ ``gap_s`` —
    the standard interval-merge identity reconstructs the exact global
    sessions (pytest-equivalence-verified).  Stitch groups hold one row per
    partial session, never raw events, so the per-key group is bounded by
    the session count regardless of event volume."""
    gap_us = gap_s * 1_000_000
    sch = ds.schema()
    ts_type = sch.types[sch.names.index(ts)]

    def from_us(vals: np.ndarray) -> pa.Array:
        # The int64 values are epoch-MICROseconds.  Casting them straight
        # to timestamp[ns]/[ms]/[s] would reinterpret in the wrong unit
        # (advice finding) — so go via timestamp[us] first, then cast to
        # the original column type (unit conversion, not reinterpret).
        a = pa.array(vals)
        if pa.types.is_timestamp(ts_type):
            a = a.cast(pa.timestamp("us", tz=ts_type.tz))
        return a.cast(ts_type)

    if bucket_s is None:
        # single-pass plan, same segmented-numpy idiom as the bucketed
        # partials (sort → gap-break → cumsum segments) — no pandas
        def sessions(g: pa.Table) -> pa.Table:
            g = g.take(pc.sort_indices(g, sort_keys=[(ts, "ascending")]))
            us = _epoch_us(g[ts])
            brk = np.r_[True, np.diff(us) > gap_us]
            starts = np.flatnonzero(brk)
            ends = np.r_[starts[1:], len(us)] - 1
            k = len(starts)
            return pa.table({
                key: g[key].slice(0, 1).combine_chunks().take(
                    pa.array(np.zeros(k, np.int64))
                ),
                "session_id": pa.array(np.arange(1, k + 1, dtype=np.int64)),
                "s_start": from_us(us[starts]),
                "s_end": from_us(us[ends]),
                "n": pa.array((ends - starts + 1).astype(np.int64)),
            })

        return ds.groupby(key).map_groups(sessions, batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        b = (_epoch_us(t[ts]) // (bucket_s * 1_000_000)).astype(np.int64)
        return t.select([key, ts]).append_column("__bucket", pa.array(b))

    def partial_sessions(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(ts, "ascending")]))
        us = _epoch_us(g[ts])
        brk = np.r_[True, np.diff(us) > gap_us]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(us)] - 1
        n = (ends - starts + 1).astype(np.int64)
        return pa.table(
            {
                key: g[key].slice(0, 1).combine_chunks().take(
                    pa.array(np.zeros(len(starts), np.int64))
                ),
                "s_start_us": pa.array(us[starts]),
                "s_end_us": pa.array(us[ends]),
                "n": pa.array(n),
            }
        )

    def stitch(g: pa.Table) -> pa.Table:
        g = g.take(pa.compute.sort_indices(g, sort_keys=[("s_start_us", "ascending")]))
        s0 = g["s_start_us"].to_numpy()
        e0 = g["s_end_us"].to_numpy()
        n0 = g["n"].to_numpy()
        brk = np.r_[True, (s0[1:] - e0[:-1]) > gap_us]
        starts = np.flatnonzero(brk)
        stops = np.r_[starts[1:], len(s0)]
        cs = np.r_[0, np.cumsum(n0)]
        k = len(starts)
        return pa.table(
            {
                key: g[key].slice(0, 1).combine_chunks().take(
                    pa.array(np.zeros(k, np.int64))
                ),
                "session_id": pa.array(np.arange(1, k + 1, dtype=np.int64)),
                "s_start": from_us(s0[starts]),
                "s_end": from_us(e0[stops - 1]),
                "n": pa.array(cs[stops] - cs[starts]),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__bucket"])
        .map_groups(partial_sessions, batch_format="pyarrow")
        .groupby(key)
        .map_groups(stitch, batch_format="pyarrow")
    )
