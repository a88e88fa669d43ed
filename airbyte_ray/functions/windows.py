"""Event-time windowed aggregates over an ordered, keyed log.

Ray Data has no native event-time windows (SURVEY §2.11 / guide): windows
are expressed as ``groupby(key).map_groups`` over the per-key group sorted
by timestamp (tumbling/session), or as a window-id explosion +
groupby-aggregate (sliding).  Ordering assumption: each (key) group fits a
task and is sorted in-task; the shuffle is the one groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def tumbling(ds: ray.data.Dataset, key: str, ts: str, width_s: int) -> ray.data.Dataset:
    """Count per (key, window-start-second) for tumbling windows — window id
    computed vectorized per batch, then one small groupby-aggregate."""

    def win(t: pa.Table) -> pa.Table:
        us = t[ts].cast(pa.int64()).to_numpy()
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
        us = t[ts].cast(pa.int64()).to_numpy()
        base = us // (slide_s * 1_000_000)
        parts = []
        for j in range(k):
            w = ((base - j) * slide_s).astype(np.int64)
            parts.append(t.select([key]).append_column("w_start", pa.array(w)))
        return pa.concat_tables(parts)

    return ds.map_batches(explode, batch_format="pyarrow").groupby([key, "w_start"]).aggregate(
        Count(alias_name="n")
    )


def session(ds: ray.data.Dataset, key: str, ts: str, gap_s: int) -> ray.data.Dataset:
    """Gap-based session windows: per key, a new session starts when the
    inter-event gap exceeds ``gap_s``.  Returns one row per session:
    (key, session_id starting at 1, s_start, s_end, n)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable")
        gaps = g[ts].diff()
        brk = (gaps.isna()) | (gaps > pd.Timedelta(seconds=gap_s))
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            s_start=(ts, "min"), s_end=(ts, "max"), n=(ts, "size")
        ).reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        out.insert(1, "session_id", np.arange(1, len(out) + 1, dtype=np.int64))
        return out

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")
