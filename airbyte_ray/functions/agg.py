"""Grouped-analytics operators: per-key top-N and pivoted counts.

Both follow the engine's partial-aggregate discipline (SURVEY §2.7 —
combine inside ``map_batches`` before the exchange):

* :func:`grouped_topn` — each batch first prunes to its own per-key
  top-N (so the shuffle carries ≤ N rows per key per batch, not the
  corpus), then one groupby finishes and ranks.  The per-key window-rank
  analog of the replay's ``row_number()=1`` LWW collapse.
* :func:`pivot_counts` — conditional aggregation: one int column per
  pivot value built vectorized in the combiner, summed by one tiny
  groupby.  The dbt-style "cast the enum wide" normalization shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def _route_by(key: str, num_partitions: int):
    """Batch fn appending ``__part = hash(key) % P`` — the shared routing
    step of the windowed aggregates (one hash exchange each)."""

    def fn(t: pa.Table) -> pa.Table:
        from ..pipelines.replay import stable_hash

        h = stable_hash(t[key].cast(pa.string())) % np.uint64(num_partitions)
        return t.append_column("__part", pa.array(h.astype(np.int64)))

    return fn


def _segments(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run-length segmentation of a sorted key array → (new, starts, runs).
    Length-0 input yields three empty arrays (the naive ``[[True]] +
    keys[1:] != keys[:-1]`` prepend would emit one phantom segment), so
    callers' vectorized paths stay type-stable on empty groups instead of
    needing hardcoded-dtype special cases (review finding)."""
    if len(keys) == 0:
        return np.zeros(0, bool), np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(new)
    runs = np.diff(np.concatenate([starts, [len(keys)]]))
    return new, starts, runs


def _seg_keys(t: pa.Table, col: str) -> np.ndarray:
    """Null-safe segmentation keys: the injective string encoding from
    setops.row_key.  A raw ``to_numpy`` turns a null-bearing int64 key
    into float64 NaN — and NaN != NaN makes EVERY null row its own
    segment (review finding); the float64 round-trip also merges distinct
    int64 keys above 2^53."""
    from .setops import row_key

    return row_key(t, [col]).to_numpy(zero_copy_only=False)


def _topn_prune(t: pa.Table, key: str, order_col: str, tie_col: str,
                n: int, descending: bool) -> pa.Table:
    """Keep each key's best ≤n rows of this table (vectorized run-length
    positions over a (key, order, tie) sort)."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(t, sort_keys=[
        (key, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (tie_col, "ascending"),
    ])
    t = t.take(idx)
    keys = _seg_keys(t, key)
    new = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(new)
    runs = np.diff(np.concatenate([starts, [len(keys)]]))
    pos = np.arange(len(keys)) - np.repeat(starts, runs)
    return t.filter(pa.array(pos < n))


def grouped_topn(
    ds: ray.data.Dataset, key: str, order_col: str, n: int,
    descending: bool = True, tie_col: str | None = None,
    rank_col: str = "rnk",
) -> ray.data.Dataset:
    """Per-key top-N with an explicit 1-based ``rank_col`` (ties broken by
    ``tie_col``, default the key itself — pass a unique column for
    determinism).  Equals ``row_number() OVER (PARTITION BY key ORDER BY
    order_col [DESC], tie_col) ≤ n``."""
    tie = tie_col or key

    def local(t: pa.Table) -> pa.Table:
        return _topn_prune(t, key, order_col, tie, n, descending)

    def finish(g: pa.Table) -> pa.Table:
        g = _topn_prune(g, key, order_col, tie, n, descending)
        return g.append_column(rank_col, pa.array(
            np.arange(1, g.num_rows + 1, dtype=np.int64)))

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(key)
        .map_groups(finish, batch_format="pyarrow")
    )


def running_agg(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    val_col: str,
    out: str = "run_sum",
    lag_out: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Cumulative windowed aggregate: per ``key``, ordered by ``order_col``,
    append the running sum of ``val_col`` (= ``SUM(val) OVER (PARTITION BY
    key ORDER BY order)``) and, optionally, the previous row's ``order_col``
    (= ``lag(order) OVER ...``) as ``lag_out``.

    Plan: ONE hash exchange — ``part = hash(key) % P`` routes every key's
    rows to one partition; inside the partition a single (key, order) sort
    and a SEGMENTED cumulative sum (vectorized run-length reset, no per-key
    dispatch) finish the window.  Same partitioning contract as the lake
    merge: a partition holds corpus/P rows, so P scales with the corpus.
    Sum is exact for integer ``val_col``; float sums are left-associated in
    order (bit-identical to a sequential window scan).  NULL handling is
    SQL-faithful: SUM skips NULL values, and a prefix containing zero
    non-null values yields NULL (a segmented non-null running COUNT masks
    those rows), exactly ``SUM(val) OVER (...)``.
    """

    def window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending"), (order_col, "ascending")])
        g = g.take(idx).combine_chunks()
        keys = _seg_keys(g, key)
        new, starts, runs = _segments(keys)
        v = pc.fill_null(g[val_col], 0).to_numpy(zero_copy_only=False)
        cs = np.cumsum(v)
        seg_base = cs[starts] - v[starts]  # sum strictly before each segment
        run = cs - np.repeat(seg_base, runs)
        # SQL NULL where the running window has seen zero non-null values
        nn = pc.is_valid(g[val_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        ccs = np.cumsum(nn)
        ncnt = ccs - np.repeat(ccs[starts] - nn[starts], runs)
        g = g.append_column(out, pa.array(run, mask=(ncnt == 0)))
        if lag_out is not None:
            o = g[order_col].to_numpy(zero_copy_only=False)
            prev = np.empty_like(o)
            prev[1:] = o[:-1]
            if len(o):
                prev[0] = o[0]  # masked below; any value works
            g = g.append_column(
                lag_out, pa.array(prev, mask=new)  # null at each segment head
            )
        return g

    return (
        ds.map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(window, batch_format="pyarrow")
    )


def rolling_agg(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    val_col: str,
    preceding: int,
    out: str = "roll_sum",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Moving-window sum: per ``key``, ordered by ``order_col``, the sum of
    the current row and the ``preceding`` rows before it (= ``SUM(val)
    OVER (PARTITION BY key ORDER BY order ROWS BETWEEN preceding PRECEDING
    AND CURRENT ROW)``).  Same one-exchange plan as :func:`running_agg`;
    the window is two reads of a zero-prepended segmented cumsum —
    ``Z[i+1] - Z[max(i-preceding, seg_start)]`` — so cost is O(rows)
    regardless of window width.  NULL handling is SQL-faithful: SUM skips
    NULL values, and a window containing zero non-null values yields NULL
    (the same two-read trick over a non-null count cumsum masks those
    rows); same contract as :func:`running_agg`."""

    def window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending"), (order_col, "ascending")])
        g = g.take(idx).combine_chunks()
        keys = _seg_keys(g, key)
        new, starts, runs = _segments(keys)
        v = pc.fill_null(g[val_col], 0).to_numpy(zero_copy_only=False)
        z = np.concatenate([[v.dtype.type(0)], np.cumsum(v)])  # Z[i] = sum v[:i]
        i = np.arange(len(keys))
        lo = np.maximum(i - preceding, np.repeat(starts, runs))
        nn = pc.is_valid(g[val_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        zc = np.concatenate([[0], np.cumsum(nn)])
        wcnt = zc[i + 1] - zc[lo]  # non-null values inside each window
        return g.append_column(out, pa.array(z[i + 1] - z[lo], mask=(wcnt == 0)))

    return (
        ds.map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(window, batch_format="pyarrow")
    )


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_col: str,
    sum_out: str = "sum_val",
    count_out: str = "n",
    num_partitions: int = 32,
    sets: list[list[str]] | None = None,
) -> ray.data.Dataset:
    """ROLLUP grouping sets: one row per group at EVERY prefix level of
    ``keys`` — (k1..kn), (k1..kn-1), …, () — like SQL ``GROUP BY ROLLUP``.
    ``gid`` is the SQL ``GROUPING()`` bitmask (bit set ⇔ that key is
    aggregated out, first key = most-significant bit).  Pass ``sets``
    (a list of key subsets) for explicit ``GROUPING SETS``;
    :func:`cube_agg` generates the full-powerset CUBE.

    Plan: the per-batch combiner partial-aggregates ALL levels at once, so
    the single exchange carries ≤ Σ|level groups| rows per batch — the
    corpus never shuffles.  The global fold groups on a composite string
    key (gid + level key values; aggregated-out columns are NULL)."""
    n = len(keys)
    if sets is None:
        sets = [keys[:L] for L in range(n + 1)]
    levels = [
        (list(s), sum((1 << (n - 1 - i))
                      for i, k in enumerate(keys) if k not in s))
        for s in sets
    ]

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for lv_keys, gid in levels:
            sel = t.select(lv_keys + [sum_col])
            if lv_keys:
                # count is COUNT(*) (mode="all") — Arrow's default "count"
                # skips nulls and would diverge from SQL COUNT(*) whenever
                # sum_col has nulls (review finding)
                g = pa.TableGroupBy(sel, lv_keys).aggregate([
                    (sum_col, "sum"),
                    (sum_col, "count", pc.CountOptions(mode="all")),
                ])
                s, c = g[f"{sum_col}_sum"], g[f"{sum_col}_count"].cast(pa.int64())
                m = g.num_rows
            else:
                # keep SQL NULL for an all-null (or empty) sum — no `or 0`
                s = pa.array([pc.sum(sel[sum_col]).as_py()], sel[sum_col].type)
                c = pa.array([sel.num_rows], pa.int64())
                g, m = None, 1
            cols = {}
            for k in keys:
                cols[k] = g[k] if g is not None and k in lv_keys else pa.nulls(m, t[k].type)
            cols["gid"] = pa.array(np.full(m, gid, np.int64))
            cols[sum_out] = s
            cols[count_out] = c
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    def with_gk(t: pa.Table) -> pa.Table:
        # injective composite key shared with setops (review finding: the
        # old sentinel-join collided on values containing the separator)
        from .setops import row_key

        return t.append_column("__gk", row_key(t, ["gid"] + keys))

    def fold(g: pa.Table) -> pa.Table:
        # Arrow-native group-fold per hash partition — one vectorized
        # aggregate, not one Python call per output group (review finding)
        gb = pa.TableGroupBy(g.drop_columns(["__part"]), "__gk").aggregate(
            [(k, "first") for k in keys]
            + [("gid", "first"), (sum_out, "sum"), (count_out, "sum")]
        )
        cols = {k: gb[f"{k}_first"] for k in keys}
        cols["gid"] = gb["gid_first"]
        cols[sum_out] = gb[f"{sum_out}_sum"]
        cols[count_out] = gb[f"{count_out}_sum"].cast(pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(with_gk, batch_format="pyarrow")
        .map_batches(_route_by("__gk", num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )


def grouped_stats(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-key statistical moments with EXACT integer partials: each batch
    combines to (key, n, s=Σx, ssq=Σx²) in int64 — associative, so the
    parallel fold is order-independent and bit-exact — then mean and
    sample variance/stddev derive from the folded moments in ONE fixed
    IEEE expression (``(ssq − s·s/n)/(n−1)``, all-double), the same tree a
    SQL oracle can spell out.  This is what makes a float statistic
    hash-comparable across engines: floats only ever appear AFTER the
    exact integer reduction.  Requires an integer ``col`` (put money on
    the cents grid first); raises otherwise.  n==1 keys get NULL
    var/std (SQL var_samp semantics)."""

    def partial(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(col).type):
            raise TypeError(
                f"grouped_stats needs an integer column (got "
                f"{t.schema.field(col).type}) — exact moments are the "
                "whole point; quantize first")
        sel = pa.table({key: t[key], col: t[col].cast(pa.int64())})
        sq = pc.multiply(sel[col], sel[col])
        sel = sel.append_column("__sq", sq)
        g = pa.TableGroupBy(sel, key).aggregate([
            (col, "sum"),
            ("__sq", "sum"),
            (col, "count", pc.CountOptions(mode="only_valid")),
        ])
        return pa.table({
            key: g[key],
            "n": g[f"{col}_count"].cast(pa.int64()),
            "s": g[f"{col}_sum"].cast(pa.int64()),
            "ssq": g["__sq_sum"].cast(pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(g.drop_columns(["__part"]), key).aggregate([
            ("n", "sum"), ("s", "sum"), ("ssq", "sum")
        ])
        # keys whose values were ALL null carry n=0 — omit them (the SQL
        # contract of a WHERE col IS NOT NULL pre-filter)
        gb = gb.filter(pc.greater(gb["n_sum"], 0))
        n = gb["n_sum"].cast(pa.int64()).to_numpy()
        s = gb["s_sum"].cast(pa.int64()).to_numpy()
        ssq = gb["ssq_sum"].cast(pa.int64()).to_numpy()
        nd = n.astype(np.float64)
        sd = s.astype(np.float64)
        mean = sd / nd
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ssq.astype(np.float64) - sd * sd / nd) / (nd - 1.0)
            var = np.maximum(var, 0.0)  # guard −0.0/−ulp from cancellation
            std = np.sqrt(var)
        single = n <= 1
        return pa.table({
            key: gb[key],
            "n": pa.array(n),
            "s": pa.array(s),
            "ssq": pa.array(ssq),
            "mean": pa.array(mean),
            "var_samp": pa.array(var, mask=single),
            "std_samp": pa.array(std, mask=single),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )


def grouped_corr(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-key Pearson correlation with EXACT integer partials: each
    batch combines to (key, n, Σx, Σy, Σx², Σy², Σxy) in int64 — the
    parallel fold is order-independent — and r derives once from the
    folded moments in a fixed all-double expression
    (``(n·sxy − sx·sy) / (√(n·sxx − sx²)·√(n·syy − sy²))``), the tree a
    SQL oracle replicates term for term.  Integer columns required (the
    exactness contract of :func:`grouped_stats`).  Rows where either
    side is NULL are excluded (SQL corr semantics); n ≤ 1 or a constant
    series (zero denominator) yields NULL."""

    def partial(t: pa.Table) -> pa.Table:
        for c in (x, y):
            if not pa.types.is_integer(t.schema.field(c).type):
                raise TypeError(
                    f"grouped_corr needs integer columns (got "
                    f"{t.schema.field(c).type} for {c!r}) — quantize first")
        ok = pc.and_(pc.is_valid(t[x]), pc.is_valid(t[y]))
        t = t.filter(ok)
        xv = t[x].cast(pa.int64())
        yv = t[y].cast(pa.int64())
        sel = pa.table({
            key: t[key], "x": xv, "y": yv,
            "xx": pc.multiply(xv, xv),
            "yy": pc.multiply(yv, yv),
            "xy": pc.multiply(xv, yv),
        })
        g = pa.TableGroupBy(sel, key).aggregate([
            ("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"),
            ("xy", "sum"), ("x", "count"),
        ])
        return pa.table({
            key: g[key],
            "n": g["x_count"].cast(pa.int64()),
            "sx": g["x_sum"].cast(pa.int64()),
            "sy": g["y_sum"].cast(pa.int64()),
            "sxx": g["xx_sum"].cast(pa.int64()),
            "syy": g["yy_sum"].cast(pa.int64()),
            "sxy": g["xy_sum"].cast(pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(g.drop_columns(["__part"]), key).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        )
        gb = gb.filter(pc.greater(gb["n_sum"], 0))
        n = gb["n_sum"].cast(pa.int64()).to_numpy()
        nd = n.astype(np.float64)
        sx = gb["sx_sum"].cast(pa.int64()).to_numpy().astype(np.float64)
        sy = gb["sy_sum"].cast(pa.int64()).to_numpy().astype(np.float64)
        sxx = gb["sxx_sum"].cast(pa.int64()).to_numpy().astype(np.float64)
        syy = gb["syy_sum"].cast(pa.int64()).to_numpy().astype(np.float64)
        sxy = gb["sxy_sum"].cast(pa.int64()).to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.sqrt(nd * sxx - sx * sx) * np.sqrt(nd * syy - sy * sy)
            r = (nd * sxy - sx * sy) / denom
        bad = (n <= 1) | ~np.isfinite(r)
        return pa.table({
            key: gb[key],
            "n": pa.array(n),
            "corr": pa.array(np.where(bad, 0.0, r), mask=bad),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )


def histogram(
    ds: ray.data.Dataset,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> ray.data.Dataset:
    """Fixed-bin histogram over ``[lo, hi)``: per-batch ``bincount``
    partials (≤ nbins rows per batch through the exchange, never the
    corpus), one tiny groupby-sum fold.  Bin = ``floor((v − lo)/width)``
    with ``width = (hi − lo)/nbins`` — both computed in double with the
    exact expression a SQL oracle mirrors, so bin edges are IEEE-
    identical on both sides.  Rows are range-filtered on the VALUE
    (``lo <= v < hi``) and the computed bin clamped to ``nbins − 1``:
    when ``width`` isn't exactly representable a value just below ``hi``
    can floor to ``nbins`` — the SQL mirror is
    ``LEAST(floor((v-lo)/width), nbins-1)`` over the same WHERE range.
    Out-of-range and NULL values are dropped; empty bins are omitted
    (join against a bin spine if you need zeros)."""
    width = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        # range-filter on the VALUE (the SQL predicate lo <= v < hi), then
        # clamp the computed bin: when (hi-lo)/nbins isn't exactly
        # representable, a v just below hi can land on bin == nbins and a
        # bin-filter would drop a row the oracle keeps (advisory finding)
        v = v[(v >= lo) & (v < hi)]
        b = np.floor((v - lo) / width)
        b = np.minimum(b, nbins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(counts)
        return pa.table({
            "bin": pa.array(nz.astype(np.int64)),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def cube_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_col: str,
    **kwargs,
) -> ray.data.Dataset:
    """CUBE grouping sets: one row per group at EVERY subset of ``keys``
    — SQL ``GROUP BY CUBE``.  Same partial-per-batch single-exchange
    plan as :func:`rollup_agg`; 2^n levels (n is small by construction —
    each extra key doubles combiner output width, never the shuffle of
    the corpus)."""
    n = len(keys)
    sets = [
        [k for i, k in enumerate(keys) if not (b >> (n - 1 - i)) & 1]
        for b in range(1 << n)
    ]
    return rollup_agg(ds, keys, sum_col, sets=sets, **kwargs)


def window_ranks(
    ds: ray.data.Dataset,
    key: str,
    val_col: str,
    tie_col: str,
    ntile: int = 4,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """The SQL ranking-window family in ONE segmented pass per partition:
    ``rn`` = row_number() ordered by (val, tie), ``dr`` = dense_rank()
    ordered by val alone, ``nt`` = ntile(n) over the (val, tie) order with
    SQL's remainder rule (the first ``count % n`` buckets get one extra
    row).  Same one-exchange plan as the other windowed aggregates."""

    def kernel(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        idx = pc.sort_indices(g, sort_keys=[
            (key, "ascending"), (val_col, "ascending"), (tie_col, "ascending")
        ])
        g = g.take(idx).combine_chunks()
        new, starts, runs = _segments(_seg_keys(g, key))
        pos = np.arange(g.num_rows) - np.repeat(starts, runs)
        rn = pos + 1
        # dense_rank: segment-reset cumsum of value-change flags (null-safe
        # value equality via the same injective encoding as the keys)
        vals = _seg_keys(g, val_col)
        vchange = np.concatenate([[True], vals[1:] != vals[:-1]]) | new
        cum = np.cumsum(vchange)
        dr = cum - np.repeat(cum[starts] - 1, runs)
        # ntile: first (c % n) buckets hold ceil(c/n) rows, the rest floor
        c = np.repeat(runs, runs)
        small = c // ntile
        big = c % ntile
        cut = big * (small + 1)
        small_safe = np.maximum(small, 1)  # else-branch guard when c < n
        nt = np.where(pos < cut, pos // (small + 1), big + (pos - cut) // small_safe) + 1
        g = g.append_column("rn", pa.array(rn.astype(np.int64)))
        g = g.append_column("dr", pa.array(dr.astype(np.int64)))
        return g.append_column("nt", pa.array(nt.astype(np.int64)))

    return (
        ds.map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def window_nav(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    val_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """The SQL navigation-window family in ONE segmented pass per
    partition, all over ``(PARTITION BY key ORDER BY order_col)``:
    ``lag_val`` / ``lead_val`` (NULL at segment edges), ``first_val`` /
    ``last_val`` over the FULL partition frame (SQL's last_value needs an
    explicit ``ROWS BETWEEN … UNBOUNDED FOLLOWING`` for this), and ``pr``
    = percent_rank().  Value columns keep their Arrow type (shifts are a
    null-masked ``take``, not a numpy cast).  percent_rank is computed
    from row position, which equals SQL rank() when ``order_col`` is
    unique per key (the usual event-id case); with ties SQL's rank()
    would repeat — documented contract.  Same one-exchange plan as the
    other windowed aggregates."""

    def kernel(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending"), (order_col, "ascending")])
        g = g.take(idx).combine_chunks()
        n = g.num_rows
        new, starts, runs = _segments(_seg_keys(g, key))
        v = g[val_col]
        pos_all = np.arange(n, dtype=np.int64)
        tail = np.concatenate([new[1:], [True]]) if n else new
        lag_v = pc.take(v, pa.array(pos_all - 1, mask=new))
        lead_v = pc.take(v, pa.array(np.where(tail, 0, pos_all + 1), mask=tail))
        first_v = pc.take(v, pa.array(np.repeat(starts, runs)))
        last_v = pc.take(v, pa.array(np.repeat(starts + runs - 1, runs)))
        pos = pos_all - np.repeat(starts, runs)
        denom = np.repeat(np.maximum(runs - 1, 1), runs)
        pr = pos / denom  # runs==1 ⇒ pos 0 ⇒ 0.0, SQL's single-row value
        g = g.append_column("lag_val", lag_v)
        g = g.append_column("lead_val", lead_v)
        g = g.append_column("first_val", first_v)
        g = g.append_column("last_val", last_v)
        return g.append_column("pr", pa.array(pr.astype(np.float64)))

    return (
        ds.map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def grouped_quantiles(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    qs: list[float],
    num_partitions: int = 32,
    interpolation: str = "disc",
) -> ray.data.Dataset:
    """EXACT per-key quantiles.  ``interpolation="disc"`` (default) is
    DuckDB ``quantile_disc``: the element at sorted index
    ``max(ceil(n·q)-1, 0)`` (the rank rule verified in
    :func:`airbyte_ray.functions.sketch.exact_quantiles`);
    ``"linear"`` is ``quantile_cont``: lerp between the two elements
    around rank ``(n−1)·q`` — hash-exact against ANY engine's expression
    tree when ``col`` is integer and q is a binary fraction (.25/.5/.75…):
    every term of the interpolation is exactly representable, so
    mathematically-equal trees produce the identical double.  ``value``
    is ``col``'s type for disc, float64 for linear.  One hash exchange;
    inside each partition a single (key, col) sort and a vectorized
    per-segment rank gather for ALL qs at once.  NULL values are skipped
    (SQL semantics); a key whose values are all NULL is omitted (SQL
    would emit it with a NULL quantile — documented divergence, avoid by
    pre-filtering)."""
    if not qs:
        # fail fast — an empty list otherwise surfaces as an opaque
        # np.concatenate error inside a Ray worker
        raise ValueError("qs must be non-empty")
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(f"quantiles must be in [0, 1], got {bad}")
    if interpolation not in ("disc", "linear"):
        raise ValueError(f"interpolation must be disc|linear, got {interpolation!r}")

    def kernel(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"]).filter(pc.is_valid(g[col]))
        out_schema = pa.schema([
            (key, g.schema.field(key).type),
            ("q", pa.float64()),
            ("value", pa.float64() if interpolation == "linear"
             else g.schema.field(col).type),
        ])
        if g.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending"), (col, "ascending")])
        g = g.take(idx).combine_chunks()
        keys = _seg_keys(g, key)
        _, starts, runs = _segments(keys)
        if interpolation == "linear":
            vals = g[col].to_numpy(zero_copy_only=False).astype(np.float64)
            out_v, q_col, key_picks = [], [], []
            for q in qs:
                pos = (runs - 1) * q
                lo = np.floor(pos).astype(np.int64)
                hi = np.minimum(lo + 1, runs - 1)
                frac = pos - lo
                vlo = vals[starts + lo]
                vhi = vals[starts + hi]
                out_v.append(vlo + (vhi - vlo) * frac)
                q_col.append(np.full(len(starts), q, np.float64))
                key_picks.append(starts)
            return pa.table({
                key: g[key].take(pa.array(np.concatenate(key_picks))),
                "q": pa.array(np.concatenate(q_col)),
                "value": pa.array(np.concatenate(out_v)),
            })
        picks, q_col = [], []
        for q in qs:
            r = np.maximum(np.ceil(runs * q).astype(np.int64) - 1, 0)
            picks.append(starts + r)
            q_col.append(np.full(len(starts), q, np.float64))
        pick = pa.array(np.concatenate(picks))
        key_pick = pa.array(np.concatenate([starts] * len(qs)))
        return pa.table({
            key: g[key].take(key_pick),
            "q": pa.array(np.concatenate(q_col)),
            "value": g[col].take(pick),
        })

    return (
        ds.map_batches(_route_by(key, num_partitions), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def pivot_counts(
    ds: ray.data.Dataset, key: str, pivot_col: str, values: list[str],
) -> ray.data.Dataset:
    """One row per key with an int64 count column per pivot value —
    conditional aggregation with a per-batch combiner (the exchange sees
    ≤ |keys| rows per batch, each |values|+1 wide)."""

    def combine(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        for v in values:
            cols[v] = pc.equal(t[pivot_col], v).cast(pa.int64())
        wide = pa.table(cols)
        g = pa.TableGroupBy(wide, key).aggregate([(v, "sum") for v in values])
        # rename by NAME (aggregate emits '<v>_sum'), not position — pyarrow
        # has moved group keys between first and last across versions, and a
        # positional rename would silently shift every count column
        picked = {key: g[key]}
        for v in values:
            picked[v] = g[f"{v}_sum"]
        return pa.table(picked)

    out = ds.map_batches(combine, batch_format="pyarrow").groupby(key).aggregate(
        *[Sum(v, alias_name=f"_{v}") for v in values]
    )
    return out.map_batches(
        lambda t: pa.table(
            {key: t[key], **{v: t[f"_{v}"] for v in values}}
        ),
        batch_format="pyarrow",
    )
