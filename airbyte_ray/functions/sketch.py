"""Streaming sketches: count-min (heavy hitters) and HyperLogLog.

The brief's "novel sketch" operator class: sublinear summaries a 100 TB
scan can afford where an exact groupby cannot.  Both sketches are LINEAR
(mergeable by elementwise sum / max), so the distributed plan is: one
``map_batches`` pass emits a partial sketch per block, a small bucketed
``groupby`` folds partials in parallel, and the driver folds the last
≤ ``merge_groups`` blobs — driver traffic is O(merge_groups × sketch
size), never O(blocks).

``heavy_hitters`` composes the sketch with an EXACT verification pass:
count-min only ever overestimates, so "estimate ≥ threshold" has no false
negatives; filtering the corpus to those candidate keys and exact-counting
just them yields the exact answer while the expensive groupby touches only
candidate rows.  That composition is what makes the operator
SQL-oracle-checkable (plain GROUP BY … HAVING) despite the sketch.

Public algorithms: Cormode & Muthukrishnan 2005 (count-min); Flajolet et
al. 2007 (HyperLogLog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives a second, independent-enough hash
    stream from the first.  Needed because ``pd.util.hash_array`` IGNORES
    ``hash_key`` for numeric dtypes (verified: int64 arrays hash
    identically under different keys), so keying SipHash twice silently
    collapses double hashing for the driver's int64 key columns."""
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64, copy=True)
        h += np.uint64(0x9E3779B97F4A7C15)  # stream increment: 0 must not fix
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _two_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two 64-bit hash streams per key (h_i = h1 + i*h2 —
    Kirsch–Mitzenmacher double hashing); h2 = splitmix64(h1) so the
    streams stay distinct for EVERY input dtype."""
    import pandas as pd

    h1 = pd.util.hash_array(keys)
    return h1, _mix64(h1)


class CountMinSketch:
    """(d, w) count-min sketch over arbitrary key arrays; vectorized
    update/query; linear merge."""

    def __init__(self, d: int = 4, w: int = 1 << 15):
        self.d, self.w = d, w
        self.counts = np.zeros((d, w), np.int64)

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _two_hashes(keys)
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.w)).astype(np.int64)

    def update(self, keys: np.ndarray) -> None:
        cols = self._cols(keys)
        for r in range(self.d):  # d is tiny (4-6); the inner op is vectorized
            np.add.at(self.counts[r], cols[r], 1)

    def query(self, keys: np.ndarray) -> np.ndarray:
        cols = self._cols(keys)
        return np.min(
            np.stack([self.counts[r][cols[r]] for r in range(self.d)]), axis=0
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, d: int, w: int) -> "CountMinSketch":
        s = cls(d, w)
        s.counts = np.frombuffer(b, np.int64).reshape(d, w).copy()
        return s


def _key_np(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return a.to_numpy(zero_copy_only=False)


def _fold_blobs(
    ds: ray.data.Dataset,
    col: str,
    make_blob,
    new_acc,
    absorb,
    merge_groups: int = 32,
) -> np.ndarray:
    """Shared scaffold for every commutative-monoid sketch build (CMS, HLL,
    Bloom): one partial blob per block, crc32-bucketed parallel fold, then
    the driver absorbs ≤ ``merge_groups`` blobs.  ``make_blob(table) ->
    bytes``; ``new_acc() -> ndarray``; ``absorb(acc, blob_bytes)`` in-place.
    Factored from three hand-rolled copies (review finding) so the fold
    plan has one implementation to fix/tune."""
    import zlib

    def partial(t: pa.Table) -> pa.Table:
        blob = make_blob(t)
        g = zlib.crc32(blob) % merge_groups  # spread partials across folders
        return pa.table({"g": pa.array([g], pa.int64()),
                         "blob": pa.array([blob], pa.binary())})

    def fold(grp: pa.Table) -> pa.Table:
        acc = new_acc()
        for b in grp["blob"].to_pylist():
            absorb(acc, b)
        return pa.table({"blob": pa.array([acc.tobytes()], pa.binary())})

    folded = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    acc = new_acc()
    for row in folded.take_all():  # ≤ merge_groups blobs
        absorb(acc, row["blob"])
    return acc


def build_cms(
    ds: ray.data.Dataset, col: str, d: int = 4, w: int = 1 << 15,
    merge_groups: int = 32,
) -> CountMinSketch:
    """One pass + bucketed parallel merge → one sketch on the driver."""
    def make_blob(t: pa.Table) -> bytes:
        s = CountMinSketch(d, w)
        if t.num_rows:
            s.update(_key_np(t[col]))
        return s.to_bytes()

    acc = _fold_blobs(
        ds, col, make_blob,
        new_acc=lambda: np.zeros(d * w, np.int64),
        absorb=lambda a, b: np.add(a, np.frombuffer(b, np.int64), out=a),
        merge_groups=merge_groups,
    )
    out = CountMinSketch(d, w)
    out.counts += acc.reshape(d, w)
    return out


def heavy_hitters(
    ds: ray.data.Dataset, col: str, min_count: int,
    d: int = 4, w: int = 1 << 15, out_count: str = "n",
) -> ray.data.Dataset:
    """EXACT keys with frequency ≥ ``min_count``, found with a sketch:

    1. build a count-min over the column (one pass, parallel merge);
    2. broadcast it; filter the corpus to rows whose key ESTIMATE ≥
       threshold — no false negatives, so every true heavy hitter
       survives, and only candidate rows (≪ corpus for a selective
       threshold) reach the exchange;
    3. exact groupby-count over the candidates, keep ``≥ min_count`` —
       false positives die here.

    Output (col, n) is exactly ``GROUP BY col HAVING count(*) ≥ k``."""
    import ray

    from ..config import _worker_state

    # pin the (projected) input once: the sketch pass and the candidate
    # pass must see the SAME rows — an unpinned lazy plan would execute
    # upstream twice and break the no-false-negative guarantee if upstream
    # is nondeterministic (same discipline as percentile_filter)
    ds = ds.select_columns([col]).materialize()
    sk = build_cms(ds, col, d, w)
    sref = ray.put(sk.to_bytes())

    def candidates(t: pa.Table) -> pa.Table:
        s = _worker_state(("cms", sref.hex(), d, w),
                          lambda: CountMinSketch.from_bytes(ray.get(sref), d, w))
        if t.num_rows == 0:
            return t
        est = s.query(_key_np(t[col]))
        return t.filter(pa.array(est >= min_count))

    cand = ds.select_columns([col]).map_batches(candidates, batch_format="pyarrow")
    counted = cand.groupby(col).count()

    def having(t: pa.Table) -> pa.Table:
        # Ray's count() names the column "count()"
        t = pa.table({col: t[col], out_count: t["count()"]})
        return t.filter(pc.greater_equal(t[out_count], min_count))

    return counted.map_batches(having, batch_format="pyarrow")


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float]
) -> pa.Table:
    """EXACT discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    element at sorted index ``max(ceil(n·q)-1, 0)``), computed distributed:
    one range-partitioned sort, the zero-exchange ``global_index`` prefix
    scan, and an is-in filter for the ≤ len(qs) target ranks — only those
    rows reach the driver.  For a quick percentile on 100 TB prefer a
    sampled approximation; this is the exact path (percentile CUTOFFS for
    quality filtering need exactness to be reproducible)."""
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        # validate before paying for the distributed sort — an out-of-range
        # q otherwise surfaces as an opaque KeyError after the full pass
        raise ValueError(f"quantiles must be in [0, 1], got {bad}")
    from .pack import global_index

    filtered = ds.select_columns([col]).map_batches(
        lambda t: t.filter(pc.is_valid(t[col])), batch_format="pyarrow"
    ).materialize()
    n = filtered.count()
    if n == 0:
        # match the SQL shape: one row per q, value NULL
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    import math

    # quantile_disc rank: verified against DuckDB for n=1..10 across q —
    # NOT floor((n-1)q) (diverges whenever n·q is non-integral, e.g.
    # n=997 q=0.9: 896 vs the correct 897)
    rank_for = {q: max(math.ceil(n * q) - 1, 0) for q in qs}
    ranks = sorted(set(rank_for.values()))
    idxd = global_index(filtered.sort(col), out="__rank")
    rset = pa.array(ranks, pa.int64())
    picked = idxd.map_batches(
        lambda t: t.filter(pc.is_in(t["__rank"], value_set=rset)),
        batch_format="pyarrow",
    ).take_all()
    by_rank = {r["__rank"]: r[col] for r in picked}
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value": pa.array([by_rank[rank_for[q]] for q in qs]),
    })


def percentile_filter(
    ds: ray.data.Dataset, col: str, q: float, keep: str = "ge",
) -> ray.data.Dataset:
    """Percentile-gated filter: compute the exact q-quantile of ``col``
    (one distributed pass), broadcast the scalar cutoff, filter in-task —
    the reproducible "drop the bottom decile by token count" quality gate.
    ``keep``: 'ge' keeps rows ≥ cutoff, 'le' keeps ≤."""
    if keep not in ("ge", "le"):
        raise ValueError(keep)
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    # pin the input once: the quantile pass and the filter pass must see
    # the SAME rows, and without this the whole upstream plan re-executes
    # for the second consumer (pre-prune columns before calling at scale)
    ds = ds.materialize()
    cut = exact_quantiles(ds, col, [q])["value"][0].as_py()
    if cut is None:
        # no non-null values: `col >= NULL` is false for every row in the
        # SQL semantics this operator mirrors — keep nothing
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    op = pc.greater_equal if keep == "ge" else pc.less_equal

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(op(t[col], cut))

    return ds.map_batches(fn, batch_format="pyarrow")


class HyperLogLog:
    """HLL distinct-count sketch (2^p registers, elementwise-max merge).
    Standard bias-corrected estimate incl. the small-range (linear
    counting) regime; relative error ≈ 1.04/√(2^p)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.reg = np.zeros(self.m, np.uint8)

    def update(self, keys: np.ndarray) -> None:
        import pandas as pd

        h = pd.util.hash_array(keys)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1, via bit-length
        lz = np.zeros(len(h), np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):  # branchless CLZ over uint64
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        np.maximum.at(self.reg, idx, lz + 1)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.reg.astype(np.float64)))
        zeros = int(np.count_nonzero(self.reg == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12, merge_groups: int = 32
) -> float:
    """Distributed HLL distinct estimate — same partial/fold plan as
    :func:`build_cms` (registers merge by elementwise max), via the shared
    ``_fold_blobs`` scaffold."""
    m = 1 << p

    def make_blob(t: pa.Table) -> bytes:
        h = HyperLogLog(p)
        if t.num_rows:
            h.update(_key_np(t[col]))
        return h.reg.tobytes()

    acc = _fold_blobs(
        ds, col, make_blob,
        new_acc=lambda: np.zeros(m, np.uint8),
        absorb=lambda a, b: np.maximum(a, np.frombuffer(b, np.uint8), out=a),
        merge_groups=merge_groups,
    )
    out = HyperLogLog(p)
    np.maximum(out.reg, acc, out=out.reg)
    return out.estimate()
