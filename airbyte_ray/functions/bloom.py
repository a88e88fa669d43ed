"""Bloom-filter membership + anti-join — the scale path for "skip keys
already in the lake".

``joins.semi_join`` broadcasts the EXACT key set; fine to ~10^7 keys.  At
lake scale (10^9-10^10 doc_ids) the exact set is tens of GB, but a Bloom
filter at ~10 bits/key is 10-100× smaller and still broadcast-able
(``ray.put`` once, read per worker) — at the price of false POSITIVES.
The anti-join stays exact by splitting on the bloom verdict:

* bloom says ABSENT  → definitely absent (no false negatives): the row is
  in the anti-join result, emitted in-task, ZERO exchange;
* bloom says PRESENT → maybe: only these rows (true members + the ~1% FP
  band) take the exact hash-bucketed verification exchange against the
  key set.

For the common CDC shape — most incoming keys genuinely new — the
exchange shrinks to the member fraction instead of the whole stream.

Bloom bits are linear under OR, so the build uses the same partial/fold
plan as the sketches: one ``map_batches`` pass emits per-block partial
filters, a bucketed groupby ORs them in parallel, the driver ORs the last
≤ ``merge_groups`` blobs.  (Bloom 1970; double hashing per
Kirsch–Mitzenmacher 2006, same construction as ``sketch.CountMinSketch``.)
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .sketch import _key_np, _two_hashes


class BloomFilter:
    """Bit-array Bloom filter with vectorized add/contains."""

    def __init__(self, n_bits: int, k: int):
        self.n_bits, self.k = n_bits, k
        self.bits = np.zeros((n_bits + 7) // 8, np.uint8)

    @classmethod
    def sized(cls, est_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        n_bits = max(64, int(-est_keys * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / max(est_keys, 1) * math.log(2)))
        return cls(n_bits, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _two_hashes(keys)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(
    ds: ray.data.Dataset, col: str, est_keys: int, fp_rate: float = 0.01,
    merge_groups: int = 32,
) -> BloomFilter:
    """Distributed build: partial filters per block, OR-fold in parallel,
    driver ORs ≤ ``merge_groups`` blobs — the shared ``_fold_blobs``
    scaffold from ``sketch.py``."""
    from .sketch import _fold_blobs

    proto = BloomFilter.sized(est_keys, fp_rate)
    n_bits, k = proto.n_bits, proto.k

    def make_blob(t: pa.Table) -> bytes:
        b = BloomFilter(n_bits, k)
        if t.num_rows:
            b.add(_key_np(t[col]))
        return b.bits.tobytes()

    acc = _fold_blobs(
        ds, col, make_blob,
        new_acc=lambda: np.zeros(len(proto.bits), np.uint8),
        absorb=lambda a, b: np.bitwise_or(a, np.frombuffer(b, np.uint8), out=a),
        merge_groups=merge_groups,
    )
    out = BloomFilter(n_bits, k)
    np.bitwise_or(out.bits, acc, out=out.bits)
    return out


def bloom_anti_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    on: str,
    keys_col: str | None = None,
    est_keys: int = 1 << 20,
    fp_rate: float = 0.01,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT ``big WHERE on NOT IN keys`` with a Bloom prefilter: rows the
    bloom rules out pass through in-task; only bloom-positive rows (true
    members + FP band) take the hash-bucketed exact verification against
    the key set."""
    import ray

    from ..config import _worker_state

    keys_col = keys_col or on
    keys_named = (
        keys_ds.select_columns([keys_col]) if keys_col == on
        else keys_ds.select_columns([keys_col]).map_batches(
            lambda t: t.rename_columns([on]), batch_format="pyarrow"
        )
    ).materialize()  # consumed twice: bloom build + exact verification
    bloom = build_bloom(keys_named, on, est_keys, fp_rate)
    bref = ray.put((bloom.bits.tobytes(), bloom.n_bits, bloom.k))

    def _bloom() -> BloomFilter:
        blob, n_bits, k = ray.get(bref)
        b = BloomFilter(n_bits, k)
        b.bits = np.frombuffer(blob, np.uint8).copy()
        return b

    def split(t: pa.Table, want_maybe: bool) -> pa.Table:
        if t.num_rows == 0:
            return t
        b = _worker_state(("bloom", bref.hex()), _bloom)
        maybe = b.contains(_key_np(t[on]))
        return t.filter(pa.array(maybe if want_maybe else ~maybe))

    # `big` is scanned twice (definite + maybe split) — deliberately NOT
    # materialized: for the lake-scale input this operator targets, two
    # column-pruned streaming reads beat spilling the whole table to the
    # object store.  `maybes` (member + FP band, ≪ big) IS materialized
    # because it feeds two consumers.
    definite = big.map_batches(
        lambda t: split(t, False), batch_format="pyarrow"
    )
    maybes = big.map_batches(
        lambda t: split(t, True), batch_format="pyarrow"
    ).materialize()

    # exact verification runs on KEYS, not rows: distinct maybe-keys are
    # hash-bucketed against the key set, and the surviving (false-positive)
    # keys — a set bounded by the FP band — filter the maybe rows.
    maybe_keys = maybes.select_columns([on]).map_batches(
        lambda t: pa.table({on: t[on].unique() if isinstance(t[on], pa.Array)
                            else t[on].combine_chunks().unique()}),
        batch_format="pyarrow",
    )

    def bucket_of(t: pa.Table, side: int) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(_key_np(t[on]))
        return pa.table({
            on: t[on],
            "__side": pa.array(np.full(t.num_rows, side, np.int8)),
            "__bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })

    tagged = maybe_keys.map_batches(
        lambda t: bucket_of(t, 0), batch_format="pyarrow"
    ).union(keys_named.map_batches(lambda t: bucket_of(t, 1), batch_format="pyarrow"))

    def verify(g: pa.Table) -> pa.Table:
        left = g.filter(pc.equal(g["__side"], 0))
        right_keys = g.filter(pc.equal(g["__side"], 1))[on]
        if left.num_rows == 0:
            return pa.table({on: pa.array([], g[on].type)})
        mask = pc.is_in(left[on], value_set=right_keys.combine_chunks())
        return pa.table({on: left.filter(pc.invert(mask))[on]})

    survivors = tagged.groupby("__bucket").map_groups(verify, batch_format="pyarrow")
    surv_keys = [r[on] for r in survivors.take_all()]  # FP band only — small
    sref = ray.put(set(surv_keys))

    def keep_survivors(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        # Cache the prebuilt Arrow value_set, not the Python set — the
        # set→Arrow conversion must happen once per worker, not per batch.
        arr = _worker_state(
            ("bloom_surv_arr", sref.hex(), str(t[on].type)),
            lambda: pa.array(list(ray.get(sref)), t[on].type),
        )
        mask = pc.is_in(t[on], value_set=arr)
        return t.filter(mask)

    fp_rows = maybes.map_batches(keep_survivors, batch_format="pyarrow")
    return definite.union(fp_rows)
