"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding cosine.

Scale shape (the part that matters at 100 TB):

* **exact**: md5 fingerprint per batch (vectorized) → ``groupby(fp)`` keeps
  one row per group — one shuffle keyed by a 16-byte hash; skew-free by
  construction (hashes are uniform).
* **MinHash+LSH**: signatures are computed in a *stateful actor pool*
  (permutation params built once per actor), exploded to
  ``(band, band_hash, doc_id, sig)`` rows, and bucketed with ONE
  ``groupby(band_hash)`` — the classic shingle→minhash→band→bucket plan.
  Candidate pairs are verified inside the bucket group from the carried
  signatures (no second pass over the corpus).
* **components**: candidate pairs are orders of magnitude smaller than the
  corpus; union-find runs on the driver.  This is the documented smallness
  assumption — if pairs explode, raise bands' selectivity (more bands →
  higher threshold), don't grow the driver.

The final filter broadcasts the drop-set (``ray.put``) and applies it as a
vectorized ``is_in`` mask inside ``map_batches`` — no join shuffle.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .text import fingerprint_md5

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    cols: list[str],
    keep_by: str,
    fp_col: str = "_fp",
) -> ray.data.Dataset:
    """Keep one row per exact content match (md5 over ``cols``), choosing the
    min ``keep_by`` row — deterministic, SQL-oracle-reproducible
    (``row_number() over (partition by md5(...) order by keep_by) = 1``)."""
    if len(cols) == 1:
        fp = fingerprint_md5(cols[0], out=fp_col)
    else:  # fingerprint over the joined canonical columns
        from ..stages.transforms import hash_id

        fp = hash_id(cols, name=fp_col)

    def first(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(keep_by, "ascending")]))
        return g.slice(0, 1).drop_columns([fp_col])

    return (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby(fp_col)
        .map_groups(first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable uint64 hashes of the k-char shingles of ``text`` (rolling
    polynomial, vectorized via prefix hashes — same trick as
    text._rolling_min_hash)."""
    from .text import _RK_B, _RK_BINV

    b = np.frombuffer(text.encode(), np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return np.zeros(0, np.uint64)
    w = min(k, n)
    with np.errstate(over="ignore"):
        pows = np.empty(n + 1, np.uint64)
        pows[0] = 1
        np.cumprod(np.full(n, _RK_B, np.uint64), out=pows[1:])
        invs = np.empty(n, np.uint64)
        invs[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _RK_BINV, np.uint64), out=invs[1:])
        s = np.cumsum(b * invs)
        P = np.empty(n + 1, np.uint64)
        P[0] = 0
        P[1:] = s * pows[:n]
        h = P[w:] - P[: n - w + 1] * pows[w]
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: append a ``sig`` (list<uint64> as int64) MinHash
    signature column.  Permutation parameters are generated ONCE per actor in
    ``__init__`` (seeded — identical across actors/runs)."""

    def __init__(self, col: str, num_perm: int = 64, shingle_k: int = 5, seed: int = 97):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.col, self.k, self.num_perm = col, shingle_k, num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, np.uint64)
        with np.errstate(over="ignore"):
            # (perm × shingle) universal hash; min over shingles
            m = (np.outer(self.a, sh) + self.b[:, None]) % np.uint64(_MERSENNE)
        return m.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(v or "") for v in t[self.col].cast(pa.string()).to_pylist()]
        ).astype(np.int64)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel()), self.num_perm)
        return t.append_column("sig", arr)


def _band_rows(t: pa.Table, id_col: str, num_perm: int, bands: int) -> pa.Table:
    """Explode (id, sig) → (band_hash, id, sig) — one row per band."""
    n = t.num_rows
    if n == 0:
        return pa.table(
            {"band_key": pa.array([], pa.int64()),
             id_col: pa.array([], t[id_col].type),
             "sig": pa.array([], t["sig"].type)}
        )
    r = num_perm // bands
    sigs = np.asarray(t["sig"].combine_chunks().flatten()).reshape(n, num_perm)
    rows = []
    with np.errstate(over="ignore"):
        for b in range(bands):
            chunk = sigs[:, b * r : (b + 1) * r].astype(np.uint64)
            h = np.full(n, np.uint64(1469598103934665603))
            for j in range(r):
                h = (h ^ chunk[:, j]) * np.uint64(1099511628211)
            h = (h ^ np.uint64(b)) * np.uint64(1099511628211)  # band id mixed in
            rows.append(
                pa.table({"band_key": pa.array(h.view(np.int64)), id_col: t[id_col], "sig": t["sig"]})
            )
    return pa.concat_tables(rows)


def _bucket_pairs(g: pa.Table, id_col: str, num_perm: int, threshold: float) -> pa.Table:
    """Candidate pairs within one LSH bucket, verified by signature
    agreement (unbiased Jaccard estimate)."""
    n = g.num_rows
    empty = pa.table(
        {"a": pa.array([], g[id_col].type), "b": pa.array([], g[id_col].type),
         "est_jaccard": pa.array([], pa.float64())}
    )
    if n < 2 or n > 2000:  # degenerate bucket guard (hot bucket = low-info band)
        return empty
    ids = g[id_col].to_numpy(zero_copy_only=False)
    sigs = np.asarray(g["sig"].combine_chunks().flatten()).reshape(n, num_perm)
    ii, jj = np.triu_indices(n, 1)
    est = (sigs[ii] == sigs[jj]).mean(axis=1)
    keep = est >= threshold
    if not keep.any():
        return empty
    a, b = ids[ii[keep]], ids[jj[keep]]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table({"a": pa.array(a2), "b": pa.array(b2), "est_jaccard": pa.array(est[keep])})


def lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """shingle → minhash (actor pool) → band-explode → bucket groupby →
    verified candidate duplicate pairs (a < b, est_jaccard ≥ threshold)."""
    sigged = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        fn_constructor_args=(text_col, num_perm, shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
    exploded = sigged.map_batches(
        lambda t: _band_rows(t.drop_columns([text_col]), id_col, num_perm, bands),
        batch_format="pyarrow",
    )
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _bucket_pairs(g, id_col, num_perm, threshold),
        batch_format="pyarrow",
    )

    # the same pair can surface from several bands — dedup pairs
    def pair_first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(["a", "b"]).map_groups(pair_first, batch_format="pyarrow")


def connected_components(pairs: list[dict] | pa.Table) -> dict:
    """Driver-side union-find over candidate pairs (pairs << corpus —
    documented smallness assumption).  Returns {id: component_root}."""
    if isinstance(pairs, pa.Table):
        pairs = pairs.to_pylist()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["a"]), find(p["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {k: find(k) for k in parent}


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """Near-duplicate removal: keep each component's min-id representative.
    The drop-set is broadcast (``ray.put``) and applied as a vectorized mask
    — no join."""
    pairs = lsh_candidates(ds, text_col, id_col, **lsh_kwargs).take_all()
    comp = connected_components(pairs)
    drop = [k for k, v in comp.items() if v != k]
    drop_ref = ray.put(set(drop))

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not d:
            return t
        mask = pc.invert(pc.is_in(t[id_col], value_set=pa.array(list(d), t[id_col].type)))
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens (actor-pool stage): sum of ±1 bit
    votes of stable token hashes, weighted by term frequency."""

    def __init__(self, col: str, out: str = "simhash"):
        self.col, self.out = col, out

    @staticmethod
    def simhash(text: str) -> np.uint64:
        toks = text.lower().split()
        if not toks:
            return np.uint64(0)
        hs = pd.util.hash_array(np.array(toks, object), categorize=False)
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
        out = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        return out.view(np.uint64)[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = np.array(
            [self.simhash(v or "") for v in t[self.col].cast(pa.string()).to_pylist()],
            np.uint64,
        )
        return t.append_column(self.out, pa.array(vals.view(np.int64)))


def simhash_near_dups(
    ds: ray.data.Dataset, text_col: str, id_col: str, max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4×16-bit keys
    (any pair within hamming ≤3 shares ≥1 exact band — pigeonhole), bucket
    with one groupby, verify hamming inside the bucket."""
    sigged = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher, fn_constructor_args=(text_col,), batch_format="pyarrow", concurrency=(1, 8)
    ).drop_columns([text_col])

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        h = t["simhash"].to_numpy().view(np.uint64)
        parts = []
        for b in range(4):
            key = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) * 4 + b
            parts.append(pa.table({"band_key": pa.array(key), id_col: t[id_col], "simhash": t["simhash"]}))
        return pa.concat_tables(parts)

    def pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table({"a": pa.array([], g[id_col].type), "b": pa.array([], g[id_col].type),
                          "hamming": pa.array([], pa.int64())})
        if n < 2 or n > 2000:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False)
        h = g["simhash"].to_numpy().view(np.uint64)
        ii, jj = np.triu_indices(n, 1)
        x = (h[ii] ^ h[jj])
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        swap = a > b
        return pa.table({"a": pa.array(np.where(swap, b, a)), "b": pa.array(np.where(swap, a, b)),
                         "hamming": pa.array(ham[keep].astype(np.int64))})

    def pair_first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (
        sigged.map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(pair_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    threshold: float = 0.95,
    nbits: int = 8,
    seed: int = 211,
) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine: random-hyperplane LSH keys
    bucket the corpus with one groupby; exact cosine verification runs
    inside each bucket.  Two near-identical vectors share all sign bits
    with high probability; raise nbits for selectivity, lower for recall."""
    from .ann import _bucket_keys, _hyperplanes, _matrix, _normalize

    planes_holder: dict = {}

    def key_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], t[id_col].type),
                             emb_col: pa.array([], t[emb_col].type)})
        if "planes" not in planes_holder:
            dim = len(t[emb_col][0].as_py())
            planes_holder["planes"] = _hyperplanes(dim, nbits, seed)
        m = _normalize(_matrix(t, emb_col))
        keys = _bucket_keys(m, planes_holder["planes"])
        return pa.table({"band_key": pa.array(keys), id_col: t[id_col], emb_col: t[emb_col]})

    def pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table({"a": pa.array([], g[id_col].type), "b": pa.array([], g[id_col].type),
                          "cosine": pa.array([], pa.float64())})
        if n < 2 or n > 2000:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(g, emb_col))
        sims = m @ m.T
        ii, jj = np.triu_indices(n, 1)
        keep = sims[ii, jj] >= threshold
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        swap = a > b
        return pa.table({"a": pa.array(np.where(swap, b, a)),
                         "b": pa.array(np.where(swap, a, b)),
                         "cosine": pa.array(sims[ii, jj][keep].astype(np.float64))})

    def pair_first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(key_batch, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(pair_first, batch_format="pyarrow")
    )
