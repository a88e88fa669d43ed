"""Persisted cross-run MinHash/LSH near-duplicate index.

At 100 TB you cannot re-signature (or re-shuffle) the historical corpus
every time a new ingest batch arrives.  This module persists the LSH
state ONCE and dedups each NEW batch against it by reading only the
shards the batch actually touches — the dedup analog of the persisted
IVF index (:func:`airbyte_ray.functions.ann.build_ivf_index`): probe
I/O ∝ touched shards, never the whole index.

Layout (all plain partitioned parquet — resumable, appendable)::

    index_dir/meta.json                   {num_perm, bands, shingle_k,
                                           seed, n_shards, id_col}
    index_dir/bands/shard=N/*.parquet     (band_key, <id_col>)
    index_dir/sigs/shard=N/*.parquet      (<id_col>, sig)

``bands`` is sharded by ``band_key`` (the probe key: a new doc's band
keys say exactly which shards can hold its collisions); ``sigs`` is
sharded by ``stable_hash(id)`` (fetched only for candidate ids, for the
signature-similarity verification).  Signatures are NOT duplicated into
the band rows — at ``bands=16`` that would store every signature 16×.

Flow shapes:

* :func:`build_minhash_index` — ONE pass over the corpus text (the
  vectorized ``reduceat`` signature stage) streaming into the sigs
  table, then a cheap second pass over the much smaller sigs parquet to
  explode band rows.  No driver-side materialization of anything.
* :func:`append_to_index` — log-structured: the new batch's band/sig
  files land NEXT TO the existing shard files (parquet dirs append).
* :func:`dedup_against_index` — signature the new batch, read only the
  touched band shards, one ``groupby(band_key)`` emits cross-side
  candidate pairs (hot buckets fail LOUDLY over ``bucket_cap``, never
  silently drop), then two partitioned hash joins attach both
  signatures and the estimated Jaccard (fraction of equal components)
  filters at ``sim_threshold``.  The NEW batch ≪ corpus by contract —
  its signatures are pinned (materialized) because they are read twice.

Verification is by signature estimate (index-only; the historical text
is never re-read).  At 64 permutations the estimator's σ is ≈0.06 at
j=0.5 — choose ``sim_threshold`` inside your corpus's similarity gap,
or chain ``ngram_jaccard_pairs`` over the candidate ids for the exact
metric when the text is still reachable.

Reference analog: none (the reference has no content operators) — this
is brief-driven (large-scale training-data dedup).
"""

from __future__ import annotations

import glob
import json
import os
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _band_rows, _minhash_batch

_DEFAULT_SEED = 97  # MinHasher's default — recorded in meta for the probe side


def _band_shard_col(t: pa.Table, n_shards: int) -> pa.Table:
    bk = t["band_key"].to_numpy().astype(np.int64).view(np.uint64)
    return t.append_column("shard", pa.array((bk % np.uint64(n_shards)).astype(np.int64)))


def _id_shard_col(t: pa.Table, id_col: str, n_shards: int) -> pa.Table:
    from ..pipelines.replay import stable_hash

    h = stable_hash(t[id_col].cast(pa.string())) % np.uint64(n_shards)
    return t.append_column("shard", pa.array(h.astype(np.int64)))


def build_minhash_index(
    ds: ray.data.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    n_shards: int = 64,
) -> dict:
    """Persist the LSH index for ``ds``; returns the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    meta = {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
            "seed": _DEFAULT_SEED, "n_shards": n_shards, "id_col": id_col}
    sig_dir = os.path.join(index_dir, "sigs")
    band_dir = os.path.join(index_dir, "bands")
    # pass 1: text → signatures, streamed straight to parquet
    (
        ds.select_columns([id_col, text_col])
        .map_batches(partial(_minhash_batch, col=text_col,
                             num_perm=num_perm, shingle_k=shingle_k),
                     batch_format="pyarrow")
        .map_batches(lambda t: _id_shard_col(t.drop_columns([text_col]), id_col, n_shards),
                     batch_format="pyarrow")
        .write_parquet(sig_dir, partition_cols=["shard"])
    )
    # pass 2: over the (small) sigs table → band rows
    (
        ray.data.read_parquet(sig_dir)
        .map_batches(lambda t: _band_shard_col(
            _band_rows(t.select([id_col, "sig"]), id_col, num_perm, bands)
            .drop_columns(["sig"]), n_shards), batch_format="pyarrow")
        .write_parquet(band_dir, partition_cols=["shard"])
    )
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def append_to_index(ds: ray.data.Dataset, index_dir: str,
                    text_col: str = "text") -> None:
    """Log-structured append: the new docs' sig/band files land beside
    the existing shard files (same meta/params)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col, num_perm = meta["id_col"], meta["num_perm"]
    sigged = (
        ds.select_columns([id_col, text_col])
        .map_batches(partial(_minhash_batch, col=text_col,
                             num_perm=num_perm, shingle_k=meta["shingle_k"]),
                     batch_format="pyarrow")
        .map_batches(lambda t: t.drop_columns([text_col]), batch_format="pyarrow")
        .materialize()  # small append batch by contract; read twice below
    )
    sigged.map_batches(
        lambda t: _id_shard_col(t, id_col, meta["n_shards"]), batch_format="pyarrow"
    ).write_parquet(os.path.join(index_dir, "sigs"), partition_cols=["shard"])
    sigged.map_batches(
        lambda t: _band_shard_col(
            _band_rows(t, id_col, num_perm, meta["bands"]).drop_columns(["sig"]),
            meta["n_shards"]), batch_format="pyarrow"
    ).write_parquet(os.path.join(index_dir, "bands"), partition_cols=["shard"])


def _cross_pairs(g: pa.Table, id_col: str, cap: int) -> pa.Table:
    """All (indexed, new) pairs sharing one band bucket.  Over-cap buckets
    raise LOUDLY (a silent drop would cost recall invisibly)."""
    side = g["side"].to_numpy()
    old_idx = np.flatnonzero(side == 0)
    new_idx = np.flatnonzero(side == 1)
    id_type = g[id_col].type
    if len(old_idx) == 0 or len(new_idx) == 0:
        return pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type)})
    if len(old_idx) * len(new_idx) > cap:
        raise ValueError(
            f"band bucket with {len(old_idx)}×{len(new_idx)} cross pairs "
            f"exceeds bucket_cap={cap}: near-identical content is flooding "
            "one bucket — dedup the new batch internally first, or raise "
            "bucket_cap explicitly")
    oi, ni = np.meshgrid(old_idx, new_idx, indexing="ij")
    ids = g[id_col]
    return pa.table({"a": ids.take(pa.array(oi.ravel())),
                     "b": ids.take(pa.array(ni.ravel()))})


def dedup_against_index(
    new_ds: ray.data.Dataset,
    index_dir: str,
    text_col: str = "text",
    sim_threshold: float = 0.8,
    bucket_cap: int = 100_000,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Near-dup matches of a NEW batch against the persisted index:
    returns (a=indexed id, b=new id, sim=estimated Jaccard ≥ threshold).
    Reads only the band/sig shards the new batch touches."""
    from ..joins import hash_join

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col, num_perm, n_shards = meta["id_col"], meta["num_perm"], meta["n_shards"]
    if meta["seed"] != _DEFAULT_SEED:
        raise ValueError("index built with a non-default hasher seed")

    sigged = (
        new_ds.select_columns([id_col, text_col])
        .map_batches(partial(_minhash_batch, col=text_col,
                             num_perm=num_perm, shingle_k=meta["shingle_k"]),
                     batch_format="pyarrow")
        .map_batches(lambda t: t.drop_columns([text_col]), batch_format="pyarrow")
        .materialize()  # the new batch ≪ corpus by contract; used 3×
    )
    new_bands = sigged.map_batches(
        lambda t: _band_shard_col(
            _band_rows(t, id_col, num_perm, meta["bands"]).drop_columns(["sig"]),
            n_shards), batch_format="pyarrow"
    ).materialize()

    touched = sorted(r[0] if isinstance(r, tuple) else r
                     for r in new_bands.unique("shard"))
    band_files = [
        f for s in touched
        for f in sorted(glob.glob(os.path.join(index_dir, "bands", f"shard={s}", "*.parquet")))
    ]
    if not band_files:
        # empty index side → no matches; type from the new batch
        id_type = sigged.schema().base_schema.field(id_col).type
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "sim": pa.array([], pa.float64())}))

    def _tag(side):
        def fn(t: pa.Table) -> pa.Table:
            keep = t.select(["band_key", id_col])
            return keep.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int64)))
        return fn

    idx_bands = ray.data.read_parquet(band_files, partitioning=None).map_batches(
        _tag(0), batch_format="pyarrow")
    nb = new_bands.map_batches(_tag(1), batch_format="pyarrow")
    pairs = (
        idx_bands.union(nb)
        .groupby("band_key")
        .map_groups(partial(_cross_pairs, id_col=id_col, cap=bucket_cap),
                    batch_format="pyarrow")
        .groupby(["a", "b"])  # the same pair surfaces from several bands
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )
    if pairs.count() == 0:
        id_type = sigged.schema().base_schema.field(id_col).type
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "sim": pa.array([], pa.float64())}))

    # candidate ids → their sig shards only
    cand_shards = sorted({
        int(s)
        for t in ray.get(pairs.to_arrow_refs()) if t.num_rows
        for s in np.unique(
            _id_shard_col(t.select(["a"]).rename_columns([id_col]), id_col, n_shards)
            ["shard"].to_numpy())
    })
    sig_files = [
        f for s in cand_shards
        for f in sorted(glob.glob(os.path.join(index_dir, "sigs", f"shard={s}", "*.parquet")))
    ]
    # acero joins reject fixed_size_list payload columns — carry the
    # signature as fixed_size_binary (one memcpy each way, still fixed
    # width / zero-copy through the exchange)
    def _sig_bin(t: pa.Table, key_out: str, sig_out: str) -> pa.Table:
        n = t.num_rows
        flat = np.asarray(t["sig"].combine_chunks().flatten())
        bin_arr = pa.Array.from_buffers(
            pa.binary(num_perm * 8), n, [None, pa.py_buffer(flat.tobytes())])
        return pa.table({key_out: t[id_col], sig_out: bin_arr})

    old_sigs = ray.data.read_parquet(sig_files, partitioning=None).map_batches(
        partial(_sig_bin, key_out="a", sig_out="sig_a"), batch_format="pyarrow")
    new_sigs = sigged.map_batches(
        partial(_sig_bin, key_out="b", sig_out="sig_b"), batch_format="pyarrow")
    j = hash_join(pairs, old_sigs, on="a", num_buckets=num_buckets)
    j = hash_join(j, new_sigs, on="b", num_buckets=num_buckets)

    def _unpack(col: pa.ChunkedArray, n: int) -> np.ndarray:
        arr = col.combine_chunks()
        buf = arr.buffers()[1]
        off = arr.offset * num_perm
        return np.frombuffer(buf, np.uint64)[off: off + n * num_perm].reshape(n, num_perm)

    def _sim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], t["a"].type),
                             "b": pa.array([], t["b"].type),
                             "sim": pa.array([], pa.float64())})
        sa = _unpack(t["sig_a"], t.num_rows)
        sb = _unpack(t["sig_b"], t.num_rows)
        sim = (sa == sb).mean(axis=1)
        out = pa.table({"a": t["a"], "b": t["b"], "sim": pa.array(sim)})
        return out.filter(pa.array(sim >= sim_threshold))

    res = j.map_batches(_sim, batch_format="pyarrow").materialize()
    if res.count() == 0:
        # every candidate failed the sim filter: pin the output schema
        # (a lazy all-empty tail loses it).  Cheap — candidates ≪ corpus
        # and the upstream pair table is already materialized.
        id_type = sigged.schema().base_schema.field(id_col).type
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "sim": pa.array([], pa.float64())}))
    return res
