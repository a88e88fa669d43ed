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
* :func:`dedup_against_index` — TWO execution shapes, picked by batch
  size (``mode="auto"``).  Small probes: three distributed passes
  (signature the new batch; collision-scan the touched band shards with
  an in-task band-key semi-filter; fetch candidate signatures from the
  touched sig shards) with the candidate-sized middle handled
  driver-side in numpy — lowest fixed overhead.  Large ingest batches:
  the fully distributed path — NO driver array is O(batch): Bloom-pruned
  shard scans (fixed-size bitmap, distributed OR-fold build), ONE
  ``groupby(band_key)`` exchange emitting old×new candidate pairs, a
  distributed pair-dedup, and signature verification as partitioned
  hash joins (sigs packed to fixed-size-binary).  Measured: probe cost
  flat as the batch grows 10× (bench ``dedup_probe_10x_ratio`` ≈ 1.0).
  Hot buckets fail LOUDLY over ``bucket_cap`` on both paths.

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


def dedup_against_index(
    new_ds: ray.data.Dataset,
    index_dir: str,
    text_col: str = "text",
    sim_threshold: float = 0.8,
    bucket_cap: int = 100_000,
    mode: str = "auto",
    driver_cap: int = 200_000,
) -> ray.data.Dataset:
    """Near-dup matches of a NEW batch against the persisted index:
    returns (a=indexed id, b=new id, sim=estimated Jaccard ≥ threshold).

    Two execution shapes, selected by ``mode`` (``auto`` picks by new-batch
    size against ``driver_cap`` rows):

    ``driver`` — exactly THREE distributed passes, everything else
    driver-side numpy over candidate-sized tables:

    1. signature the new batch (distributed; the only pass over its text);
    2. scan the TOUCHED band shards, semi-filtered by the batch's
       band-key set inside the read tasks (collisions only come back);
    3. fetch the candidate ids' signatures from the touched sig shards.

    The first version chained groupbys and hash-joins for the candidate
    stages; at sf0.1 that spent ~25 s of fixed per-execution overhead on
    KILOBYTES of candidates.  For a small probe batch, driver-side
    candidate handling is the right call — collisions/candidates are
    band-bucket-bounded, and the big sides (index scans) stay
    distributed and pruned.

    ``distributed`` — the 100-TB-ingest shape: NO driver-side array is
    O(new batch).  The new batch's band rows stay a Dataset; touched
    shards come back as a ≤ ``n_shards`` list; in-task pruning uses a
    FIXED-SIZE Bloom filter over the batch's band keys (distributed
    OR-fold build, :func:`bloom.build_bloom`); old×new candidate pairs
    are emitted by ONE ``groupby(band_key)`` exchange (hot buckets still
    raise over ``bucket_cap``); and signature verification runs as two
    partitioned hash joins against the touched (Bloom-pruned) sig shards
    with signatures packed as fixed-size-binary payloads (Acero rejects
    list payloads).  A left join keeps the band/sig out-of-sync
    integrity RuntimeError loud, now raised inside the verify tasks."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col, num_perm, n_shards = meta["id_col"], meta["num_perm"], meta["n_shards"]
    if meta["seed"] != _DEFAULT_SEED:
        raise ValueError("index built with a non-default hasher seed")
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")

    # pass 1 — signatures of the new batch (both paths start here)
    sigged = (
        new_ds.select_columns([id_col, text_col])
        .map_batches(partial(_minhash_batch, col=text_col,
                             num_perm=num_perm, shingle_k=meta["shingle_k"]),
                     batch_format="pyarrow")
        .map_batches(lambda t: t.drop_columns([text_col]), batch_format="pyarrow")
    )
    if mode != "driver":
        sigged = sigged.materialize()  # consumed 2-3×; sigs ≪ text
        if mode == "distributed" or sigged.count() > driver_cap:
            return _probe_distributed(
                sigged, index_dir, meta, sim_threshold, bucket_cap)
    sig_tbl = pa.concat_tables(
        [t for t in ray.get(sigged.to_arrow_refs()) if t.num_rows]
        or [pa.table({id_col: pa.array([], pa.int64()),
                      "sig": pa.array([], pa.list_(pa.int64(), num_perm))})]
    ).combine_chunks()
    id_type = sig_tbl.schema.field(id_col).type

    def _empty() -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "sim": pa.array([], pa.float64())}))

    if sig_tbl.num_rows == 0:
        return _empty()

    # driver-side band keys of the new batch (n_new × bands int64s)
    nb = _band_rows(sig_tbl, id_col, num_perm, meta["bands"]).drop_columns(["sig"])
    nb_keys = nb["band_key"].to_numpy()
    key_set = np.unique(nb_keys)
    touched = sorted(np.unique(key_set.view(np.uint64) % np.uint64(n_shards)).tolist())
    band_files = [
        f for s in touched
        for f in sorted(glob.glob(os.path.join(index_dir, "bands", f"shard={s}", "*.parquet")))
    ]
    if not band_files:
        return _empty()

    # pass 2 — collision scan: touched shards, filtered in-task to the
    # batch's band keys, so only colliding rows return to the driver
    kref = ray.put(pa.array(key_set))

    def _semi(t: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        return t.select(["band_key", id_col]).filter(
            pc.is_in(t["band_key"], value_set=keys))

    coll = pa.concat_tables(
        [t for t in ray.get(
            ray.data.read_parquet(band_files, partitioning=None)
            .map_batches(_semi, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows]
        or [pa.table({"band_key": pa.array([], pa.int64()),
                      id_col: pa.array([], id_type)})]
    ).combine_chunks()
    if coll.num_rows == 0:
        return _empty()

    # driver-side bucket join (collisions × new band rows, both small):
    # sort both sides by band_key, pair via run-length windows
    ck = coll["band_key"].to_numpy()
    c_ord = np.argsort(ck, kind="stable")
    n_ord = np.argsort(nb_keys, kind="stable")
    ck_s, nk_s = ck[c_ord], nb_keys[n_ord]
    common = np.intersect1d(np.unique(ck_s), np.unique(nk_s))
    a_parts, b_parts = [], []
    c_lo = np.searchsorted(ck_s, common, side="left")
    c_hi = np.searchsorted(ck_s, common, side="right")
    n_lo = np.searchsorted(nk_s, common, side="left")
    n_hi = np.searchsorted(nk_s, common, side="right")
    prods = (c_hi - c_lo) * (n_hi - n_lo)
    if prods.size and int(prods.max()) > bucket_cap:
        k = int(common[int(prods.argmax())])
        raise ValueError(
            f"band bucket {k} with {int(prods.max())} cross pairs exceeds "
            f"bucket_cap={bucket_cap}: near-identical content is flooding "
            "one bucket — dedup the new batch internally first, or raise "
            "bucket_cap explicitly")
    for i in range(len(common)):
        ci = c_ord[c_lo[i]: c_hi[i]]
        ni = n_ord[n_lo[i]: n_hi[i]]
        gi, gj = np.meshgrid(ci, ni, indexing="ij")
        a_parts.append(gi.ravel())
        b_parts.append(gj.ravel())
    if not a_parts:
        return _empty()
    a_idx = np.concatenate(a_parts)
    b_idx = np.concatenate(b_parts)
    a_ids = coll[id_col].take(pa.array(a_idx)).to_numpy(zero_copy_only=False)
    b_ids = nb[id_col].take(pa.array(b_idx)).to_numpy(zero_copy_only=False)
    # the same pair surfaces from several bands — dedup on (a, b).
    # pandas drop_duplicates is id-type-agnostic (np.unique(axis=0)
    # rejects object/string arrays — review finding)
    import pandas as pd

    first = ~pd.DataFrame({"a": a_ids, "b": b_ids}).duplicated().to_numpy()
    a_ids, b_ids = a_ids[first], b_ids[first]

    # pass 3 — candidate a-ids' signatures from their sig shards only
    cand_tbl = pa.table({id_col: pa.array(a_ids, id_type)})
    cand_shards = sorted(np.unique(
        _id_shard_col(cand_tbl, id_col, n_shards)["shard"].to_numpy()).tolist())
    sig_files = [
        f for s in cand_shards
        for f in sorted(glob.glob(os.path.join(index_dir, "sigs", f"shard={s}", "*.parquet")))
    ]
    aref = ray.put(pa.array(np.unique(a_ids), id_type))

    def _fetch(t: pa.Table) -> pa.Table:
        want = ray.get(aref)
        return t.select([id_col, "sig"]).filter(
            pc.is_in(t[id_col], value_set=want))

    old_sig_tbl = pa.concat_tables(
        [t for t in ray.get(
            ray.data.read_parquet(sig_files, partitioning=None)
            .map_batches(_fetch, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows]
        # empty fallback so the out-of-sync integrity check below fires as
        # the designed RuntimeError, not ArrowInvalid here (advisory finding)
        or [pa.table({id_col: pa.array([], id_type),
                      "sig": pa.array([], sig_tbl["sig"].type)})]
    ).combine_chunks()

    # driver-side similarity: gather both sig matrices by candidate row
    def _sig_matrix(tbl: pa.Table) -> np.ndarray:
        return np.asarray(tbl["sig"].combine_chunks().flatten()).reshape(
            tbl.num_rows, num_perm).astype(np.uint64)

    old_ids_arr = old_sig_tbl[id_col].to_numpy(zero_copy_only=False)
    old_order = np.argsort(old_ids_arr, kind="stable")
    # clip: searchsorted returns len(old_ids_arr) for ids beyond the last
    # element, which would IndexError before the integrity check can fire
    # (advisory finding) — the clipped position then fails the equality test
    pos_raw = np.searchsorted(old_ids_arr[old_order], a_ids)
    pos_a = old_order[np.clip(pos_raw, 0, max(len(old_ids_arr) - 1, 0))] \
        if len(old_ids_arr) else np.zeros(0, np.int64)
    if len(old_ids_arr) == 0 or not (old_ids_arr[pos_a] == a_ids).all():
        raise RuntimeError(
            "candidate id missing from its sig shard — band and sig "
            "tables are out of sync (partial append?)")
    new_ids_arr = sig_tbl[id_col].to_numpy(zero_copy_only=False)
    new_order = np.argsort(new_ids_arr, kind="stable")
    pos_b = new_order[np.searchsorted(new_ids_arr[new_order], b_ids)]
    sim = (_sig_matrix(old_sig_tbl)[pos_a] == _sig_matrix(sig_tbl)[pos_b]).mean(axis=1)
    keep = sim >= sim_threshold
    return ray.data.from_arrow(pa.table({
        "a": pa.array(a_ids[keep], id_type),
        "b": pa.array(b_ids[keep], id_type),
        "sim": pa.array(sim[keep]),
    }))


def _pack_sigs(t: pa.Table, id_col: str, num_perm: int, out_id: str,
               out_sig: str) -> pa.Table:
    """(id, sig list<int64>[p]) → (out_id, out_sig fixed_size_binary[8p])
    — Acero hash joins reject list payloads but take fixed-width binary,
    and the pack/unpack is a zero-copy buffer view either way."""
    n = t.num_rows
    bw = 8 * num_perm
    if n == 0:
        return pa.table({out_id: pa.array([], t[id_col].type),
                         out_sig: pa.array([], pa.binary(bw))})
    mat = np.ascontiguousarray(
        np.asarray(t["sig"].combine_chunks().flatten()).reshape(n, num_perm))
    blob = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(bw), n, [None, pa.py_buffer(mat.tobytes())])
    return pa.table({out_id: t[id_col], out_sig: blob})


def _fsb_matrix(col: pa.ChunkedArray, num_perm: int) -> np.ndarray:
    """fixed_size_binary[8p] column (no nulls) → (n, p) int64 matrix,
    zero-copy modulo the slice-offset adjustment."""
    arr = col.combine_chunks()
    bw = 8 * num_perm
    buf = np.frombuffer(arr.buffers()[1], np.uint8)
    start = arr.offset * bw
    return buf[start:start + len(arr) * bw].view(np.int64).reshape(
        len(arr), num_perm)


def _probe_distributed(
    sigged: ray.data.Dataset,
    index_dir: str,
    meta: dict,
    sim_threshold: float,
    bucket_cap: int,
    fp_rate: float = 0.005,
) -> ray.data.Dataset:
    """The large-ingest probe: see :func:`dedup_against_index` docstring.
    Driver state is bounded by ≤ n_shards shard lists and two fixed-size
    Bloom bitmaps — never by the new batch or the candidate set."""
    from .bloom import BloomFilter, build_bloom
    from ..config import _worker_state
    from ..joins import hash_join

    id_col, num_perm, n_shards = meta["id_col"], meta["num_perm"], meta["n_shards"]
    bands = meta["bands"]
    sch = sigged.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def _empty() -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "sim": pa.array([], pa.float64())}))

    n_new = sigged.count()
    if n_new == 0:
        return _empty()

    # new band rows stay a Dataset (never collected)
    nb_ds = sigged.map_batches(
        lambda t: _band_rows(t, id_col, num_perm, bands).drop_columns(["sig"]),
        batch_format="pyarrow",
    ).materialize()

    # touched band shards: distinct band_key % n_shards (≤ n_shards values)
    def _shards_of(t: pa.Table) -> pa.Table:
        bk = t["band_key"].to_numpy().astype(np.int64).view(np.uint64)
        u = np.unique((bk % np.uint64(n_shards)).astype(np.int64))
        return pa.table({"shard": pa.array(u)})

    touched = sorted(set(
        nb_ds.map_batches(_shards_of, batch_format="pyarrow").unique("shard")))
    band_files = [
        f for s in touched
        for f in sorted(glob.glob(os.path.join(index_dir, "bands", f"shard={s}", "*.parquet")))
    ]
    if not band_files:
        return _empty()

    # fixed-size Bloom over the batch's band keys — the in-task prune that
    # replaces the driver key-set broadcast of the small-batch path
    kbloom = build_bloom(nb_ds, "band_key", est_keys=max(n_new * bands, 64),
                         fp_rate=fp_rate)
    kb_ref = ray.put((kbloom.bits.tobytes(), kbloom.n_bits, kbloom.k))

    def _bloom_from(ref):
        def make() -> BloomFilter:
            blob, n_bits, k = ray.get(ref)
            b = BloomFilter(n_bits, k)
            b.bits = np.frombuffer(blob, np.uint8).copy()
            return b
        return make

    def _prune_old(t: pa.Table) -> pa.Table:
        from .sketch import _key_np
        if t.num_rows == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], id_type),
                             "__side": pa.array([], pa.int8())})
        b = _worker_state(("didx_kbloom", kb_ref.hex()), _bloom_from(kb_ref))
        t = t.select(["band_key", id_col]).filter(
            pa.array(b.contains(_key_np(t["band_key"]))))
        return t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))

    old_rows = ray.data.read_parquet(
        band_files, partitioning=None).map_batches(_prune_old, batch_format="pyarrow")
    new_rows = nb_ds.map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")

    def _cross(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        old_i = np.flatnonzero(side == 0)
        new_i = np.flatnonzero(side == 1)
        if len(old_i) == 0 or len(new_i) == 0:  # bloom-FP-only bucket
            return pa.table({"a": pa.array([], id_type),
                             "b": pa.array([], id_type)})
        if len(old_i) * len(new_i) > bucket_cap:
            k = g["band_key"][0].as_py()
            raise ValueError(
                f"band bucket {k} with {len(old_i) * len(new_i)} cross pairs "
                f"exceeds bucket_cap={bucket_cap}: near-identical content is "
                "flooding one bucket — dedup the new batch internally first, "
                "or raise bucket_cap explicitly")
        gi, gj = np.meshgrid(old_i, new_i, indexing="ij")
        return pa.table({"a": g[id_col].take(pa.array(gi.ravel())),
                         "b": g[id_col].take(pa.array(gj.ravel()))})

    pairs = (
        old_rows.union(new_rows)
        .groupby("band_key").map_groups(_cross, batch_format="pyarrow")
        # the same pair surfaces from several bands — dedup distributed
        .groupby(["a", "b"]).map_groups(lambda g: g.slice(0, 1),
                                        batch_format="pyarrow")
        .materialize()  # candidate-sized; consumed twice below
    )
    if pairs.count() == 0:
        return _empty()

    # touched sig shards for the candidate a-ids (≤ n_shards values)
    def _a_shards(t: pa.Table) -> pa.Table:
        sh = _id_shard_col(pa.table({id_col: t["a"]}), id_col, n_shards)["shard"]
        return pa.table({"shard": pa.array(np.unique(sh.to_numpy()))})

    a_shards = sorted(set(
        pairs.map_batches(_a_shards, batch_format="pyarrow").unique("shard")))
    sig_files = [
        f for s in a_shards
        for f in sorted(glob.glob(os.path.join(index_dir, "sigs", f"shard={s}", "*.parquet")))
    ]

    # Bloom over candidate a-ids: prunes the sig scan to ~candidates + FP
    # (extra rows are dropped by the join, so FPs cost I/O, not correctness)
    abloom = build_bloom(pairs, "a", est_keys=max(pairs.count(), 64),
                         fp_rate=fp_rate)
    ab_ref = ray.put((abloom.bits.tobytes(), abloom.n_bits, abloom.k))

    def _prune_sigs(t: pa.Table) -> pa.Table:
        from .sketch import _key_np
        t = _pack_sigs(t, id_col, num_perm, "a", "sig_a")
        if t.num_rows == 0:
            return t
        b = _worker_state(("didx_abloom", ab_ref.hex()), _bloom_from(ab_ref))
        return t.filter(pa.array(b.contains(_key_np(t["a"]))))

    old_sigs = (
        ray.data.read_parquet(sig_files, partitioning=None)
        .map_batches(_prune_sigs, batch_format="pyarrow")
        if sig_files else
        ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type),
            "sig_a": pa.array([], pa.binary(8 * num_perm))}))
    )
    new_sigs = sigged.map_batches(
        partial(_pack_sigs, id_col=id_col, num_perm=num_perm,
                out_id="b", out_sig="sig_b"),
        batch_format="pyarrow")

    # left joins keep missing sigs visible as nulls → loud integrity error
    joined = hash_join(
        hash_join(pairs, old_sigs, on="a", how="left"),
        new_sigs, on="b", how="left")

    def _verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type),
                          "sim": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        if t["sig_a"].null_count or t["sig_b"].null_count:
            raise RuntimeError(
                "candidate id missing from its sig shard — band and sig "
                "tables are out of sync (partial append?)")
        sim = (_fsb_matrix(t["sig_a"], num_perm)
               == _fsb_matrix(t["sig_b"], num_perm)).mean(axis=1)
        out = pa.table({"a": t["a"], "b": t["b"], "sim": pa.array(sim)})
        return out.filter(pa.array(sim >= sim_threshold))

    res = joined.map_batches(_verify, batch_format="pyarrow").materialize()
    # pin the empty-result schema (Ray drops columns on fully-empty outputs)
    return res if res.count() else _empty()
