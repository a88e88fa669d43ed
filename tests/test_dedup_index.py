"""Persisted cross-run LSH dedup index (functions/dedup_index.py)."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from airbyte_ray.functions.dedup_index import (
    append_to_index,
    build_minhash_index,
    dedup_against_index,
)

_WORDS = [f"w{i:03d}" for i in range(500)]


def _doc(seed, n=60):
    r = np.random.default_rng(seed)
    return " ".join(r.choice(_WORDS, n))


def _corpus(ids_and_seeds):
    return pa.table({
        "doc_id": pa.array([i for i, _ in ids_and_seeds]),
        "text": pa.array([_doc(s) for _, s in ids_and_seeds]),
    })


@pytest.fixture()
def index_dir(tmp_path):
    d = str(tmp_path / "idx")
    hist = _corpus([(i, i) for i in range(200)])
    build_minhash_index(rd.from_arrow(hist), d, n_shards=16)
    return d


def test_layout_and_meta(index_dir):
    import json

    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    assert meta["num_perm"] == 64 and meta["n_shards"] == 16
    assert glob.glob(os.path.join(index_dir, "bands", "shard=*", "*.parquet"))
    assert glob.glob(os.path.join(index_dir, "sigs", "shard=*", "*.parquet"))


def test_probe_finds_exact_copies_only(index_dir):
    copies = [3, 17, 42, 99, 150]
    new = _corpus([(1000 + i, 5000 + i) for i in range(20)]
                  + [(2000 + c, c) for c in copies])
    out = dedup_against_index(rd.from_arrow(new), index_dir,
                              sim_threshold=0.9).to_pandas()
    assert set(map(tuple, out[["a", "b"]].values)) == {(c, 2000 + c) for c in copies}
    assert (out.sim == 1.0).all()


def test_append_then_match_new_docs(index_dir):
    new = _corpus([(1000 + i, 5000 + i) for i in range(10)])
    append_to_index(rd.from_arrow(new), index_dir)
    probe = _corpus([(9999, 5003)])  # copy of appended doc 1003
    out = dedup_against_index(rd.from_arrow(probe), index_dir,
                              sim_threshold=0.9).to_pandas()
    assert set(out.a) == {1003}


def test_no_matches_schema_stable(index_dir):
    probe = _corpus([(7777, 123456)])  # fresh text: no matches
    out = dedup_against_index(rd.from_arrow(probe), index_dir,
                              sim_threshold=0.9)
    assert out.count() == 0
    # Dataset schema stays pinned even with zero rows (Ray's to_pandas
    # drops columns on empty datasets — assert on the schema, the thing
    # downstream unions/writes actually consume)
    assert out.schema().names == ["a", "b", "sim"]


def test_hot_bucket_raises_loudly(tmp_path):
    d = str(tmp_path / "hot")
    same = _doc(1)  # 400 identical docs → one flooded bucket
    hist = pa.table({"doc_id": pa.array(np.arange(400)),
                     "text": pa.array([same] * 400)})
    build_minhash_index(rd.from_arrow(hist), d, n_shards=4)
    probe = pa.table({"doc_id": pa.array([9000]), "text": pa.array([same])})
    with pytest.raises(Exception, match="bucket_cap"):
        dedup_against_index(rd.from_arrow(probe), d, sim_threshold=0.9,
                            bucket_cap=100).to_pandas()


def test_probe_reads_only_touched_shards(index_dir, monkeypatch):
    """The scan-pruning contract: the band files handed to read_parquet
    are a strict subset of the index's shards for a small probe."""
    import airbyte_ray.functions.dedup_index as di

    seen = {}
    orig = rd.read_parquet

    def spy(paths, **kw):
        if isinstance(paths, list) and paths and "bands" in paths[0]:
            seen["bands"] = list(paths)
        return orig(paths, **kw)

    monkeypatch.setattr(di.ray.data, "read_parquet", spy)
    probe = _corpus([(8888, 3)])
    dedup_against_index(rd.from_arrow(probe), index_dir,
                        sim_threshold=0.9).materialize()
    all_band_files = glob.glob(os.path.join(index_dir, "bands", "shard=*", "*.parquet"))
    assert seen["bands"], "probe read no band shards"
    touched_shards = {os.path.basename(os.path.dirname(f)) for f in seen["bands"]}
    all_shards = {os.path.basename(os.path.dirname(f)) for f in all_band_files}
    assert touched_shards < all_shards, (
        f"probe touched {len(touched_shards)}/{len(all_shards)} shards — no pruning")


def test_distributed_probe_matches_driver(index_dir):
    """Round-5: the distributed probe (no O(new-batch) driver arrays —
    Bloom-pruned band scan, one band_key exchange, hash-join verify) must
    produce exactly the driver path's matches."""
    copies = [3, 17, 42, 99, 150]
    new = _corpus([(1000 + i, 5000 + i) for i in range(20)]
                  + [(2000 + c, c) for c in copies])
    out_dr = dedup_against_index(rd.from_arrow(new), index_dir,
                                 sim_threshold=0.9, mode="driver").to_pandas()
    out_di = dedup_against_index(rd.from_arrow(new), index_dir,
                                 sim_threshold=0.9, mode="distributed").to_pandas()
    want = {(c, 2000 + c) for c in copies}
    assert set(map(tuple, out_di[["a", "b"]].values)) == want
    assert (out_di.sim == 1.0).all()
    key = ["a", "b", "sim"]
    assert (out_di[key].sort_values(["a", "b"]).reset_index(drop=True)
            .equals(out_dr[key].sort_values(["a", "b"]).reset_index(drop=True)))


def test_distributed_no_matches_schema_stable(index_dir):
    probe = _corpus([(7777, 123456)])
    out = dedup_against_index(rd.from_arrow(probe), index_dir,
                              sim_threshold=0.9, mode="distributed")
    assert out.count() == 0
    assert out.schema().names == ["a", "b", "sim"]


def test_distributed_hot_bucket_raises(tmp_path):
    d = str(tmp_path / "hotd")
    same = _doc(1)
    hist = pa.table({"doc_id": pa.array(np.arange(400)),
                     "text": pa.array([same] * 400)})
    build_minhash_index(rd.from_arrow(hist), d, n_shards=4)
    probe = pa.table({"doc_id": pa.array([9000]), "text": pa.array([same])})
    with pytest.raises(Exception, match="bucket_cap"):
        dedup_against_index(rd.from_arrow(probe), d, sim_threshold=0.9,
                            bucket_cap=100, mode="distributed").to_pandas()


def test_distributed_integrity_error_on_missing_sigs(index_dir):
    """Band rows without their sig rows (partial append) must fail loudly
    in the distributed verify tasks, not silently drop candidates."""
    shutil.rmtree(os.path.join(index_dir, "sigs"))
    probe = _corpus([(8888, 3)])  # exact copy of indexed doc 3 → candidate
    with pytest.raises(Exception, match="out of sync"):
        dedup_against_index(rd.from_arrow(probe), index_dir,
                            sim_threshold=0.9, mode="distributed").to_pandas()


def test_auto_mode_uses_distributed_over_cap(index_dir):
    """driver_cap below the batch size must route auto → distributed and
    still return the exact match set."""
    probe = _corpus([(9999, 3), (9998, 77777)])
    out = dedup_against_index(rd.from_arrow(probe), index_dir,
                              sim_threshold=0.9, mode="auto",
                              driver_cap=1).to_pandas()
    assert set(map(tuple, out[["a", "b"]].values)) == {(3, 9999)}


def test_distributed_probe_reads_only_touched_shards(index_dir, monkeypatch):
    """Scan pruning holds on the distributed path too: band files handed
    to read_parquet are a strict subset of the index's shards."""
    import airbyte_ray.functions.dedup_index as di

    seen = {}
    orig = rd.read_parquet

    def spy(paths, **kw):
        if isinstance(paths, list) and paths and "bands" in paths[0]:
            seen["bands"] = list(paths)
        return orig(paths, **kw)

    monkeypatch.setattr(di.ray.data, "read_parquet", spy)
    probe = _corpus([(8888, 3)])
    dedup_against_index(rd.from_arrow(probe), index_dir, sim_threshold=0.9,
                        mode="distributed").materialize()
    all_band_files = glob.glob(os.path.join(index_dir, "bands", "shard=*", "*.parquet"))
    touched = {os.path.basename(os.path.dirname(f)) for f in seen["bands"]}
    all_shards = {os.path.basename(os.path.dirname(f)) for f in all_band_files}
    assert touched < all_shards


def test_string_doc_ids_roundtrip(tmp_path):
    """String ids flow through bucketing, pair dedup, shard hashing and
    the sig gather (np.unique(axis=0) rejects object arrays — the pair
    dedup must be id-type-agnostic)."""
    d = str(tmp_path / "sidx")
    hist = pa.table({
        "doc_id": pa.array([f"doc-{i:04d}" for i in range(120)]),
        "text": pa.array([_doc(i) for i in range(120)]),
    })
    build_minhash_index(rd.from_arrow(hist), d, n_shards=8)
    probe = pa.table({
        "doc_id": pa.array(["new-a", "new-b"]),
        "text": pa.array([_doc(42), _doc(5042)]),  # copy of doc-0042 + fresh
    })
    out = dedup_against_index(rd.from_arrow(probe), d,
                              sim_threshold=0.9).to_pandas()
    assert set(map(tuple, out[["a", "b"]].values)) == {("doc-0042", "new-a")}
    # string ids through the distributed path too (bloom hashing, fsb
    # pack, hash-join verify are all id-type-agnostic)
    out_d = dedup_against_index(rd.from_arrow(probe), d, sim_threshold=0.9,
                                mode="distributed").to_pandas()
    assert set(map(tuple, out_d[["a", "b"]].values)) == {("doc-0042", "new-a")}
