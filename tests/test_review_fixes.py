"""Regression tests for the round-3 review batch: null sampling keys,
namespaced state-migration filenames, quantile validation, unbiased
k-means init, and the shared sketch fold scaffold."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from airbyte_ray.functions.cluster import assign_clusters, kmeans_fit
from airbyte_ray.functions.sample import rate_sample, stratified_sample
from airbyte_ray.functions.sketch import exact_quantiles
from airbyte_ray.pipelines.incremental import StreamState
from airbyte_ray.state.migrate import import_state, state_flavor


def test_sample_null_keys_dropped_not_crash():
    t = pa.table({"doc_id": ["a", None, "b", None], "source": ["s", "s", "s", "s"]})
    out = rate_sample(rd.from_arrow(t), rate=1.0, key_col="doc_id").to_pandas()
    # rate 1.0 keeps every NON-NULL key; nulls drop (SQL: md5(NULL) < x is NULL)
    assert sorted(out.doc_id.tolist()) == ["a", "b"]
    out2 = stratified_sample(rd.from_arrow(t), rates={"s": 1.0}).to_pandas()
    assert sorted(out2.doc_id.tolist()) == ["a", "b"]


def test_import_state_namespaced_stream_is_loadable(tmp_path):
    state = [{"type": "STREAM",
              "stream": {"stream_descriptor": {"name": "users", "namespace": "public"},
                         "stream_state": {"cursor": 41}}}]
    res = import_state(str(tmp_path), state)
    assert res["imported"] == ["users"]
    # the engine reads {name}.json — the migrated cursor must actually load
    st = StreamState(str(tmp_path), "users").load()
    assert st["cursor"] == 41
    assert st["namespace"] == "public"


def test_import_state_cross_namespace_collision_rejected(tmp_path):
    state = [
        {"type": "STREAM", "stream": {"stream_descriptor": {"name": "users", "namespace": "a"},
                                      "stream_state": {"cursor": 1}}},
        {"type": "STREAM", "stream": {"stream_descriptor": {"name": "users", "namespace": "b"},
                                      "stream_state": {"cursor": 2}}},
    ]
    with pytest.raises(ValueError, match="namespace"):
        import_state(str(tmp_path), state)
    # nothing half-written
    assert not list(tmp_path.glob("*.json"))


def test_state_flavor_rejects_non_mapping_entries():
    with pytest.raises(ValueError):
        state_flavor(json.loads('["LEGACY"]'))
    with pytest.raises(ValueError):
        state_flavor([1, 2])


def test_exact_quantiles_validates_range():
    ds = rd.from_arrow(pa.table({"v": [1.0, 2.0, 3.0]}))
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_quantiles(ds, "v", [0.5, 1.5])


def test_kmeans_random_init_on_source_sorted_corpus():
    # rows SORTED by cluster (the bias case the init fix targets): the
    # first k rows all belong to cluster 0, so a first-k init would
    # collapse clusters; the pooled seeded choice must still find all k
    k, d, per = 4, 16, 60
    labels = np.repeat(np.arange(k), per)
    centers = np.zeros((k, d))
    centers[np.arange(k), np.arange(k)] = 1.0
    noise = 0.03 * np.sin(np.outer(np.arange(k * per) + 1, np.arange(1, d + 1)))
    emb = (centers[labels] + noise).astype(np.float32)
    t = pa.table({"vec_id": np.arange(k * per), "embedding": pa.array(list(emb))})
    ds = rd.from_arrow(t).repartition(4)
    cents = kmeans_fit(ds, k=k, iters=8, seed=7)
    lab = assign_clusters(ds, cents).to_pandas().sort_values("vec_id")
    mapping = {}
    for vid, cl in zip(lab.vec_id, lab.cluster):
        assert mapping.setdefault(labels[vid], cl) == cl
    assert len(set(mapping.values())) == k


def test_ragged_resize_drops_non_image_rows():
    """MediaDecode(strict=False) output (null pixels for non-image media)
    must chain into RaggedResize without garbage gathers."""
    from airbyte_ray.functions.multimodal import MediaDecode, RaggedResize, gen_real_media

    t = gen_real_media(6)  # mixed PPM/BMP/WAV
    decoded = MediaDecode(strict=False)(t)
    n_images = sum(1 for v in decoded["pixels"].to_pylist() if v is not None)
    out = RaggedResize(4)(decoded)
    assert out.num_rows == n_images
    assert all(len(v) == 4 * 4 * 3 for v in out["pixels"].to_pylist())


def test_image_features_schema_stable_on_empty():
    from airbyte_ray.functions.multimodal import ImageDecode, ImageFeatures

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"a", b"b"], pa.binary())})
    decoded = ImageDecode()(t)
    full = ImageFeatures()(decoded)
    empty = ImageFeatures()(decoded.slice(0, 0))
    assert full.schema.equals(empty.schema)


def test_ngram_pairs_with_duplicate_doc_ids():
    """Duplicate corpus ids must not silently drop candidate pairs."""
    from airbyte_ray.functions.dedup import ngram_jaccard_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pa.table({
        "doc_id": ["d1", "d1", "d2", "d3"],  # d1 duplicated
        "text": [text, text, text, "totally different words here xyz abc"],
    })
    out = ngram_jaccard_pairs(
        rd.from_arrow(docs), "text", "doc_id", threshold=0.9, shingle_k=3
    ).to_pandas()
    pairs = {tuple(sorted(p)) for p in zip(out.a, out.b)}
    assert ("d1", "d2") in pairs


def test_spec_auth_per_type_required_keys(tmp_path):
    from airbyte_ray.spec import validate_config

    bad = {"source": {"format": "paginated", "api_dir": str(tmp_path),
                      "path_template": "p{page}.json",
                      "auth": {"type": "oauth2"}}}
    errs = validate_config(bad, "pipeline")
    assert any("token_dir" in e for e in errs)
    good = dict(bad)
    good["source"] = {**bad["source"], "auth": {"type": "oauth2", "token_dir": str(tmp_path)}}
    assert validate_config(good, "pipeline") == []


def test_lsh_probe_ball_matches_full_enumeration():
    """The hamming-ball probe enumeration must pick the same buckets the
    old full 2^nbits popcount scan did (ascending key within each radius)."""
    import itertools

    nbits, nprobe = 6, 5
    for qk in [0, 1, 17, 63]:
        all_keys = np.arange(1 << nbits)
        ham = np.array([bin(k ^ qk).count("1") for k in all_keys])
        expected = all_keys[np.argsort(ham, kind="stable")[:nprobe]].tolist()
        got: list[int] = []
        for r in range(nbits + 1):
            if len(got) >= nprobe:
                break
            ring = sorted(qk ^ sum(1 << p for p in c)
                          for c in itertools.combinations(range(nbits), r))
            got.extend(ring[: nprobe - len(got)])
        assert got == expected, (qk, got, expected)


def test_lsh_topk_large_nbits_fast():
    """nbits=24 must not materialize 2^24 keys (ran in O(nprobe·nbits))."""
    import time

    from airbyte_ray.functions.ann import lsh_topk

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(200),
                  "embedding": pa.array(list(emb))})
    t0 = time.perf_counter()
    out = lsh_topk(rd.from_arrow(t), emb[:2], k=3, nbits=24, nprobe=4).to_pandas()
    assert time.perf_counter() - t0 < 30
    assert set(out.query_id) <= {0, 1}


def test_policy_loser_still_advances_watermark(tmp_path):
    """Under a custom merge policy a high-LSN event that LOSES the
    comparator must still advance the committed watermark — the survivors'
    max stalled it and re-read the loser forever (review finding)."""
    import pyarrow.parquet as pq

    from airbyte_ray.pipelines.replay import LakeTable, ReplayConfig

    ev = pa.table({
        "lsn": pa.array([10, 20], pa.int64()),
        "op": ["update", "update"],
        "doc_id": ["a", "a"],
        "cursor": pa.array([5, 3], pa.int64()),  # lsn 20 has LOWER cursor → loses
    })
    p = tmp_path / "ev.parquet"
    pq.write_table(ev, p)
    lake = LakeTable(str(tmp_path / "lake"),
                     ReplayConfig(num_partitions=2,
                                  merge_policy=(("cursor", "descending"),)))
    out1 = lake.apply_log(str(p))
    assert out1["applied_events"] == 2
    assert lake.manifest.watermark == 20  # max CONSUMED, not max survivor (10)
    t = lake.to_table()
    assert t["cursor"].to_pylist() == [5]  # policy winner kept
    out2 = lake.apply_log(str(p))  # full redelivery: nothing newer
    assert out2["applied_events"] == 0


def test_hash_id_all_null_key_row():
    """All-null key rows must hash like DuckDB md5(concat_ws(...)) = md5('')
    instead of crashing on the Arrow kernel's row-dropping behavior."""
    import hashlib

    from airbyte_ray.stages.transforms import hash_id

    t = pa.table({"a": pa.array(["x", None]), "b": pa.array(["y", None])})
    out = hash_id(["a", "b"])(t)
    assert out["_airbyte_hashid"].to_pylist() == [
        hashlib.md5(b"x|y").hexdigest(), hashlib.md5(b"").hexdigest()]


def test_lake_read_after_schema_evolution(tmp_path):
    """Untouched partitions keep old-schema segments; read() must conform
    every group instead of letting the first fragment dictate the schema."""
    import pyarrow.parquet as pq
    import ray.data

    from airbyte_ray.pipelines.replay import LakeTable, ReplayConfig

    base = pa.table({"doc_id": [f"d{i}" for i in range(40)],
                     "n_tok": pa.array(range(40), pa.int32())})
    lake = LakeTable(str(tmp_path / "lake"), ReplayConfig(num_partitions=8))
    lake.init_snapshot(ray.data.from_arrow(base))
    # evolved apply (int64 + added col) touching only one key
    ev = pa.table({"lsn": pa.array([1], pa.int64()), "op": ["update"],
                   "doc_id": ["d0"],
                   "n_tok": pa.array([2**40], pa.int64()),
                   "extra": pa.array(["new"], pa.string())})
    p = tmp_path / "ev.parquet"
    pq.write_table(ev, p)
    lake.apply_log(str(p))
    blocks = [b for b in ray.get(lake.read().to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(blocks)  # plain path covers the untouched partitions
    assert t.schema.field("n_tok").type == pa.int64()
    assert "extra" in t.schema.names
    got = {r["doc_id"]: r for r in t.to_pylist()}
    assert got["d0"]["n_tok"] == 2**40 and got["d0"]["extra"] == "new"
    assert got["d1"]["n_tok"] == 1 and got["d1"]["extra"] is None


def test_asof_join_preserves_large_int64(ray_session):
    """Value columns must not round-trip through pandas float64: ids above
    2^53 came back rounded (review finding)."""
    import ray.data as rd2

    from airbyte_ray.joins import asof_join

    big = 9007199254740993  # 2^53 + 1: not representable in float64
    left = rd2.from_arrow(pa.table({
        "k": ["u", "u"], "ts": pa.array([10, 20], pa.int64()),
        "lval": pa.array([big, big + 2], pa.int64())}))
    right = rd2.from_arrow(pa.table({
        "k": ["u"], "ts": pa.array([5], pa.int64()),
        "rval": pa.array([big + 1], pa.int64())}))
    out = asof_join(left, right, by="k", on="ts", num_buckets=2)
    out = pa.concat_tables(
        [b for b in ray.get(out.to_arrow_refs()) if b.num_rows])
    vals = {r["ts"]: r for r in out.to_pylist()}
    assert vals[10]["lval"] == big and vals[10]["rval"] == big + 1
    assert vals[20]["lval"] == big + 2


def test_append_sync_retry_is_idempotent(tmp_path):
    """A retried append sync must not commit a second copy beside a crashed
    run's partial files (Ray's per-execution write UUID made the two runs'
    files coexist — review finding)."""
    import pyarrow.parquet as pq

    from airbyte_ray.config import DestinationSyncMode, StreamConfig, SyncMode
    from airbyte_ray.pipelines.incremental import SyncEngine

    src = pa.table({"id": pa.array(range(10), pa.int64()),
                    "v": pa.array(range(10), pa.int64())})
    sp = tmp_path / "src.parquet"
    pq.write_table(src, sp)
    eng = SyncEngine(str(tmp_path / "dest"), str(tmp_path / "state"))
    cfg = StreamConfig(name="s", sync_mode=SyncMode.full_refresh,
                       destination_sync_mode=DestinationSyncMode.append)
    # simulate a crashed earlier attempt of the SAME sync: partial files
    # already sit in the exact segment dir the retry will use
    ghost = tmp_path / "dest" / "s" / "seg-00000001"
    ghost.mkdir(parents=True)
    pq.write_table(src.slice(0, 4), ghost / "deadbeef_000000_000000.parquet")
    eng.sync(cfg, str(sp))
    assert eng.read("s").count() == 10  # not 14, not 20


def test_dedup_num_partitions_pinned(tmp_path):
    import pyarrow.parquet as pq
    import pytest as _pt

    from airbyte_ray.config import DestinationSyncMode, StreamConfig, SyncMode
    from airbyte_ray.pipelines.incremental import SyncEngine

    src = pa.table({"id": pa.array(range(8), pa.int64()),
                    "v": pa.array(range(8), pa.int64())})
    sp = tmp_path / "src.parquet"
    pq.write_table(src, sp)
    eng = SyncEngine(str(tmp_path / "dest"), str(tmp_path / "state"))
    mk = lambda P: StreamConfig(
        name="s", sync_mode=SyncMode.full_refresh,
        destination_sync_mode=DestinationSyncMode.append_dedup,
        primary_key=["id"], num_partitions=P)
    eng.sync(mk(8), str(sp))
    with _pt.raises(ValueError, match="fixed at first"):
        eng.sync(mk(4), str(sp))


def test_interpolation_multiline_placeholder():
    from airbyte_ray.declarative import interpolate

    assert interpolate("{{ config.a\n}}", {"config": {"a": 41}}) == 41
    assert interpolate("x-{{ config.a\n }}-y", {"config": {"a": 1}}) == "x-1-y"
