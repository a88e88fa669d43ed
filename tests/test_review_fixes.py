"""Regression tests for the round-3 review batch: null sampling keys,
namespaced state-migration filenames, quantile validation, unbiased
k-means init, and the shared sketch fold scaffold."""

import json

import numpy as np
import pyarrow as pa
import pytest
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
