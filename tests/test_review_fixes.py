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
