"""Unit tests for distributed k-means (functions/cluster.py) and benchmark
decontamination (functions/decontam.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from airbyte_ray.functions.cluster import assign_clusters, kmeans, kmeans_fit
from airbyte_ray.functions.decontam import (
    build_test_grams,
    decontaminate,
    mark_contaminated,
    word_ngrams,
)


def _planted(n=400, k=8, d=32, eps=0.05):
    ids = np.arange(n)
    centers = np.zeros((k, d), np.float64)
    centers[np.arange(k), np.arange(k)] = 1.0
    noise = eps * np.sin(np.outer(ids + 1, np.arange(1, d + 1)))
    emb = (centers[ids % k] + noise).astype(np.float32)
    t = pa.table({"vec_id": ids, "embedding": pa.array(list(emb))})
    return t, emb, ids, k


def test_kmeans_recovers_planted_partition():
    t, emb, ids, k = _planted()
    ds = rd.from_arrow(t).repartition(5)
    cents, labeled = kmeans(ds, init=emb[:k], iters=4)
    lab = labeled.to_pandas().sort_values("vec_id")
    assert (lab.cluster.values == ids % k).all()
    assert cents.shape == (k, 32)
    # spherical centroids are unit-norm
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)


def test_kmeans_random_init_comembership():
    t, emb, ids, k = _planted(n=320)
    ds = rd.from_arrow(t).repartition(4)
    cents = kmeans_fit(ds, k=k, iters=8, seed=11)
    lab = assign_clusters(ds, cents).to_pandas().sort_values("vec_id")
    # clusters must equal the planted residue classes up to relabeling
    mapping = {}
    for vid, cl in zip(lab.vec_id, lab.cluster):
        r = vid % k
        assert mapping.setdefault(r, cl) == cl
    assert len(set(mapping.values())) == k


def test_kmeans_euclidean_mode():
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    ids = np.arange(90)
    pts = centers[ids % 3] + 0.1 * rng.standard_normal((90, 2))
    t = pa.table({"vec_id": ids, "embedding": pa.array(list(pts.astype(np.float32)))})
    ds = rd.from_arrow(t).repartition(3)
    cents, labeled = kmeans(ds, init=pts[:3].astype(np.float32), iters=5, spherical=False)
    lab = labeled.to_pandas().sort_values("vec_id")
    assert (lab.cluster.values == ids % 3).all()
    assert np.allclose(np.sort(cents, axis=0), np.sort(centers, axis=0), atol=0.2)


def test_kmeans_empty_cluster_keeps_centroid():
    # 2 points, 3 centroids: one centroid attracts nothing and must persist
    t = pa.table({"vec_id": [0, 1],
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32()))})
    init = np.array([[1, 0], [0, 1], [-1, 0]], np.float32)
    cents = kmeans_fit(rd.from_arrow(t), init=init, iters=2)
    assert np.allclose(cents[2], [-1, 0], atol=1e-6)


def test_word_ngrams_boundaries():
    t = pa.table({"doc_id": [0, 1, 2], "text": ["a b c d", "x y", "p q r"]})
    grams, doc_idx = word_ngrams(t, "text", 3)
    assert grams.to_pylist() == ["a b c", "b c d", "p q r"]
    assert doc_idx.tolist() == [0, 0, 2]  # doc 1 too short, no cross-doc gram


def test_word_ngrams_empty_and_short():
    t = pa.table({"doc_id": [0], "text": [""]})
    grams, doc_idx = word_ngrams(t, "text", 2)
    assert len(grams) == 0 and len(doc_idx) == 0


def test_mark_and_decontaminate():
    docs = pa.table({"doc_id": [0, 1, 2], "text": [
        "the quick brown fox jumps", "totally unrelated words here now",
        "prefix quick brown fox jumps suffix"]})
    test = pa.table({"doc_id": [9], "text": ["quick brown fox jumps over"]})
    marked = mark_contaminated(rd.from_arrow(docs), build_test_grams(test, n=4),
                               n=4).to_pandas().sort_values("doc_id")
    assert marked.n_hits.tolist() == [1, 0, 1]
    clean = decontaminate(rd.from_arrow(docs), test, n=4).to_pandas()
    assert sorted(clean.doc_id.tolist()) == [1]
    dirty = decontaminate(rd.from_arrow(docs), test, n=4, keep_clean=False).to_pandas()
    assert sorted(dirty.doc_id.tolist()) == [0, 2]


def test_decontaminate_counts_multiple_hits():
    docs = pa.table({"doc_id": [0], "text": ["a b c d e f"]})
    test = pa.table({"doc_id": [1], "text": ["a b c d e"]})
    m = mark_contaminated(rd.from_arrow(docs), build_test_grams(test, n=3),
                          n=3).to_pandas()
    # test grams: 'a b c','b c d','c d e' — all three appear in the doc
    assert m.n_hits.tolist() == [3]


def test_semantic_near_dups_recovers_planted_pairs():
    from airbyte_ray.functions.cluster import semantic_near_dups

    t, emb, ids, k = _planted(n=300, k=6, d=32)
    # plant colinear copies of every 10th vector at id+1000
    import pyarrow.compute as pc
    sub = t.filter(pa.array(ids % 10 == 0))
    embc = sub["embedding"].combine_chunks()
    vals = pc.multiply(embc.flatten(), pa.scalar(3.0, pa.float32())).cast(pa.float32())
    copy = pa.table({"vec_id": pc.add(sub["vec_id"], pa.scalar(1000, pa.int64())),
                     "embedding": pa.ListArray.from_arrays(embc.offsets, vals)})
    corpus = rd.from_arrow(pa.concat_tables([t, copy])).repartition(4)
    out = semantic_near_dups(corpus, threshold=0.999, n_clusters=6, iters=4).to_pandas()
    got = {tuple(sorted(p)) for p in zip(out.a, out.b)}
    expected = {(int(i), int(i) + 1000) for i in ids[ids % 10 == 0]}
    assert expected <= got
    # precision: planted geometry keeps natural pairs well below 0.999
    # except same-cluster members with identical noiseless direction; every
    # reported pair must actually clear the threshold
    assert (out.cos >= 0.999).all()


def test_semantic_near_dups_cluster_cap():
    import pytest as _pt

    from airbyte_ray.functions.cluster import semantic_near_dups

    t, _, _, _ = _planted(n=64, k=2, d=16)
    with _pt.raises(ValueError, match="max_cluster_rows"):
        semantic_near_dups(rd.from_arrow(t), n_clusters=2, iters=2,
                           max_cluster_rows=10).to_pandas()
