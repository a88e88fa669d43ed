"""TF-IDF / BM25 relevance scoring and the persisted inverted index."""

import glob
import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from airbyte_ray.functions.relevance import (
    append_to_text_index,
    bm25_search_index,
    bm25_topk,
    build_text_index,
    corpus_stats,
    doc_terms,
    probed_files,
    term_df,
    tfidf_topk_terms,
)

TEXTS = [
    "the fast hash join and the slow merge join",
    "stream stream stream spark window",
    "hash hash hash hash merge",
    "totally unrelated words here now",
    "spark hash merge stream mix of all",
    "the the the the",
]
Q = ["hash", "merge", "spark", "stream"]
K1, B = 1.2, 0.75


def _docs():
    return pa.table({
        "doc_id": pa.array(list(range(len(TEXTS))), pa.int64()),
        "text": pa.array(TEXTS),
    })


def _tbl(ds) -> pa.Table:
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(parts).combine_chunks() if parts else pa.table({})


def _ref_bm25(idf_kind="lucene"):
    """Pure-Python BM25 reference with the engine's documented op order."""
    n_docs = len(TEXTS)
    dls = [len(t.split(" ")) for t in TEXTS]
    avgdl = float(sum(dls)) / float(n_docs)
    df = {q: sum(1 for t in TEXTS if q in t.split(" ")) for q in Q}
    out = {}
    for i, t in enumerate(TEXTS):
        cnt = Counter(t.split(" "))
        if not any(cnt.get(q) for q in Q):
            continue
        s = 0.0
        for q in sorted(Q):
            tf = float(cnt.get(q, 0))
            r = (float(n_docs - df[q]) + 0.5) / (float(df[q]) + 0.5)
            idf = math.log(1.0 + r) if idf_kind == "lucene" else r
            s = s + idf * ((tf * (K1 + 1.0))
                           / (tf + K1 * ((1.0 - B) + B * (dls[i] / avgdl))))
        out[i] = s
    return out


def test_corpus_stats():
    n, s = corpus_stats(ray.data.from_arrow(_docs()))
    assert (n, s) == (len(TEXTS), sum(len(t.split(" ")) for t in TEXTS))


def test_doc_terms_and_df_exact():
    ds = ray.data.from_arrow(_docs())
    got = {(r["doc_id"], r["word"]): (r["tf"], r["dl"])
           for r in _tbl(doc_terms(ds, with_dl=True)).to_pylist()}
    ref = {}
    for i, t in enumerate(TEXTS):
        ws = t.split(" ")
        for w, c in Counter(ws).items():
            ref[(i, w)] = (c, len(ws))
    assert got == ref
    df = {r["word"]: r["df"] for r in _tbl(term_df(doc_terms(ds))).to_pylist()}
    for w in set(w for t in TEXTS for w in t.split(" ")):
        assert df[w] == sum(1 for t in TEXTS if w in t.split(" "))


@pytest.mark.parametrize("idf_kind", ["lucene", "rational"])
def test_bm25_topk_matches_reference(idf_kind):
    ds = ray.data.from_arrow(_docs())
    got = {r["doc_id"]: r["score"]
           for r in _tbl(bm25_topk(ds, Q, k=10, idf_kind=idf_kind)).to_pylist()}
    ref = _ref_bm25(idf_kind)
    assert set(got) == set(ref)
    for k in ref:  # identical op order → bit-exact, not just close
        assert got[k] == ref[k]


def test_bm25_no_matches_is_empty():
    ds = ray.data.from_arrow(_docs())
    assert bm25_topk(ds, ["zzzznope"], k=5).count() == 0


def test_bm25_rejects_empty_query():
    with pytest.raises(ValueError):
        bm25_topk(ray.data.from_arrow(_docs()), [])


def test_tfidf_topk_lucene_matches_reference():
    ds = ray.data.from_arrow(_docs())
    got = _tbl(tfidf_topk_terms(ds, n=2, idf_kind="lucene")).to_pylist()
    n_docs = len(TEXTS)
    df = Counter(w for t in TEXTS for w in set(t.split(" ")))
    ref = {}
    for i, t in enumerate(TEXTS):
        scores = sorted(
            ((c * math.log(float(n_docs + 1) / (df[w] + 1.0)), w, c)
             for w, c in Counter(t.split(" ")).items()),
            key=lambda x: (-x[0], x[1]))[:2]
        ref[i] = [(w, c, df[w], s) for s, w, c in scores]
    assert len(got) == sum(len(v) for v in ref.values())
    for r in got:
        w, c, d, s = ref[r["doc_id"]][r["rnk"] - 1]
        assert (r["word"], r["tf"], r["df"]) == (w, c, d)
        assert r["tfidf"] == s


def test_index_search_equals_from_scratch(tmp_path):
    ds = ray.data.from_arrow(_docs())
    idx = str(tmp_path / "ti")
    meta = build_text_index(ds, idx, n_shards=8)
    assert meta["n_docs"] == len(TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in _tbl(bm25_search_index(idx, Q, k=10)).to_pylist()}
    ref = _ref_bm25("lucene")
    assert set(got) == set(ref)
    for k in ref:  # sum order may differ across shards → approx
        assert got[k] == pytest.approx(ref[k], rel=1e-12)


def test_index_probe_reads_only_touched_shards(tmp_path):
    idx = str(tmp_path / "ti")
    build_text_index(ray.data.from_arrow(_docs()), idx, n_shards=16)
    all_files = glob.glob(os.path.join(idx, "postings", "shard=*", "*.parquet"))
    pf = probed_files(idx, ["hash"])
    assert pf and set(pf) < set(all_files)
    # every probed file must live in the single shard 'hash' hashes to
    shards = {os.path.basename(os.path.dirname(p)) for p in pf}
    assert len(shards) == 1


def test_index_append_accumulates(tmp_path):
    idx = str(tmp_path / "ti")
    docs = _docs()
    build_text_index(ray.data.from_arrow(docs.slice(0, 3)), idx, n_shards=8)
    meta = append_to_text_index(
        ray.data.from_arrow(docs.slice(3).set_column(
            0, "doc_id", pa.array([3, 4, 5], pa.int64()))), idx)
    assert meta["n_docs"] == len(TEXTS)
    assert meta["sum_dl"] == sum(len(t.split(" ")) for t in TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in _tbl(bm25_search_index(idx, Q, k=10)).to_pylist()}
    ref = _ref_bm25("lucene")
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-12)


def test_bad_idf_kind_raises():
    with pytest.raises(ValueError):
        _tbl(tfidf_topk_terms(ray.data.from_arrow(_docs()), idf_kind="nope"))


def _ref_ngrams(n):
    """Exhaustive n-gram counter over TEXTS."""
    c = Counter()
    for t in TEXTS:
        ws = t.split(" ")
        for i in range(len(ws) - n + 1):
            c[" ".join(ws[i:i + n])] += 1
    return c


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_topk_matches_exhaustive(n):
    from airbyte_ray.functions.relevance import ngram_topk

    k = 8
    out = _tbl(ngram_topk(
        ray.data.from_arrow(_docs()).repartition(3), n=n, k=k))
    ref = sorted(_ref_ngrams(n).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = list(zip(out["gram"].to_pylist(), out["cnt"].to_pylist()))
    assert got == ref
    assert out["rnk"].to_pylist() == list(range(1, len(ref) + 1))


def test_ngram_topk_short_docs_yield_no_grams():
    from airbyte_ray.functions.relevance import ngram_topk

    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["one", "two"])})
    out = _tbl(ngram_topk(ray.data.from_arrow(docs), n=2, k=5))
    assert out.num_rows == 0
