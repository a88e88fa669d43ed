"""End-to-end corpus build: scrub -> quality gate -> dedup -> mix ->
tokenize -> pack -> resumable write."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from airbyte_ray.pipelines.corpus import CorpusConfig, build_corpus, hash_tokenize

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_hash_tokenize_deterministic_across_layouts():
    ds1 = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    fn = hash_tokenize("text")
    a = ds1.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("doc_id")
    b = (
        ray.data.read_parquet(DOCS, columns=["doc_id", "text"]).repartition(7)
        .map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("doc_id")
    )
    assert [list(x) for x in a.tokens] == [list(x) for x in b.tokens]
    nw = [len(t.split()) for t in a.text]
    assert [len(x) for x in a.tokens] == nw  # one token per word


def test_build_corpus_end_to_end_and_resume(tmp_path):
    out = str(tmp_path / "corpus")
    cfg = CorpusConfig(seq_len=128, eos=0, min_words=5,
                       rates={"src0": 0.5}, default_rate=1.0)
    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text", "source"])
    m = build_corpus(ds, out, cfg)
    assert m["docs_in"] == 500
    assert 0 < m["docs_after_quality"] <= m["docs_in"]
    assert 0 < m["docs_after_dedup"] <= m["docs_after_quality"]
    assert 0 < m["docs_after_mix"] <= m["docs_after_dedup"]
    assert m["tokens_total"] > 0
    assert m["sequences_out"] == (m["tokens_total"] + m["docs_after_mix"]) // 128

    files = glob.glob(out + "/seqs-*.parquet")
    assert files and os.path.exists(out + "/_SUCCESS")
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert t.num_rows == m["sequences_out"]
    assert all(n == 128 for n in t["n_tok"].to_pylist())
    toks = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    assert toks.min() >= 0 and toks.max() < 65536

    # resume: finished build is a no-op returning saved metrics
    mtimes = {f: os.path.getmtime(f) for f in files}
    m2 = build_corpus(ds, out, cfg)
    assert m2 == m
    assert {f: os.path.getmtime(f) for f in files} == mtimes


def test_build_corpus_streaming_mode_matches(tmp_path):
    cfg_m = CorpusConfig(seq_len=128, rates={"src0": 0.5})
    cfg_s = CorpusConfig(seq_len=128, rates={"src0": 0.5}, collect_metrics=False)
    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text", "source"])
    m1 = build_corpus(ds, str(tmp_path / "a"), cfg_m)
    m2 = build_corpus(ds, str(tmp_path / "b"), cfg_s)
    assert m2 == {"sequences_out": m1["sequences_out"]}
    ta = pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(str(tmp_path / "a") + "/seqs-*.parquet"))])
    tb = pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(str(tmp_path / "b") + "/seqs-*.parquet"))])
    ia = ta.take(__import__("pyarrow.compute", fromlist=["pc"]).sort_indices(ta, [("seq_id", "ascending")]))
    ib = tb.take(__import__("pyarrow.compute", fromlist=["pc"]).sort_indices(tb, [("seq_id", "ascending")]))
    assert ia.equals(ib)
