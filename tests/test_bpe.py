"""BPE tokenizer: hand-derivable training, greedy encode, corpus wiring.

The planted-pool derivation is the same one documented in
``driver_queries.q_tokenize_bpe`` (Sennrich-style merges, lexicographic
tie-break, post-hoc sorted symbol ids).
"""

import numpy as np
import pyarrow as pa
import ray.data

from airbyte_ray.functions.bpe import (
    BpeVocab,
    _encode_word,
    encode_bpe,
    train_bpe,
    train_bpe_corpus,
)


def _counts(pairs):
    return pa.table({
        "word": pa.array([w for w, _ in pairs]),
        "c": pa.array([c for _, c in pairs], pa.int64()),
    })


def test_train_matches_hand_derivation():
    v = train_bpe(_counts([("aaaa", 7), ("aab", 7), ("bab", 7), ("bb", 7)]), 3)
    assert v.merges == [("a", "a"), ("a", "b"), ("aa", "aa")]
    assert v.sym2id == {"a": 1, "aa": 2, "aaaa": 3, "ab": 4, "b": 5}


def test_train_frequency_order_beats_lex_order():
    # (b,b) outweighs (a,a) here, so it must merge first despite sorting later
    v = train_bpe(_counts([("bb", 10), ("aa", 1)]), 1)
    assert v.merges == [("b", "b")]


def test_train_stops_when_no_pairs_left():
    v = train_bpe(_counts([("ab", 3)]), 10)
    assert v.merges == [("a", "b")]  # single merge exhausts every pair


def test_encode_word_greedy_lowest_rank_and_oov():
    v = BpeVocab(merges=[("a", "a"), ("a", "b"), ("aa", "aa")],
                 sym2id={"a": 1, "aa": 2, "aaaa": 3, "ab": 4, "b": 5})
    ranks = v.ranks
    assert _encode_word("aaaa", ranks, v.sym2id).tolist() == [3]
    assert _encode_word("aab", ranks, v.sym2id).tolist() == [2, 5]
    assert _encode_word("bab", ranks, v.sym2id).tolist() == [5, 4]
    # char never seen in training → OOV id 0
    assert _encode_word("axb", ranks, v.sym2id).tolist() == [1, 0, 5]
    assert _encode_word("", ranks, v.sym2id).tolist() == []


def test_encode_dataset_roundtrip(ray_session):
    v = BpeVocab(merges=[("a", "a"), ("a", "b"), ("aa", "aa")],
                 sym2id={"a": 1, "aa": 2, "aaaa": 3, "ab": 4, "b": 5})
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["aaaa aab", "bab bb bab", None]),
    }))
    out = {r["doc_id"]: (r["tokens"], r["n_tok"])
           for r in encode_bpe(ds, v).take_all()}
    assert list(out[1][0]) == [3, 2, 5] and out[1][1] == 3
    assert list(out[2][0]) == [5, 4, 5, 5, 5, 4] and out[2][1] == 6
    # null text → fill_null("") → one empty word → zero tokens
    assert list(out[3][0]) == [] and out[3][1] == 0


def test_train_bpe_corpus_distributed(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["aaaa aab bab bb"] * 20),
    })).repartition(4)
    v = train_bpe_corpus(ds, col="text", num_merges=3)
    assert v.merges == [("a", "a"), ("a", "b"), ("aa", "aa")]


def test_corpus_build_with_bpe(tmp_path, ray_session):
    from airbyte_ray.pipelines.corpus import CorpusConfig, build_corpus

    texts = ["the cat sat on the mat and the cat sat again ok yes"] * 6 + [
        "a dog ran over the hill and the dog ran back home now"] * 6
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(12), pa.int64()),
        "text": pa.array([f"{t} uniq{i}" for i, t in enumerate(texts)]),
        "source": pa.array(["web"] * 12),
    }))
    m = build_corpus(ds, str(tmp_path / "out"),
                     CorpusConfig(seq_len=16, tokenizer="bpe", bpe_merges=8,
                                  scrub=False, dedup=False))
    assert m["bpe_merges_learned"] == 8
    assert m["sequences_out"] > 0
