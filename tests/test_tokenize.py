"""Vocab tokenizer (functions/tokenize.py) unit tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from airbyte_ray.functions.tokenize import build_vocab, encode, tokenize_corpus


def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["the cat sat on the mat", "the dog", "unseen words only"],
    })


def test_vocab_rank_order_and_ids():
    v = build_vocab(rd.from_arrow(_docs()), size=3)
    # 'the' x3 wins; then ties at 1 broken alphabetically: cat, dog
    assert v["word"].to_pylist() == ["the", "cat", "dog"]
    assert v["id"].to_pylist() == [1, 2, 3]
    assert v["id"].type == pa.int32()


def test_encode_oov_and_order():
    docs = _docs()
    v = build_vocab(rd.from_arrow(docs), size=3)
    enc = encode(rd.from_arrow(docs), v).to_pandas().sort_values("doc_id")
    toks = {r.doc_id: list(r.tokens) for r in enc.itertuples()}
    assert toks[0] == [1, 2, 0, 0, 1, 0]  # the cat OOV OOV the OOV
    assert toks[1] == [1, 3]
    assert toks[2] == [0, 0, 0]
    assert enc.n_tok.tolist() == [6, 2, 3]


def test_tokenize_corpus_roundtrip_counts():
    vocab, enc = tokenize_corpus(rd.from_arrow(_docs()), vocab_size=100)
    df = enc.to_pandas()
    # with a full vocab nothing is OOV
    assert all(0 not in list(t) for t in df.tokens)
    assert int(df.n_tok.sum()) == 11


def test_encode_empty_text():
    docs = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [""]})
    v = build_vocab(rd.from_arrow(docs), size=5)
    enc = encode(rd.from_arrow(docs), v).to_pandas()
    # '' splits to one empty-string word; it IS in the vocab of this corpus
    assert enc.n_tok.tolist() == [1]
