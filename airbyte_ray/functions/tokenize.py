"""Vocabulary tokenizer: frequency-ranked word→id vocab built over the
corpus, then a broadcast-vocab encode pass producing ``list<int32>`` token
columns — the trainable-tokenizer analog the corpus pipeline's hash
tokenizer deliberately skips (hash ids are stateless but not compact; a
frequency vocab gives dense ids 1..V with 0 reserved for OOV, the layout
embedding tables expect).

Scale shape:

* **build_vocab** — per-batch word counts are an Arrow combiner (split →
  flatten → ``TableGroupBy.count``: the exchange sees ≤ |distinct words in
  batch| rows, not corpus tokens); a native groupby-sum folds partials, and
  the top-``size`` cut is a distributed sort+limit over the DISTINCT-word
  table (≪ corpus).  Ids are ranks under (count desc, word asc) — fully
  deterministic, SQL-reproducible.
* **encode** — the (word, id) table is broadcast once (``ray.put``; vocab
  ≤ a few MB by construction) and fetched once per worker; each batch is
  one Arrow split + one ``np.searchsorted`` over the sorted vocab — no
  per-row Python, no shuffle.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import _worker_state


def _word_counts(t: pa.Table, col: str) -> pa.Table:
    words = pc.split_pattern(t[col].combine_chunks(), pattern=" ")
    flat = words.flatten()
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    g = pa.TableGroupBy(pa.table({"word": flat}), "word").aggregate([([], "count_all")])
    # pick by NAME, not positional rename — pyarrow has moved group keys
    # between first and last across versions (see agg.py pivot idiom)
    return pa.table({"word": g["word"], "c": g["count_all"]})


def build_vocab(
    ds: ray.data.Dataset,
    col: str = "text",
    size: int = 50_000,
) -> pa.Table:
    """(word, id) vocabulary of the ``size`` most frequent words; id =
    1-based rank under (count desc, word asc), 0 reserved for OOV."""
    from ray.data.aggregate import Sum

    counts = (
        ds.select_columns([col])
        .map_batches(partial(_word_counts, col=col), batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="n"))
    )
    top = counts.sort(["n", "word"], descending=[True, False]).limit(size).take_all()
    return pa.table({
        "word": pa.array([r["word"] for r in top], pa.string()),
        "id": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
    })


def _encode_batch(t: pa.Table, vref, col: str, id_col: str, out: str) -> pa.Table:
    words_sorted, ids_sorted = _worker_state(
        ("vocab", vref.hex()), lambda: ray.get(vref)
    )
    words = pc.split_pattern(t[col].combine_chunks(), pattern=" ")
    flat = np.asarray(words.flatten().to_pylist(), dtype=object)
    offsets = words.offsets
    if len(flat) and len(words_sorted):
        pos = np.searchsorted(words_sorted, flat)
        pos = np.clip(pos, 0, len(words_sorted) - 1)
        hit = words_sorted[pos] == flat
        ids = np.where(hit, ids_sorted[pos], np.int32(0)).astype(np.int32)
    else:
        ids = np.zeros(len(flat), np.int32)
    toks = pa.ListArray.from_arrays(offsets, pa.array(ids, pa.int32()))
    n_tok = pc.list_value_length(toks).cast(pa.int64())
    return pa.table({id_col: t[id_col], out: toks, "n_tok": n_tok})


def encode(
    ds: ray.data.Dataset,
    vocab: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    out: str = "tokens",
) -> ray.data.Dataset:
    """Tokenize ``col`` against the broadcast vocab: (id_col, out
    list<int32>, n_tok).  OOV words map to 0."""
    words = np.asarray(vocab["word"].to_pylist(), dtype=object)
    ids = vocab["id"].to_numpy(zero_copy_only=False).astype(np.int32)
    order = np.argsort(words)
    vref = ray.put((words[order], ids[order]))
    return ds.select_columns([id_col, col]).map_batches(
        partial(_encode_batch, vref=vref, col=col, id_col=id_col, out=out),
        batch_format="pyarrow",
    )


def tokenize_corpus(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
) -> tuple[pa.Table, ray.data.Dataset]:
    """Build the vocab (one counting pass) then encode (one pass).
    Returns ``(vocab, encoded)``."""
    vocab = build_vocab(ds, col=col, size=vocab_size)
    return vocab, encode(ds, vocab, col=col, id_col=id_col)
