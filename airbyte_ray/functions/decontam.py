"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a (small) held-out test/benchmark set.

This is the standard training-data hygiene pass (n-gram overlap against
evaluation sets) and composes from the same primitives as the dedup
family.  Reference analog: none (Airbyte has no content ops); the exact
black-box contract is pinned by the DuckDB oracle in
``driver_queries.ORACLE_SQL['decontaminate']``.

Scale shape:

* The test-set gram table is built once and **broadcast** (``ray.put`` of a
  deduplicated Arrow string array) — test sets are small by definition
  (benchmarks, not corpora).  Each worker fetches it once
  (``config._worker_state``), not per batch.
* The corpus side is a single streaming ``map_batches`` pass: words are
  split with the Arrow C++ kernel, n-gram strings are assembled with
  ``binary_join_element_wise`` over shifted slices of the flat word array
  (no per-row Python), doc-boundary-crossing windows are masked with one
  ``searchsorted``, and membership is one ``pc.is_in`` against the
  broadcast gram set.
* For test sets too large to broadcast, prune first with
  :func:`airbyte_ray.functions.bloom.bloom_anti_join` on gram hashes and
  verify survivors exactly — same two-phase pattern as the n-gram Jaccard
  dedup.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import _worker_state


def word_ngrams(t: pa.Table, col: str, n: int) -> tuple[pa.Array, np.ndarray]:
    """Vectorized word n-grams for every row of ``t[col]``.

    Returns ``(grams, doc_idx)``: a flat string array of all n-grams
    (space-joined, in document order) and the row index each gram came
    from.  Rows with fewer than ``n`` words contribute no grams.
    Tokenization is a plain single-space split (kept deliberately simple so
    the DuckDB ``string_split(text, ' ')`` oracle is the same function).
    """
    words = pc.split_pattern(t[col].combine_chunks(), pattern=" ")
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat)
    if m < n:
        return pa.array([], pa.string()), np.array([], np.int64)
    n_starts = m - n + 1
    parts = [flat.slice(j, n_starts) for j in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    starts = np.arange(n_starts, dtype=np.int64)
    # row owning each start position; valid iff the window ends inside it
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + n <= offsets[doc_of + 1]
    grams = grams_all.filter(pa.array(valid))
    return grams, doc_of[valid]


def build_test_grams(test: pa.Table, col: str = "text", n: int = 8) -> pa.Array:
    """Deduplicated n-gram set of the benchmark table (driver-side; test
    sets are small by contract)."""
    grams, _ = word_ngrams(test, col, n)
    return pc.unique(grams)


def _mark_batch(t: pa.Table, gref, col: str, id_col: str, n: int, out: str) -> pa.Table:
    gram_set = _worker_state(("decontam_grams", gref.hex()), lambda: ray.get(gref))
    if t.num_rows == 0:
        return pa.table({id_col: pa.array([], t[id_col].type),
                         out: pa.array([], pa.int64())})
    grams, doc_idx = word_ngrams(t, col, n)
    hits = np.zeros(t.num_rows, dtype=np.int64)
    if len(grams) and len(gram_set):
        mask = pc.is_in(grams, value_set=gram_set).to_numpy(zero_copy_only=False)
        np.add.at(hits, doc_idx[mask], 1)
    return pa.table({id_col: t[id_col], out: pa.array(hits)})


def mark_contaminated(
    corpus: ray.data.Dataset,
    test_grams: pa.Array,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    out: str = "n_hits",
) -> ray.data.Dataset:
    """Label every corpus doc with its count of matching test n-grams."""
    gref = ray.put(test_grams)
    return corpus.select_columns([id_col, col]).map_batches(
        partial(_mark_batch, gref=gref, col=col, id_col=id_col, n=n, out=out),
        batch_format="pyarrow",
    )


def decontaminate(
    corpus: ray.data.Dataset,
    test: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    keep_clean: bool = True,
) -> ray.data.Dataset:
    """Drop (or keep only) corpus docs sharing ≥1 word n-gram with ``test``.

    Returns the surviving rows' ``(id_col,)`` when ``keep_clean`` else the
    contaminated ids — downstream joins/filters take it from there."""
    marked = mark_contaminated(corpus, build_test_grams(test, col, n),
                               col=col, id_col=id_col, n=n)
    want_zero = keep_clean

    def pick(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["n_hits"], 0) if want_zero else pc.greater(t["n_hits"], 0)
        return t.filter(mask).select([id_col])

    return marked.map_batches(pick, batch_format="pyarrow")
