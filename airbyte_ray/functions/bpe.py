"""Byte-pair-encoding subword tokenizer: trainable merges + a vectorized,
broadcast-vocab encode stage — the real subword stage the corpus pipeline's
SipHash-per-word placeholder (``pipelines/corpus.py``) declares it is not.

Algorithm is the published BPE for NMT formulation (Sennrich et al. 2016,
arXiv:1508.07909): symbols start as characters, each merge step joins the
most frequent adjacent symbol pair (ties broken by lexicographically
smallest pair, making training fully deterministic); encoding replays the
merge table greedily, always applying the LOWEST-rank pair present.

Scale shape (the part that matters at 100 TB):

* **training input is the DISTINCT-word count table**, not the corpus —
  the counting pass is distributed (``tokenize.build_vocab``'s per-batch
  Arrow combiner + one groupby-sum exchange, ≤ |distinct words| rows), and
  the merge loop runs driver-side over that table, the same economics as
  every published BPE trainer.  The loop is **incremental**: pair counts
  are built once, an inverted pair→words index confines each merge's
  update to the words that actually contain the pair — O(touched words)
  per merge, not O(vocab) per merge.
* **encode is one streaming pass**: the (ranks, sym→id) tables are
  ``ray.put`` once and fetched once per worker (``_worker_state``); each
  batch encodes only its DISTINCT words (per-worker word→ids cache makes
  the steady state amortized O(new words)), then scatters the encodings to
  occurrences with a fully vectorized ranged-gather — no per-token Python
  on the hot path.

Reference analog: none — Airbyte has no content operators; this is
brief-driven (training-data pipeline family).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import _worker_state


@dataclass
class BpeVocab:
    """Ordered merge table + final symbol ids.

    ``sym2id`` assigns ids AFTER training by sorting the final symbol set
    (base characters + every merge output) lexicographically, 1-based;
    id 0 is reserved for characters never seen in training (OOV).  The
    post-hoc sort makes ids independent of merge-loop internals and lets a
    planted-corpus oracle derive every id by hand.
    """

    merges: list[tuple[str, str]] = field(default_factory=list)
    sym2id: dict = field(default_factory=dict)

    @property
    def ranks(self) -> dict:
        return {p: r for r, p in enumerate(self.merges)}


def train_bpe(word_counts: pa.Table, num_merges: int,
              word_col: str = "word", count_col: str = "c") -> BpeVocab:
    """Learn ``num_merges`` merges from a (word, count) table.

    Driver-side over the distinct-word table (≪ corpus); incremental pair
    maintenance via a pair→word-ids inverted index.  Deterministic: best
    pair = max count, ties to the lexicographically smallest pair.
    """
    words = [list(w) for w in word_counts[word_col].to_pylist()]
    counts = word_counts[count_col].to_numpy(zero_copy_only=False).astype(np.int64)

    pair_counts: Counter = Counter()
    pair2words: dict[tuple, set] = {}
    base_syms: set[str] = set()

    def add_word(wi: int, sign: int) -> None:
        syms, n = words[wi], int(counts[wi]) * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += n
            if sign > 0:
                pair2words.setdefault(p, set()).add(wi)

    for wi, syms in enumerate(words):
        base_syms.update(syms)
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair2words.get(best, ())):
            add_word(wi, -1)  # retract this word's pairs
            words[wi] = _merge_pairs(words[wi], best, merged)
            add_word(wi, +1)  # re-add with the pair folded

    syms = sorted(base_syms | {a + b for a, b in merges})
    return BpeVocab(merges=merges, sym2id={s: i + 1 for i, s in enumerate(syms)})


def _merge_pairs(syms: list, pair: tuple, merged: str) -> list:
    """Fold all non-overlapping occurrences of ``pair``, left to right —
    the same convention in training and encoding."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode_word(word: str, ranks: dict, sym2id: dict) -> np.ndarray:
    """Greedy BPE encode of one word: repeatedly apply the lowest-rank
    merge present.  Called once per DISTINCT word per worker (cached)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_pairs(syms, best_pair, best_pair[0] + best_pair[1])
    return np.array([sym2id.get(s, 0) for s in syms], np.int32)


def _ranged_gather(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized ``concat(flat[s:s+l] for s, l in zip(starts, lens))``."""
    total = int(lens.sum())
    if total == 0:
        return flat[:0]
    idx = np.repeat(starts, lens) + np.arange(total) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    return flat[idx]


def _encode_column(col, ranks: dict, sym2id: dict,
                   cache: dict) -> tuple[pa.Array, pa.Array]:
    """Encode one string column → (tokens list<int32>, n_tok int64).

    Distinct words encode once (per-worker ``cache``), occurrences get
    their ids via one vectorized ranged-gather, the doc-level list array is
    rebuilt from the word offsets — zero per-token Python.
    """
    words = pc.split_pattern(pc.fill_null(col.combine_chunks(), ""), pattern=" ")
    flat = np.asarray(words.flatten().to_pylist(), dtype=object)
    doc_off = words.offsets.to_numpy().astype(np.int64)
    if len(flat):
        uniq, inv = np.unique(flat, return_inverse=True)
    else:
        uniq, inv = np.empty(0, object), np.empty(0, np.int64)
    enc = []
    for w in uniq:
        e = cache.get(w)
        if e is None:
            e = cache[w] = _encode_word(w, ranks, sym2id)
        enc.append(e)
    enc_len = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    enc_flat = np.concatenate(enc) if enc else np.empty(0, np.int32)
    enc_off = np.r_[0, np.cumsum(enc_len)]
    occ_len = enc_len[inv]
    vals = _ranged_gather(enc_flat, enc_off[inv], occ_len)
    doc_tok_off = np.r_[0, np.cumsum(occ_len)][doc_off]
    toks = pa.ListArray.from_arrays(
        pa.array(doc_tok_off, pa.int32()), pa.array(vals, pa.int32())
    )
    return toks, pc.list_value_length(toks).cast(pa.int64())


def _encode_batch(t: pa.Table, vref, col: str, id_col: str, out: str) -> pa.Table:
    ranks, sym2id = _worker_state(("bpe", vref.hex()), lambda: ray.get(vref))
    cache = _worker_state(("bpe_words", vref.hex()), dict)
    toks, n_tok = _encode_column(t[col], ranks, sym2id, cache)
    return pa.table({id_col: t[id_col], out: toks, "n_tok": n_tok})


def encode_bpe(
    ds: ray.data.Dataset,
    vocab: BpeVocab,
    col: str = "text",
    id_col: str = "doc_id",
    out: str = "tokens",
) -> ray.data.Dataset:
    """Tokenize ``col`` against the broadcast merge table: one streaming
    pass emitting (id_col, out list<int32>, n_tok)."""
    vref = ray.put((vocab.ranks, vocab.sym2id))
    return ds.select_columns([id_col, col]).map_batches(
        partial(_encode_batch, vref=vref, col=col, id_col=id_col, out=out),
        batch_format="pyarrow",
    )


def train_bpe_corpus(
    ds: ray.data.Dataset, col: str = "text", num_merges: int = 1000
) -> BpeVocab:
    """Distributed word count (one combiner pass + one small exchange),
    then driver-side merge learning over the distinct-word table."""
    from ray.data.aggregate import Sum

    from .tokenize import _word_counts

    counts = (
        ds.select_columns([col])
        .map_batches(partial(_word_counts, col=col), batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="n"))
    )
    # collect the distinct-word table as Arrow directly (a pandas
    # round-trip re-typed columns and copied twice)
    blocks = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(blocks) if blocks else pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    return train_bpe(tbl, num_merges, word_col="word", count_col="n")


def bpe_tokenize_stage(vocab: BpeVocab, col: str = "clean_text"):
    """Batch-fn adapter for ``CorpusConfig.tokenizer``: same output contract
    as ``corpus.hash_tokenize`` (appends ``tokens`` + ``n_tok``, keeps the
    input columns).  The vocab rides the task closure (ranks table ≤ a few
    MB by construction — Ray ships it once per worker via the task spec);
    the word cache is per-worker state keyed by the merge count."""
    ranks, sym2id = vocab.ranks, vocab.sym2id
    # cache key computed ONCE on the driver and closed over as a constant —
    # an id()/hash() taken inside the task would differ per worker process.
    # Keyed by a digest of the FULL merge table + symbol map: two vocabs
    # sharing merge count and top merges (common across re-trainings, since
    # top pairs are stable) must not collide in a long-lived worker's cache
    # (advisory finding).
    import hashlib

    _h = hashlib.sha256()
    for a, b in vocab.merges:
        _h.update(a.encode())
        _h.update(b"\x00")
        _h.update(b.encode())
        _h.update(b"\x01")
    for s in sorted(sym2id):
        _h.update(s.encode())
        _h.update(b"\x02")
    cache_key = ("bpe_stage_words", _h.hexdigest())

    def fn(t: pa.Table) -> pa.Table:
        cache = _worker_state(cache_key, dict)
        toks, n_tok = _encode_column(t[col], ranks, sym2id, cache)
        return t.append_column("tokens", toks).append_column("n_tok", n_tok)

    return fn
