"""Deterministic synthetic fixtures: base lake table + CDC change-event log.

Modeled on the reference's seeded synthetic source (source-faker:
``airbyte-integrations/connectors/source-faker/source_faker/streams.py:62-120``
— seeded per-slice determinism) and the Debezium change-event shape
(``DebeziumEventUtils.java:21-64``; deletes are key+metadata tombstones per
``docs/understanding-airbyte/cdc.md:29``).  See FIXTURES.md F1–F3.

Everything is driven by ``numpy.random.Generator(PCG64(seed))`` and fully
vectorized; the same (seed, params) always produces the same Arrow table.
For bench scale, generate in chunks (seed = f(base_seed, chunk)) and write
parquet once — both parallelism levels then replay identical input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schemas import BASE_SCHEMA, CDC_UPDATED_AT, TOKENS_TYPE

VOCAB = 50257
SOURCES = ("web", "books", "code", "wiki")
_SOURCE_W = np.array([0.55, 0.2, 0.15, 0.1])
LANGS = ("en", "de", "fr", "es", "zh")

#: epoch (us) of 2024-01-01T00:00:00Z — base of the synthetic updated_at clock.
_T0_US = 1_704_067_200_000_000


def _gen_tokens(rng: np.random.Generator, n: int) -> tuple[pa.ListArray, np.ndarray]:
    """Token lists: length ~ LogNormal(4.0, 1.0) clipped to [8, 2048],
    values uniform in [0, VOCAB).  Returns (list<int32> array, lengths)."""
    lengths = np.clip(rng.lognormal(4.0, 1.0, n).astype(np.int64), 8, 2048)
    total = int(lengths.sum())
    if total > np.iinfo(np.int32).max:  # int32 list offsets would silently wrap
        raise ValueError(
            f"{total} total tokens overflows int32 list offsets — generate in "
            "shards (partition_pools + per-shard gen) instead of one table"
        )
    values = rng.integers(0, VOCAB, total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    arr = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), pa.array(values, pa.int32())
    )
    return arr, lengths


def doc_id(i: int | np.ndarray) -> np.ndarray | str:
    if np.isscalar(i):
        return f"doc-{i:08d}"
    # U20 keeps indices ≥ 1e8 intact (U8 truncated them to 8 chars, making
    # distinct keys collide and disagree with the scalar path)
    return np.char.add("doc-", np.char.zfill(np.asarray(i).astype("U20"), 8))


def gen_base(n: int, seed: int = 42) -> pa.Table:
    """F1: initial snapshot of the tokenized-sequence table, keys doc-0…doc-{n-1}."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    tokens, lengths = _gen_tokens(rng, n)
    src = rng.choice(len(SOURCES), n, p=_SOURCE_W)
    return pa.Table.from_arrays(
        [
            pa.array(doc_id(np.arange(n))),
            tokens,
            pa.array(lengths.astype(np.int32)),
            pa.array(np.array(SOURCES)[src]),
        ],
        schema=BASE_SCHEMA,
    )


def _zipf_keys(rng: np.random.Generator, n_keys: int, size: int, alpha: float) -> np.ndarray:
    """Skewed key choice over [0, n_keys): zipf-ranked so ~1% of keys take a
    large share of events (exercises hot-key handling)."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    w = ranks ** (-alpha)
    w /= w.sum()
    return rng.choice(n_keys, size=size, p=w)


def partition_pools(n_keys: int, num_partitions: int, start: int = 0) -> list[np.ndarray]:
    """Split key indices [start, start+n_keys) by the ENGINE's partition hash
    (``pipelines.replay.stable_hash(doc_id) % P``) — used to generate
    key-partitioned (sharded-WAL-style) change logs whose files are aligned
    with lake partitions."""
    from .pipelines.replay import stable_hash

    idx = np.arange(start, start + n_keys)
    part = (stable_hash(doc_id(idx)) % np.uint64(num_partitions)).astype(np.int64)
    return [idx[part == p] for p in range(num_partitions)]


def gen_events(
    n_events: int,
    n_base: int,
    seed: int = 43,
    update_ratio: float = 0.5,
    delete_ratio: float = 0.05,
    zipf_alpha: float = 1.1,
    dup_prob: float = 0.05,
    disorder_window: int = 32,
    start_lsn: int = 1,
    v2: bool = False,
    key_pool: np.ndarray | None = None,
    insert_pool: np.ndarray | None = None,
) -> pa.Table:
    """F2 (and F3 when ``v2=True``): change-event log.

    * ``lsn``: strictly monotonic, unique, with gaps (pg LSN analog).
    * ops: ``update``/``delete`` target existing keys (zipf-skewed),
      ``insert`` creates new keys above ``n_base``.
    * deletes are tombstones (payload columns null).
    * at-least-once: with prob ``dup_prob`` an event is re-emitted verbatim
      (same lsn) later in the log.
    * ordering: rows are locally shuffled within ``disorder_window`` so the
      log is not lsn-sorted on disk (the engine must sort per partition).
    * ``v2`` (schema-evolution epoch, FIXTURES F3): adds nullable ``lang``,
      widens ``n_tok`` to int64, drops ``source``.
    Chained-epoch note: successive gen_events calls reuse the same insert
    key range (n_base + permutation), so a later epoch's op='insert' may hit
    an existing key — the engine treats insert as upsert (Debezium
    snapshot-collision parity), so this is exercised deliberately.

    * ``key_pool``/``insert_pool``: restrict update/delete keys to
      ``key_pool`` (zipf over the pool) and draw insert keys in order from
      ``insert_pool`` — generates partition-aligned log shards (see
      :func:`partition_pools`).
    """
    rng = np.random.default_rng(np.random.PCG64(seed))
    lsn = start_lsn + np.cumsum(rng.integers(1, 4, n_events, dtype=np.int64)) - 1

    r = rng.random(n_events)
    op = np.where(r < update_ratio, "update", np.where(r < update_ratio + delete_ratio, "delete", "insert"))
    is_ins = op == "insert"
    n_ins = int(is_ins.sum())

    keys = np.empty(n_events, dtype=np.int64)
    if key_pool is not None:
        if len(key_pool) == 0:
            raise ValueError("key_pool is empty — a partition with no keys "
                             "cannot source update/delete events")
        draws = _zipf_keys(rng, len(key_pool), int((~is_ins).sum()), zipf_alpha)
        keys[~is_ins] = key_pool[draws]
    else:
        keys[~is_ins] = _zipf_keys(rng, max(n_base, 1), int((~is_ins).sum()), zipf_alpha)
    if insert_pool is not None:
        if n_ins > len(insert_pool):
            raise ValueError(f"insert_pool too small: {n_ins} > {len(insert_pool)}")
        keys[is_ins] = insert_pool[:n_ins]
    else:
        # inserts: new keys above the base range (new unique keys)
        keys[is_ins] = n_base + rng.permutation(n_ins)

    tokens, lengths = _gen_tokens(rng, n_events)
    is_del = op == "delete"
    del_mask = pa.array(is_del)
    tokens = pa.compute.if_else(del_mask, pa.nulls(n_events, TOKENS_TYPE), tokens)
    n_tok = pa.compute.if_else(del_mask, pa.nulls(n_events, pa.int32()), pa.array(lengths.astype(np.int32)))

    updated_at = (_T0_US + lsn * 1_000_000 + rng.integers(0, 1000, n_events)).astype("datetime64[us]")

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn),
        "op": pa.array(op.astype(object), pa.string()),
        "doc_id": pa.array(doc_id(keys)),
        "tokens": tokens,
        "n_tok": n_tok,
    }
    if v2:
        cols["n_tok"] = cols["n_tok"].cast(pa.int64())
        lang = np.array(LANGS)[rng.integers(0, len(LANGS), n_events)]
        cols["lang"] = pa.compute.if_else(del_mask, pa.nulls(n_events, pa.string()), pa.array(lang))
    else:
        src = np.array(SOURCES)[rng.choice(len(SOURCES), n_events, p=_SOURCE_W)]
        cols["source"] = pa.compute.if_else(del_mask, pa.nulls(n_events, pa.string()), pa.array(src))
    cols[CDC_UPDATED_AT] = pa.array(updated_at).cast(pa.timestamp("us", tz="UTC"))

    t = pa.table(cols)

    # at-least-once redelivery: duplicate a sample of rows verbatim
    if dup_prob > 0:
        dup_idx = np.flatnonzero(rng.random(n_events) < dup_prob)
        if len(dup_idx):
            t = pa.concat_tables([t, t.take(dup_idx)])

    # local disorder: shuffle within windows of `disorder_window`
    if disorder_window > 1:
        m = t.num_rows
        idx = np.arange(m)
        noise = rng.integers(0, disorder_window, m)
        t = t.take(np.argsort(idx + noise, kind="stable"))
    return t


def next_lsn(events: pa.Table) -> int:
    """First free lsn after an event table (for chaining epochs)."""
    return int(pa.compute.max(events["lsn"]).as_py()) + 1
