"""Flagship pipeline correctness: CDC replay vs the sequential oracle.

Mirrors the reference acceptance suites: CdcSourceTest (snapshot/update/
delete), DestinationAcceptanceTest.testIncrementalDedupeSync (latest per PK),
and the normalization golden corpus — FIXTURES F6 invariants."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from airbyte_ray import gen
from airbyte_ray.oracle import replay_oracle
from airbyte_ray.pipelines.replay import LakeTable, ReplayConfig
from airbyte_ray.state.manifest import Manifest

N_BASE = 300
N_EVENTS = 1500


@pytest.fixture()
def fixtures(tmp_path):
    base = gen.gen_base(N_BASE, seed=11)
    events = gen.gen_events(N_EVENTS, N_BASE, seed=12)
    ev_path = tmp_path / "events.parquet"
    pq.write_table(events, ev_path)
    return base, events, str(ev_path), str(tmp_path / "lake")


def _assert_matches_oracle(lake: LakeTable, base, event_tables):
    expected = replay_oracle(base, event_tables)
    actual = lake.to_table()
    assert actual.schema.equals(expected.schema), f"{actual.schema} != {expected.schema}"
    assert actual.num_rows == expected.num_rows
    # byte-exact token equality per doc_id (the BASELINE correctness gate)
    assert actual.equals(expected)


def test_snapshot_then_replay(fixtures):
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=8, salt_factor=2))
    lake.init_snapshot(ray.data.from_arrow(base))
    _assert_matches_oracle(lake, base, [])

    stats = lake.apply_log(ev_path)
    assert stats["applied_events"] > 0
    _assert_matches_oracle(lake, base, [events])

    # final table unique per doc_id (F6.1)
    t = lake.to_table()
    assert t["doc_id"].to_pandas().is_unique
    # n_tok consistency (F6.3)
    lens = pc.list_value_length(t["tokens"])
    assert pc.all(pc.equal(lens.cast(pa.int32()), t["n_tok"])).as_py()


def test_redelivery_noop(fixtures):
    """Re-applying the same log is a no-op (exactly-once from at-least-once,
    F6.5 — the monotonic watermark guard)."""
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path)
    before = lake.to_table()
    stats = lake.apply_log(ev_path)  # full redelivery
    assert stats["applied_events"] == 0
    assert lake.to_table().equals(before)


def test_chunked_replay_matches_single_shot(fixtures, tmp_path):
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=2))
    lake.init_snapshot(ray.data.from_arrow(base))
    stats = lake.apply_chunked(ev_path, chunk_lsns=800)
    assert len(stats) >= 2  # genuinely multiple checkpointed windows
    _assert_matches_oracle(lake, base, [events])

    single = LakeTable(str(tmp_path / "lake2"), ReplayConfig(num_partitions=4, salt_factor=2))
    single.init_snapshot(ray.data.from_arrow(base))
    single.apply_log(ev_path)
    assert single.to_table().equals(lake.to_table())


def test_delta_mode_matches_full_merge(fixtures, tmp_path):
    """Delta-segment applies (O(changes) writes) commit the SAME logical
    table as full-merge applies — tombstones shadow base rows at read; a
    compaction folds everything back to one file per partition with no
    logical change."""
    base, events, ev_path, lake_dir = fixtures
    # split the log into two epochs so deltas layer
    lsn = events["lsn"].to_numpy()
    cut = int(np.median(lsn))
    e1 = events.filter(pc.less_equal(events["lsn"], cut))
    e2 = events.filter(pc.greater(events["lsn"], cut))
    p1, p2 = tmp_path / "e1.parquet", tmp_path / "e2.parquet"
    pq.write_table(e1, p1)
    pq.write_table(e2, p2)

    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    s1 = lake.apply_log(str(p1), delta=True)
    s2 = lake.apply_log(str(p2), delta=True)
    assert s1["applied_events"] > 0 and s2["applied_events"] > 0
    m = Manifest.load(lake_dir)
    assert any(e.delta_paths for e in m.partitions.values())  # deltas really layered
    _assert_matches_oracle(lake, base, [events])
    # Dataset read path resolves deltas too
    via_ds = pa.Table.from_pylist(lake.read().take_all(), schema=lake.manifest.schema)
    via_ds = via_ds.take(pc.sort_indices(via_ds, sort_keys=[("doc_id", "ascending")]))
    assert via_ds.equals(lake.to_table())

    # compaction: same logical table, single file per partition, files GC'd
    before = lake.to_table()
    n = lake.compact()
    assert n > 0
    lake2 = LakeTable(lake_dir)  # reload manifest
    assert lake2.to_table().equals(before)
    m2 = Manifest.load(lake_dir)
    assert all(len(e.all_paths) == 1 for e in m2.partitions.values())
    # apply after compaction still works and matches
    ev3 = gen.gen_events(300, N_BASE, seed=77, start_lsn=gen.next_lsn(events))
    p3 = tmp_path / "e3.parquet"
    pq.write_table(ev3, p3)
    lake2.apply_log(str(p3), delta=True)
    _assert_matches_oracle(lake2, base, [events, ev3])


def test_bootstrap_fast_path_used_and_correct(fixtures):
    """Empty-lake init_snapshot takes the zero-exchange path (multi-file
    base partitions) and matches the oracle byte-exactly."""
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    st = lake.init_snapshot(ray.data.from_arrow(base))
    assert st["applied_events"] == N_BASE
    m = Manifest.load(lake_dir)
    # fast path leaves content-hashed block files
    assert any("-" in e.paths[0].split("seg-")[1] for e in m.partitions.values())
    _assert_matches_oracle(lake, base, [])
    # a normal apply over the bootstrap merges to single-file partitions
    lake.apply_log(ev_path)
    _assert_matches_oracle(lake, base, [events])


def test_chunked_replay_survives_lsn_gap(fixtures, tmp_path):
    """A WAL gap wider than chunk_lsns (quiet period / shared log) must not
    hang the checkpointed loop: empty windows advance the local cursor even
    though the committed watermark is unchanged."""
    base, events, ev_path, lake_dir = fixtures
    # shift the second half of the log past a gap of 50_000 LSNs
    lsn = events["lsn"].to_numpy()
    cut = int(np.median(lsn))
    shifted = pc.if_else(
        pc.greater(events["lsn"], cut),
        pc.add(events["lsn"], pa.scalar(50_000, pa.int64())),
        events["lsn"],
    )
    gapped = events.set_column(events.schema.get_field_index("lsn"), "lsn", shifted)
    gp = tmp_path / "gapped.parquet"
    pq.write_table(gapped, gp)

    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    stats = lake.apply_chunked(str(gp), chunk_lsns=800)  # gap >> chunk
    assert sum(s["applied_events"] for s in stats) > 0
    _assert_matches_oracle(lake, base, [gapped])


def test_lineage_invariants(fixtures):
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=8, salt_factor=2))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path)
    m = Manifest.load(lake_dir)
    # committed rows match the visible table
    assert m.lineage_rows() == lake.to_table().num_rows
    # runs cover contiguous, non-overlapping LSN ranges up to the watermark
    runs = m.runs
    assert runs[0]["prev_watermark"] == -1
    for a, b in zip(runs, runs[1:]):
        assert b["prev_watermark"] == a["watermark"]
    assert runs[-1]["watermark"] == m.watermark
    # every file referenced by the manifest exists; rows = physical rows
    for e in m.partitions.values():
        n = sum(pq.read_table(f"{lake_dir}/{p}").num_rows for p in e.all_paths)
        assert n == e.rows


def test_resume_after_crash_before_commit(fixtures):
    """Kill/restart (F4): segments written but manifest not committed →
    resume re-applies from the committed watermark; identical final table."""
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=2))
    lake.init_snapshot(ray.data.from_arrow(base))
    saved = Manifest.load(lake_dir)  # snapshot-only manifest

    lake.apply_log(ev_path)
    done = lake.to_table()

    # simulate crash: roll the manifest back to pre-apply (segments linger)
    saved.commit(lake_dir)
    resumed = LakeTable(lake_dir)
    assert resumed.manifest.watermark == saved.watermark
    resumed.apply_log(ev_path)
    assert resumed.to_table().equals(done)


def test_resume_after_crash_delta_mode(fixtures):
    """Crash-before-commit with DELTA applies: the orphaned delta file is
    invisible (manifest-only visibility), the resumed apply rewrites the
    same deterministic path, and the final table matches byte-exactly."""
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path)  # establish a base so deltas layer
    saved = Manifest.load(lake_dir)

    ev2 = gen.gen_events(400, N_BASE, seed=55, start_lsn=gen.next_lsn(events))
    import pyarrow.parquet as _pq

    p2 = f"{lake_dir}-ev2.parquet"
    _pq.write_table(ev2, p2)
    lake.apply_log(p2, delta=True)
    done = lake.to_table()

    saved.commit(lake_dir)  # crash: delta files on disk, commit rolled back
    resumed = LakeTable(lake_dir)
    assert resumed.to_table().equals(replay_oracle(base, [events]))  # delta invisible
    resumed.apply_log(p2, delta=True)
    assert resumed.to_table().equals(done)
    _assert_matches_oracle(resumed, base, [events, ev2])


def test_actor_exchange_matches_shuffle(fixtures, tmp_path):
    """exchange='actors' (merge-applier scatter) produces the identical
    committed table as the groupby-shuffle path."""
    base, events, ev_path, lake_dir = fixtures
    a = LakeTable(str(tmp_path / "lake_a"),
                  ReplayConfig(num_partitions=8, exchange="actors", num_appliers=4))
    a.init_snapshot(ray.data.from_arrow(base))
    a.apply_log(ev_path)

    b = LakeTable(str(tmp_path / "lake_b"), ReplayConfig(num_partitions=8))
    b.init_snapshot(ray.data.from_arrow(base))
    b.apply_log(ev_path)
    assert a.to_table().equals(b.to_table())
    assert a.to_table().equals(replay_oracle(base, [events]))


def test_actor_exchange_spill_pointer_state(fixtures, tmp_path):
    """spill_bytes forces the applier's COMPACTED per-partition buffers to
    disk (pointer-only dict state — the 100-TB memory contract): with an
    artificially tiny budget (1 KiB, so every compaction spills) plus a
    tiny compact_rows (so compaction fires per sub-batch), the committed
    table must still be byte-identical to the shuffle path, and no spill
    scratch may survive the flush."""
    import glob
    import os

    base, events, ev_path, lake_dir = fixtures
    a = LakeTable(str(tmp_path / "lake_spill"),
                  ReplayConfig(num_partitions=8, exchange="actors",
                               num_appliers=2, compact_rows=16,
                               spill_bytes=1024))
    a.init_snapshot(ray.data.from_arrow(base))
    stats = a.apply_log(ev_path)
    assert stats["applied_events"] == events.num_rows
    assert a.to_table().equals(replay_oracle(base, [events]))
    # spill chunks are scratch: flush must have removed them
    leftovers = glob.glob(os.path.join(str(tmp_path / "lake_spill"),
                                       "_spill", "*", "part=*", "*"))
    assert leftovers == []
    # second epoch through the same spill-constrained lake stays exact
    ev2 = gen.gen_events(800, 120, seed=77, start_lsn=gen.next_lsn(events))
    p2 = str(tmp_path / "ev2_spill.parquet")
    pq.write_table(ev2, p2)
    a.apply_log(p2)
    assert a.to_table().equals(replay_oracle(base, [events, ev2]))


def test_spill_pointer_unit_mechanics(tmp_path):
    """Drive the plain applier class (MergeApplierState) directly: a tiny
    spill budget must convert compacted buffers into on-disk pointer state
    during ingest (dict holds (lsn, path, rows), not rows), and flush must
    fold the spill chain back into a correct segment then delete it."""
    import glob
    import os

    from airbyte_ray.pipelines.replay import (
        _META_COLS,
        MergeApplierState,
        _pre_reduce,
    )

    events = gen.gen_events(600, 50, seed=5)
    pre = _pre_reduce(events, num_partitions=4, salt_factor=1, policy=None)
    payload = pa.schema([
        f for f in pre.schema if f.name not in _META_COLS
    ])
    lake_dir = str(tmp_path / "lake_unit")
    os.makedirs(lake_dir)
    ctx = {
        "lake_dir": lake_dir,
        "policy": None,
        "schema": payload.serialize().to_pybytes(),
        "old_segments": {},
        "delta_mode": False,
        "run_lsn_hi": 1,
    }
    ap = MergeApplierState(list(range(4)), ctx, compact_rows=8, spill_bytes=256)
    for p in range(4):
        sub = pre.filter(pc.equal(pre["part"], p))
        for i in range(0, sub.num_rows, 10):  # many small sub-batches
            ap.ingest(sub.slice(i, 10), p)
    n_spilled = sum(len(v) for v in ap.spilled.values())
    assert n_spilled > 0, "tiny budget must force spills"
    for ptrs in ap.spilled.values():
        for ptr in ptrs:
            assert os.path.exists(ptr["path"]) and ptr["rows"] > 0
            assert ptr["lsn_hi"] > 0
    # pointer state: resident rows stay under the compaction threshold
    assert all(r <= 8 * 2 for r in ap.rows.values())

    lineage = ap.flush()
    assert sum(e["n_events"] for e in lineage) == events.num_rows
    assert glob.glob(os.path.join(lake_dir, "_spill", "*", "part=*", "*")) == []
    # committed segments carry exactly the live winners
    segs = [pq.read_table(f) for f in
            glob.glob(os.path.join(lake_dir, "part=*", "seg-*.parquet"))]
    got = {d: l for t in segs
           for d, l in zip(t["doc_id"].to_pylist(), t["_ab_lsn"].to_pylist())}
    df = events.to_pandas().sort_values("lsn").groupby("doc_id").last()
    live = df[df.op != "delete"]
    assert got == dict(zip(live.index, live.lsn))


def test_partition_aligned_apply(tmp_path):
    """Key-partitioned (sharded-WAL) log → apply_partitioned matches the
    shuffled path and the oracle; misaligned input fails loudly."""
    P = 4
    base = gen.gen_base(200, seed=31)
    pools = gen.partition_pools(200, P)
    new_pools = gen.partition_pools(4000, P, start=200)
    shards, all_events = [], []
    root = tmp_path / "walshards"
    for p in range(P):
        ev = gen.gen_events(
            400, 200, seed=40 + p, start_lsn=1 + 2000 * p,
            key_pool=pools[p], insert_pool=new_pools[p],
        )
        d = root / f"part={p:05d}"
        d.mkdir(parents=True)
        pq.write_table(ev, d / "chunk-0.parquet")
        all_events.append(ev)

    a = LakeTable(str(tmp_path / "lake_a"), ReplayConfig(num_partitions=P))
    a.init_snapshot(ray.data.from_arrow(base))
    stats = a.apply_partitioned(str(root))
    assert stats["applied_events"] > 0
    expected = replay_oracle(base, all_events)
    assert a.to_table().equals(expected)

    b = LakeTable(str(tmp_path / "lake_b"), ReplayConfig(num_partitions=P))
    b.init_snapshot(ray.data.from_arrow(base))
    b.apply_log([str(root / f"part={p:05d}" / "chunk-0.parquet") for p in range(P)])
    assert b.to_table().equals(a.to_table())

    # misaligned: a shard containing wrong-partition keys must be rejected
    bad = tmp_path / "bad" / "part=00000"
    bad.mkdir(parents=True)
    pq.write_table(all_events[1], bad / "chunk-0.parquet")
    c = LakeTable(str(tmp_path / "lake_c"), ReplayConfig(num_partitions=P))
    with pytest.raises(Exception, match="not aligned|other partitions"):
        c.apply_partitioned(str(tmp_path / "bad"))


def test_fused_shard_apply_byte_equals_generic(tmp_path):
    """The single-gather fused fast path (default policy, full mode) must
    write byte-identical segment files to the generic reduce-then-merge
    path.  An EXPLICIT (("lsn","descending"),) merge_policy routes the same
    semantics down the generic `_merge_partition` branch; two applies cover
    old-absent and old-present merges, with dup deliveries + tombstones."""
    import os

    P = 4
    base = gen.gen_base(200, seed=61)
    pools = gen.partition_pools(200, P)
    new_pools = gen.partition_pools(4000, P, start=200)
    roots = []
    for run, lsn0 in ((0, 1), (1, 100_001)):
        root = tmp_path / f"wal{run}"
        for p in range(P):
            ev = gen.gen_events(
                400, 200, seed=70 + 10 * run + p, start_lsn=lsn0 + 2000 * p,
                dup_prob=0.05, key_pool=pools[p], insert_pool=new_pools[p],
            )
            d = root / f"part={p:05d}"
            d.mkdir(parents=True)
            pq.write_table(ev, d / "chunk-0.parquet")
        roots.append(str(root))

    fused = LakeTable(str(tmp_path / "lake_fused"), ReplayConfig(num_partitions=P))
    generic = LakeTable(
        str(tmp_path / "lake_generic"),
        ReplayConfig(num_partitions=P, merge_policy=(("lsn", "descending"),)),
    )
    for lake in (fused, generic):
        lake.init_snapshot(ray.data.from_arrow(base))
        for root in roots:
            lake.apply_partitioned(root)

    mf, mg = Manifest.load(fused.lake_dir), Manifest.load(generic.lake_dir)
    assert mf.watermark == mg.watermark
    assert set(mf.partitions) == set(mg.partitions)
    for p, ef in mf.partitions.items():
        eg = mg.partitions[p]
        assert ef.paths == eg.paths
        for rel in ef.paths:
            fa = os.path.join(fused.lake_dir, rel)
            fb = os.path.join(generic.lake_dir, rel)
            with open(fa, "rb") as a, open(fb, "rb") as b:
                assert a.read() == b.read(), f"segment bytes differ: {rel}"


def test_merge_policy_cursor_chain(tmp_path):
    """Pluggable MergePolicy (SURVEY §2.12): winner per key by
    (ts desc, lsn desc) — the reference's `cursor desc, _ab_cdc_updated_at
    desc, log_pos desc` ORDER BY chain — verified against a DuckDB
    row_number() oracle, across TWO applies so an old committed row can beat
    a later-lsn-but-older-cursor incoming change."""
    import duckdb

    rng = np.random.default_rng(9)
    n, keys = 2000, 300
    lsn = np.arange(1, n + 1, dtype=np.int64)
    doc = np.array([f"d{rng.integers(0, keys):04d}" for _ in range(n)], object)
    ts = rng.integers(0, 10_000, n).astype(np.int64)  # NOT aligned with lsn
    val = rng.integers(0, 1_000_000, n).astype(np.int64)
    t = pa.table({"lsn": lsn, "op": pa.array(["update"] * n),
                  "doc_id": pa.array(doc, pa.string()),
                  "ts": pa.array(ts), "val": pa.array(val)})
    cut = n // 2
    p1, p2 = tmp_path / "p1.parquet", tmp_path / "p2.parquet"
    pq.write_table(t.slice(0, cut), p1)
    pq.write_table(t.slice(cut), p2)

    lake = LakeTable(
        str(tmp_path / "lake"),
        ReplayConfig(num_partitions=4, salt_factor=1,
                     merge_policy=(("ts", "descending"), ("lsn", "descending"))),
    )
    lake.apply_log(str(p1))
    lake.apply_log(str(p2))
    got = lake.to_table()

    exp = duckdb.connect().execute(f"""
        SELECT doc_id, ts, val FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet(['{p1}', '{p2}'])) WHERE rn = 1
        ORDER BY doc_id
    """).arrow()
    assert got.select(["doc_id", "ts", "val"]).equals(
        exp.cast(got.select(["doc_id", "ts", "val"]).schema)
    )


def test_merge_policy_rejects_delta_mode(tmp_path):
    lake = LakeTable(
        str(tmp_path / "lake"),
        ReplayConfig(num_partitions=2, merge_policy=(("ts", "descending"),),
                     delta_mode=True),
    )
    t = pa.table({"lsn": pa.array([1, 2], pa.int64()), "op": ["update", "update"],
                  "doc_id": ["a", "b"], "ts": pa.array([1, 2], pa.int64())})
    p = tmp_path / "e.parquet"
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="merge policy"):
        lake.apply_log(str(p))


def test_vacuum_guards_inflight_removes_superseded(fixtures):
    """Vacuum removes superseded/orphaned segment files but SKIPS anything
    newer than the committed watermark — those may belong to an apply whose
    manifest commit hasn't landed (round-1 ADVICE fix)."""
    import os

    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path)  # supersedes the bootstrap block files

    wm = Manifest.load(lake_dir).watermark
    # simulate an in-flight run's segment (suffix = committed_wm + 1)
    inflight = os.path.join(lake_dir, "part=00000", f"seg-{wm + 1:014d}.parquet")
    pq.write_table(pa.table({"doc_id": ["x"], "_ab_lsn": pa.array([wm + 1], pa.int64())}), inflight)
    # and an old orphan from a crashed past run (suffix <= committed wm)
    orphan = os.path.join(lake_dir, "part=00000", f"seg-{max(wm - 5, 1):014d}.parquet")
    pq.write_table(pa.table({"doc_id": ["y"], "_ab_lsn": pa.array([1], pa.int64())}), orphan)

    before = lake.to_table()
    removed = lake.vacuum()
    assert removed > 0  # superseded bootstrap files + the orphan went away
    assert os.path.exists(inflight)  # in-flight segment survived
    assert not os.path.exists(orphan)
    assert lake.to_table().equals(before)  # committed view untouched
    os.remove(inflight)


def test_delta_then_full_apply_folds(fixtures, tmp_path):
    """A full-merge apply layered over existing deltas folds each touched
    partition back to one file and stays byte-exact."""
    base, events, ev_path, lake_dir = fixtures
    lsn = events["lsn"].to_numpy()
    cut = int(np.median(lsn))
    e1 = events.filter(pc.less_equal(events["lsn"], cut))
    e2 = events.filter(pc.greater(events["lsn"], cut))
    p1, p2 = tmp_path / "e1.parquet", tmp_path / "e2.parquet"
    pq.write_table(e1, p1)
    pq.write_table(e2, p2)

    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(str(p1), delta=True)
    lake.apply_log(str(p2), delta=False)  # full merge over layered deltas
    _assert_matches_oracle(lake, base, [events])
    m = Manifest.load(lake_dir)
    # every partition touched by the full apply folded to one base file
    for e in m.partitions.values():
        if not e.delta_paths:
            continue
        # untouched partitions may keep deltas; touched ones must not
        assert e.lsn_hi <= cut


def test_schema_evolution_under_delta_mode(fixtures, tmp_path):
    """v2 events (added columns, widened types) applied as DELTAS: resolve
    conforms every layered file to the unified schema — byte-exact vs the
    oracle."""
    base, events, ev_path, lake_dir = fixtures
    ev2 = gen.gen_events(400, N_BASE, seed=91, v2=True, start_lsn=gen.next_lsn(events))
    p2 = tmp_path / "v2.parquet"
    pq.write_table(ev2, p2)

    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path, delta=True)
    lake.apply_log(str(p2), delta=True)  # schema evolves inside the delta chain
    _assert_matches_oracle(lake, base, [events, ev2])
    # compaction of the evolved chain stays exact
    lake.compact()
    _assert_matches_oracle(LakeTable(lake_dir), base, [events, ev2])


def test_legacy_single_path_manifest_loads(fixtures):
    """Manifests written before multi-file PartitionEntry (a single 'path'
    string per partition) still load — the shim must pop 'path' BEFORE
    building the kwargs dict (advice finding: the old `{**v, ...v.pop()}`
    left 'path' in the dict and raised TypeError on every old lake)."""
    import json as _json
    import os as _os

    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    lake.apply_log(ev_path)  # merges every partition to one segment file
    before = lake.to_table()

    p = Manifest.path_for(lake_dir)
    with open(p) as f:
        d = _json.load(f)
    for v in d["partitions"].values():
        paths = v.pop("paths")
        assert len(paths) == 1
        v.pop("delta_paths")
        v["path"] = paths[0]  # the legacy single-file shape
    with open(p, "w") as f:
        _json.dump(d, f)

    m = Manifest.load(lake_dir)  # must not raise
    assert all(e.paths and not e.delta_paths for e in m.partitions.values())
    assert LakeTable(lake_dir).to_table().equals(before)


def test_compact_reloads_committed_manifest(fixtures, tmp_path):
    """A stale handle's compact() must observe the COMMITTED manifest (same
    discipline as vacuum): another process's newer commit would otherwise be
    clobbered and its segment files deleted (advice finding)."""
    base, events, ev_path, lake_dir = fixtures
    writer = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    writer.init_snapshot(ray.data.from_arrow(base))
    stale = LakeTable(lake_dir)  # snapshot-only view, now goes stale

    lsn = events["lsn"].to_numpy()
    cut = int(np.median(lsn))
    e1 = events.filter(pc.less_equal(events["lsn"], cut))
    e2 = events.filter(pc.greater(events["lsn"], cut))
    p1, p2 = tmp_path / "c1.parquet", tmp_path / "c2.parquet"
    pq.write_table(e1, p1)
    pq.write_table(e2, p2)
    writer.apply_log(str(p1), delta=True)
    writer.apply_log(str(p2), delta=True)  # newer commit w/ layered deltas

    n = stale.compact()  # stale handle — must reload before folding
    assert n > 0
    _assert_matches_oracle(LakeTable(lake_dir), base, [events])
    m = Manifest.load(lake_dir)
    assert m.watermark == int(lsn.max())  # newer commit's watermark survived
    assert all(len(e.all_paths) == 1 for e in m.partitions.values())


def test_cli_apply_chunk_delta(fixtures, tmp_path, capsys):
    """`apply --chunk N --delta` really writes delta files per window
    (advice finding: --delta was silently ignored on the chunked path)."""
    from airbyte_ray.cli import main as cli_main

    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1))
    lake.init_snapshot(ray.data.from_arrow(base))
    rc = cli_main(["apply", "--lake", lake_dir, "--log", ev_path,
                   "--chunk", "800", "--delta"])
    assert rc == 0
    m = Manifest.load(lake_dir)
    assert any(e.delta_paths for e in m.partitions.values())
    _assert_matches_oracle(LakeTable(lake_dir), base, [events])


def test_auto_compaction_bounds_delta_chain(fixtures, tmp_path):
    """With auto_compact_deltas=K, a long run of delta-mode applies never
    lets any partition's chain exceed K files for long — the chain folds
    automatically after the apply that crosses K, the logical table stays
    oracle-exact, and read task counts stay bounded."""
    base, events, ev_path, lake_dir = fixtures
    lake = LakeTable(lake_dir, ReplayConfig(num_partitions=4, salt_factor=1,
                                            auto_compact_deltas=2))
    lake.init_snapshot(ray.data.from_arrow(base))

    # 6 delta epochs over the same key space
    lsn = events["lsn"].to_numpy()
    cuts = np.quantile(lsn, np.linspace(0, 1, 7)).astype(np.int64)
    applied = []
    for lo, hi in zip(cuts, cuts[1:]):
        e = events.filter(
            pc.and_(pc.greater(events["lsn"], int(lo)) if applied else
                    pc.greater_equal(events["lsn"], int(lo)),
                    pc.less_equal(events["lsn"], int(hi)))
        )
        p = tmp_path / f"ep{lo}.parquet"
        pq.write_table(e, p)
        st = lake.apply_log(str(p), delta=True)
        applied.append(st)
        m = Manifest.load(lake_dir)
        assert all(len(e2.delta_paths) <= 2 for e2 in m.partitions.values())
    assert any("auto_compacted" in st for st in applied)
    _assert_matches_oracle(lake, base, [events])


def test_spill_with_custom_policy_and_redelivery(tmp_path):
    """Spill-pointer state composes with a pluggable merge policy (the
    spill compaction and the flush fold both reduce under the SAME
    comparator), and a full-log redelivery through a spill-constrained
    lake stays a no-op (exactly-once)."""
    import duckdb

    rng = np.random.default_rng(21)
    n, keys = 3000, 200
    lsn = np.arange(1, n + 1, dtype=np.int64)
    doc = np.array([f"d{rng.integers(0, keys):04d}" for _ in range(n)], object)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    val = rng.integers(0, 1_000_000, n).astype(np.int64)
    t = pa.table({"lsn": lsn, "op": pa.array(["update"] * n),
                  "doc_id": pa.array(doc, pa.string()),
                  "ts": pa.array(ts), "val": pa.array(val)})
    p = tmp_path / "pol.parquet"
    pq.write_table(t, p)

    lake = LakeTable(
        str(tmp_path / "lake_sp"),
        ReplayConfig(num_partitions=4, exchange="actors", num_appliers=2,
                     compact_rows=32, spill_bytes=1024,
                     merge_policy=(("ts", "descending"), ("lsn", "descending"))),
    )
    lake.apply_log(str(p))
    got = lake.to_table()
    exp = duckdb.connect().execute(f"""
        SELECT doc_id, ts, val FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{p}')) WHERE rn = 1
        ORDER BY doc_id
    """).arrow()
    assert got.select(["doc_id", "ts", "val"]).equals(
        exp.cast(got.select(["doc_id", "ts", "val"]).schema))
    # redelivery: identical log again → zero applied events, table unchanged
    stats = lake.apply_log(str(p))
    assert stats["applied_events"] == 0
    assert lake.to_table().equals(got)
