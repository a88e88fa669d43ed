"""State-flavor normalization / legacy migration (state/migrate.py) —
connector_state_manager._extract_from_state_message parity
(airbyte-cdk/python/airbyte_cdk/sources/connector_state_manager.py:96-146)."""
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airbyte_ray.state.migrate import (
    export_legacy,
    import_state,
    normalize_state,
    state_flavor,
)

LEGACY = {"users": {"cursor": 100}, "orders": {"cursor": "2024-01-01"}}
MIGRATED = [{"type": "LEGACY", "data": LEGACY}]
STREAM = [
    {"type": "STREAM",
     "stream": {"stream_descriptor": {"name": "users"}, "stream_state": {"cursor": 100}}},
    {"type": "STREAM",
     "stream": {"stream_descriptor": {"name": "orders", "namespace": "pub"},
                "stream_state": {"cursor": "2024-01-01"}}},
]
GLOBAL = [{
    "type": "GLOBAL",
    "global": {
        "shared_state": {"lsn": 777},
        "stream_states": [
            {"stream_descriptor": {"name": "users"}, "stream_state": {"cursor": 100}},
            {"stream_descriptor": {"name": "orders"}, "stream_state": {}},
        ],
    },
}]


def test_flavor_detection():
    assert state_flavor(LEGACY) == "legacy"
    assert state_flavor(MIGRATED) == "migrated_legacy"
    assert state_flavor(STREAM) == "stream"
    assert state_flavor(GLOBAL) == "global"
    with pytest.raises(ValueError):
        state_flavor([{"type": "???"}])


def test_normalize_all_flavors():
    for s in (LEGACY, MIGRATED):
        shared, per = normalize_state(s)
        assert shared is None
        assert per[("users", None)] == {"cursor": 100}
        assert per[("orders", None)] == {"cursor": "2024-01-01"}
    shared, per = normalize_state(STREAM)
    assert shared is None
    assert per[("orders", "pub")] == {"cursor": "2024-01-01"}
    shared, per = normalize_state(GLOBAL)
    assert shared == {"lsn": 777}
    assert per[("users", None)] == {"cursor": 100}
    assert per[("orders", None)] == {}


def test_import_then_sync_resumes_from_migrated_cursor(tmp_path, ray_session):
    """A legacy cursor blob must gate the first sync's incremental read."""
    from airbyte_ray.config import StreamConfig
    from airbyte_ray.pipelines.incremental import SyncEngine

    src = str(tmp_path / "s.parquet")
    t = pa.table({"pk": pa.array(range(100), pa.int64()),
                  "cur": pa.array(range(100), pa.int64())})
    pq.write_table(t, src)

    dest = str(tmp_path / "dest")
    state_dir = f"{dest}/_state"
    res = import_state(state_dir, {"s": {"cursor": 49}})
    assert res == {"flavor": "legacy", "imported": ["s"], "skipped": [],
                   "shared": None}

    eng = SyncEngine(dest)
    out = eng.sync(
        StreamConfig("s", "incremental", "append", cursor_field="cur"), src
    )
    got = eng.read("s")
    assert got.count() == 50  # only cur > 49
    assert out["cursor"] == 99


def test_import_never_overwrites_existing(tmp_path):
    state_dir = str(tmp_path / "st")
    import_state(state_dir, {"s": {"cursor": 1}})
    res = import_state(state_dir, {"s": {"cursor": 999}, "t": {"cursor": 5}})
    assert res["imported"] == ["t"]
    assert res["skipped"] == ["s"]
    with open(f"{state_dir}/s.json") as f:
        assert json.load(f)["cursor"] == 1  # bootstrap, not rollback


def test_global_seeds_catalog_offset(tmp_path):
    root = str(tmp_path / "cat")
    res = import_state(str(tmp_path / "st"), GLOBAL, global_root=root)
    assert res["global_watermark"] == 777
    with open(f"{root}/_global_state.json") as f:
        g = json.load(f)
    assert g["watermark"] == 777
    # idempotent: a second import must not clobber
    import_state(str(tmp_path / "st2"), [{
        "type": "GLOBAL",
        "global": {"shared_state": {"lsn": 1}, "stream_states": []},
    }], global_root=root)
    with open(f"{root}/_global_state.json") as f:
        assert json.load(f)["watermark"] == 777


def test_export_legacy_roundtrip(tmp_path):
    state_dir = str(tmp_path / "st")
    import_state(state_dir, STREAM)
    out = export_legacy(state_dir)
    # BARE stream names, matching the reference's legacy mapping (namespace
    # rides on the stream instance, not the key — review finding: a
    # 'ns.stream' key would re-import as a literal stream name)
    assert out["users"]["cursor"] == 100
    assert out["orders"]["cursor"] == "2024-01-01"
    # a re-import of the export is a fixpoint for every stream
    shared, per = normalize_state(out)
    assert per[("users", None)]["cursor"] == 100
    assert per[("orders", None)]["cursor"] == "2024-01-01"


def test_export_import_roundtrip_namespaced_stream(tmp_path):
    # VERDICT r4 item 6: a NAMESPACED stream must round-trip export→import
    # with its cursor intact and land in a file the engine actually loads
    # ('orders.json', bare name — namespace is inside the blob).
    src_dir = str(tmp_path / "src")
    import_state(src_dir, STREAM)
    out = export_legacy(src_dir)
    assert "orders" in out and "pub.orders" not in out
    dst_dir = str(tmp_path / "dst")
    res = import_state(dst_dir, out)
    assert "orders" in res["imported"]
    with open(f"{dst_dir}/orders.json") as f:
        doc = json.load(f)
    assert doc["cursor"] == "2024-01-01"


def test_cli_import_state_verb(tmp_path, capsys):
    from airbyte_ray.cli import main

    blob_path = str(tmp_path / "blob.json")
    with open(blob_path, "w") as f:
        json.dump(LEGACY, f)
    rc = main(["import-state", "--state", blob_path,
               "--state-dir", str(tmp_path / "st")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out["imported"]) == ["orders", "users"]
