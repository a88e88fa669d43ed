"""discover/check lifecycle (abstract_source.py:42-61, entrypoint.py:26-137):
schema inference → catalog → configure → sync round-trip."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airbyte_ray.cli import main as cli_main
from airbyte_ray.config import DestinationSyncMode, SyncMode
from airbyte_ray.discover import check, configure, discover

EVENTS = "/root/testdata/sf0.001/events.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_check_succeeds_and_fails():
    ok = check(EVENTS)
    assert ok["status"] == "SUCCEEDED" and "rows" in ok["message"]
    bad = check("/nonexistent/nope.parquet")
    assert bad["status"] == "FAILED"


def test_discover_schema_and_cursor():
    cat = discover(EVENTS)
    (s,) = cat["streams"]
    assert s["name"] == "events"
    props = s["json_schema"]["properties"]
    assert props["event_id"]["type"] == "integer"
    assert props["value"]["type"] == "number"
    assert props["event_type"]["type"] == "string"
    assert props["ts"] == {"type": "string", "format": "date-time"}
    assert "incremental" in s["supported_sync_modes"]
    assert s["default_cursor_field"] == ["ts"]  # timestamp outranks *_id

    emb = discover(EMB)["streams"][0]
    assert emb["json_schema"]["properties"]["embedding"]["type"] == "array"


def test_configure_validates():
    cat = discover(EVENTS)
    cfg = configure(cat, "events", primary_key=["user_id"], cursor_field="event_id")
    assert cfg.sync_mode is SyncMode.incremental
    assert cfg.destination_sync_mode is DestinationSyncMode.append_dedup
    assert cfg.cursor_field == "event_id"
    with pytest.raises(KeyError):
        configure(cat, "nope")
    with pytest.raises(ValueError):
        configure(cat, "events", cursor_field="not_a_col", primary_key=["user_id"])
    with pytest.raises(ValueError):
        configure(cat, "events", destination_sync_mode="append_dedup", primary_key=[])


def test_discover_configure_sync_roundtrip(tmp_path):
    """The full handshake: discover → configure → sync → committed rows."""
    from airbyte_ray.pipelines.incremental import SyncEngine

    cat = discover(EVENTS)
    cfg = configure(
        cat, "events", sync_mode="incremental", destination_sync_mode="append_dedup",
        cursor_field="event_id", primary_key=["user_id"], num_partitions=4,
    )
    eng = SyncEngine(str(tmp_path / "dest"))
    stats = eng.sync(cfg, cat["streams"][0]["source_files"][0])
    n_users = pq.read_table(EVENTS, columns=["user_id"])["user_id"].to_pandas().nunique()
    assert stats["rows"] == n_users  # latest-per-PK
    assert stats["cursor"] == pq.read_table(EVENTS)["event_id"].to_pandas().max()


def test_cli_verbs(capsys):
    assert cli_main(["check", "--src", EVENTS]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "SUCCEEDED"
    assert cli_main(["discover", "--src", EVENTS]) == 0
    cat = json.loads(capsys.readouterr().out)
    assert cat["streams"][0]["name"] == "events"
    assert cli_main(["check", "--src", "/no/such.parquet"]) == 1
    capsys.readouterr()


def test_spec_and_validate_verbs(tmp_path, capsys):
    """`spec` emits the config JSON-schema; `validate` rejects a malformed
    stream config with field-level errors and accepts a valid one
    (entrypoint.py:26-137 / check_config_against_spec analog)."""
    import json

    assert cli_main(["spec"]) == 0
    spec = json.loads(capsys.readouterr().out)
    assert set(spec["connectionSpecification"]) == {"stream", "pipeline"}

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "name": "s", "sync_mode": "incremental",          # missing cursor_field
        "destination_sync_mode": "append_dedup",          # empty primary_key
        "primary_key": [], "num_partitions": 0,           # below minimum
        "bogus_key": 1,                                   # additionalProperties
    }))
    assert cli_main(["validate", "--config", str(bad)]) == 1
    out = json.loads(capsys.readouterr().out)
    assert not out["valid"]
    msgs = "\n".join(out["errors"])
    assert "cursor_field" in msgs and "primary_key" in msgs
    assert "num_partitions" in msgs and "bogus_key" in msgs

    good = tmp_path / "good.json"
    good.write_text(json.dumps({
        "name": "s", "sync_mode": "incremental", "cursor_field": "ts",
        "destination_sync_mode": "append_dedup", "primary_key": ["id"],
    }))
    assert cli_main(["validate", "--config", str(good)]) == 0
    capsys.readouterr()  # drain the good-config output

    # pipeline kind: paginated source without api_dir is rejected
    pbad = tmp_path / "pbad.json"
    pbad.write_text(json.dumps({"source": {"format": "paginated"}}))
    assert cli_main(["validate", "--config", str(pbad), "--kind", "pipeline"]) == 1
    perrs = json.loads(capsys.readouterr().out)["errors"]
    assert any("api_dir" in e for e in perrs)


def test_check_config_or_raise_library_seam():
    import pytest

    from airbyte_ray.spec import check_config_or_raise

    check_config_or_raise({"name": "ok"})
    with pytest.raises(ValueError, match="cursor_field"):
        check_config_or_raise({"name": "x", "sync_mode": "incremental"})
