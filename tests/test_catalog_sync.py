"""Multi-stream CDC catalog engine (per-stream isolated state)."""

import pyarrow.parquet as pq
import ray.data

from airbyte_ray import gen
from airbyte_ray.oracle import replay_oracle
from airbyte_ray.pipelines.catalog_sync import CdcCatalogEngine, CdcStreamConfig
from airbyte_ray.pipelines.replay import ReplayConfig


def test_two_stream_catalog(tmp_path):
    streams = []
    expected = {}
    for name, seed in (("docs_en", 51), ("docs_de", 52)):
        base = gen.gen_base(120, seed=seed)
        ev = gen.gen_events(500, 120, seed=seed + 100)
        bp, lp = tmp_path / f"{name}_base.parquet", tmp_path / f"{name}_log.parquet"
        pq.write_table(base, bp)
        pq.write_table(ev, lp)
        streams.append(
            CdcStreamConfig(name, str(lp), snapshot_path=str(bp),
                            replay=ReplayConfig(num_partitions=4))
        )
        expected[name] = replay_oracle(base, [ev])

    eng = CdcCatalogEngine(str(tmp_path / "lakes"), streams)
    results = eng.sync_all()
    assert {r["stream"] for r in results} == {"docs_en", "docs_de"}
    for name in expected:
        assert eng.lake(name).to_table().equals(expected[name])

    # second sync: both streams are no-ops (independent watermarks)
    results2 = eng.sync_all(concurrent=True)
    for r in results2:
        assert r["apply"]["applied_events"] == 0


def test_cli_sync_shared(tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_ray import gen
    from airbyte_ray.cli import main as cli_main

    ev = gen.gen_events(200, 40, seed=31)
    log = ev.append_column("stream", pa.array(["a"] * ev.num_rows))
    lp = tmp_path / "wal.parquet"
    pq.write_table(log, lp)
    rc = cli_main(["sync-shared", "--root", str(tmp_path / "root"),
                   "--log", str(lp), "--streams", "a", "--partitions", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["applied_events"] > 0 and out["watermark"] > 0
