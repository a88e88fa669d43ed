"""Transform-stage parity tests (SURVEY §2.3): run each stage through a real
ray Dataset map_batches and check against plain-pyarrow/duckdb expectations."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from airbyte_ray.stages import (
    TypeCoercer,
    add_fields,
    compose,
    emitted_at,
    flatten_json,
    hash_id,
    normalize_name,
    record_filter,
    remove_fields,
)

SF = "/root/testdata/sf0.001"


def _run(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow").to_arrow_refs()


def test_add_remove_filter(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    fn = compose(
        add_fields({"value2": lambda t: pc.multiply(t["value"], 2), "const": "x"}),
        record_filter(lambda t: pc.greater(t["value"], 0)),
        remove_fields(["props"]),
    )
    out = ds.map_batches(fn, batch_format="pyarrow")
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert "props" not in t.schema.names
    assert "value2" in t.schema.names and "const" in t.schema.names
    assert pc.all(pc.greater(t["value"], 0)).as_py()
    assert pc.all(pc.equal(t["value2"], pc.multiply(t["value"], 2))).as_py()


def test_flatten_json(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    out = ds.map_batches(flatten_json("props"), batch_format="pyarrow")
    t = out.take_all()
    expected = duckdb.sql(
        f"SELECT CAST(json_extract(props,'$.k') AS BIGINT) k FROM '{sf_dir}/events.parquet'"
    ).arrow()
    got = sorted(r["k"] for r in t)
    assert got == sorted(expected["k"].to_pylist())


def test_hash_id_matches_duckdb(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/region.parquet")
    t = pa.Table.from_pylist(ds.map_batches(hash_id(["r_regionkey", "r_name"]), batch_format="pyarrow").take_all())
    exp = duckdb.sql(
        f"SELECT md5(concat_ws('|', CAST(r_regionkey AS VARCHAR), r_name)) h FROM '{sf_dir}/region.parquet'"
    ).arrow()
    assert sorted(t["_airbyte_hashid"].to_pylist()) == sorted(exp["h"].to_pylist())


def test_type_coercer():
    t = pa.table(
        {
            "a": pa.array(["1", "2", "x"]),  # string → int64, 'x' nulls
            "b": pa.array([1, 2, 3], pa.int32()),  # widen
            "c": pa.array([1.5, 2.5, 3.5]),  # scalar → list wrap
            "extra": ["p", "q", "r"],
        }
    )
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("c", pa.list_(pa.float64()))])
    out = TypeCoercer(schema)(t)
    assert out["a"].to_pylist() == [1, 2, None]
    assert out["b"].type == pa.int64()
    assert out["c"].to_pylist() == [[1.5], [2.5], [3.5]]
    assert out["extra"].to_pylist() == ["p", "q", "r"]  # unknown fields pass through
    # missing declared column → nulls
    out2 = TypeCoercer(pa.schema([("zz", pa.string())]))(t)
    assert out2["zz"].null_count == 3


def test_emitted_at_and_names():
    t = pa.table({"x": [1, 2]})
    out = emitted_at()(t)
    assert out["_airbyte_emitted_at"].null_count == 0
    assert normalize_name("Weird Name-1!") == "weird_name_1"
    assert normalize_name("1abc") == "_1abc"


def test_with_retries():
    from airbyte_ray.stages.retry import RetriesExhausted, with_retries

    sleeps = []
    calls = {"n": 0}

    @with_retries(max_retries=3, base_delay=1.0, sleep=sleeps.append)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("transient")
        return "ok"

    assert flaky() == "ok" and calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential

    @with_retries(max_retries=1, sleep=sleeps.append,
                  backoff_hint=lambda e: 7.5)
    def always_fails():
        raise ValueError("nope")

    import pytest as _pytest
    with _pytest.raises(RetriesExhausted):
        always_fails()
    assert sleeps[-1] == 7.5  # server-driven wait honored


def test_type_coercer_capture_records_reasons():
    t = pa.table({
        "k": pa.array(["a", "b", "c", "d"]),
        "n": pa.array(["1", "oops", None, "4.5e1"]),
    })
    schema = pa.schema([("k", pa.string()), ("n", pa.float64())])
    out = TypeCoercer(schema, on_error="capture")(t)
    errs = out["_ab_errors"].to_pylist()
    assert errs[0] == [] and errs[2] == [] and errs[3] == []
    assert len(errs[1]) == 1 and "oops" in errs[1][0] and errs[1][0].startswith("n:")
    assert out["n"].to_pylist() == [1.0, None, None, 45.0]
    # null / raise modes unchanged
    assert "_ab_errors" not in TypeCoercer(schema)(t).schema.names
    import pytest as _pytest
    with _pytest.raises(Exception):
        TypeCoercer(schema, on_error="raise")(t)


def test_coerce_with_dlq_quarantines_and_is_idempotent(tmp_path, ray_session):
    import glob

    import ray.data

    from airbyte_ray.stages.normalize import coerce_with_dlq

    dlq = str(tmp_path / "dlq")
    t = pa.table({
        "k": pa.array([str(i) for i in range(100)]),
        "n": pa.array(["bad" if i % 10 == 0 else str(i) for i in range(100)]),
    })
    schema = pa.schema([("k", pa.string()), ("n", pa.int64())])
    fn = coerce_with_dlq(schema, dlq)
    clean = (
        ray.data.from_arrow(t).repartition(4)
        .map_batches(fn, batch_format="pyarrow").to_pandas()
    )
    assert len(clean) == 90 and clean["n"].notna().all()
    files = glob.glob(dlq + "/dlq-*.parquet")
    assert files
    quarantined = pa.concat_tables([__import__("pyarrow.parquet", fromlist=["pq"]).read_table(f) for f in files])
    assert quarantined.num_rows == 10
    assert all(e and "bad" in e[0] for e in quarantined["_ab_errors"].to_pylist())
    # retry idempotence: re-running writes the SAME content-hash files
    ray.data.from_arrow(t).repartition(4).map_batches(fn, batch_format="pyarrow").materialize()
    assert sorted(glob.glob(dlq + "/dlq-*.parquet")) == sorted(files)
