"""Generator determinism + oracle sanity (FIXTURES F1/F2/F5)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from airbyte_ray import gen
from airbyte_ray.oracle import replay_oracle
from airbyte_ray.schemas import BASE_SCHEMA


def test_base_deterministic():
    a, b = gen.gen_base(500, seed=42), gen.gen_base(500, seed=42)
    assert a.equals(b)
    assert a.schema.equals(BASE_SCHEMA)
    assert a.num_rows == 500
    # invariant: n_tok == len(tokens)
    lens = pc.list_value_length(a["tokens"])
    assert pc.all(pc.equal(lens.cast(pa.int32()), a["n_tok"])).as_py()


def test_events_shape():
    ev = gen.gen_events(2000, n_base=500, seed=7)
    assert ev.num_rows >= 2000  # duplicates appended
    lsn = ev["lsn"].to_numpy()
    assert len(np.unique(lsn)) <= len(lsn)  # dups share lsn
    # deletes are tombstones: null payload
    mask = pc.equal(ev["op"], "delete")
    deleted = ev.filter(mask)
    assert deleted["tokens"].null_count == deleted.num_rows
    assert deleted["n_tok"].null_count == deleted.num_rows
    # duplicated rows are identical per lsn
    d = ev.to_pandas().groupby("lsn")["doc_id"].nunique()
    assert (d == 1).all()


def test_events_deterministic():
    a = gen.gen_events(1000, 200, seed=9)
    b = gen.gen_events(1000, 200, seed=9)
    assert a.equals(b)


def test_oracle_basic():
    base = gen.gen_base(50, seed=1)
    ev = pa.table(
        {
            "lsn": pa.array([5, 3, 9], pa.int64()),
            "op": ["update", "delete", "delete"],
            "doc_id": ["doc-00000001", "doc-00000002", "doc-00000001"],
            "tokens": pa.array([[1, 2, 3], None, None], pa.list_(pa.int32())),
            "n_tok": pa.array([3, None, None], pa.int32()),
            "source": ["web", None, None],
        }
    )
    out = replay_oracle(base, [ev])
    ids = out["doc_id"].to_pylist()
    assert "doc-00000001" not in ids  # updated then deleted at lsn 9
    assert "doc-00000002" not in ids  # deleted
    assert out.num_rows == 48


def test_oracle_redelivery_idempotent():
    base = gen.gen_base(100, seed=2)
    ev = gen.gen_events(500, 100, seed=3)
    once = replay_oracle(base, [ev])
    twice = replay_oracle(base, [ev, ev])  # full redelivery of the log
    assert once.equals(twice)
