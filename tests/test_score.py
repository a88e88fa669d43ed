"""LinearScorer (functions/score.py) unit tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from airbyte_ray.functions.score import LinearScorer, score_batches


def test_score_batches_logit_and_keep():
    t = pa.table({"doc_id": [0, 1], "f1": pa.array([10, 300], pa.int64()),
                  "f2": pa.array([2, 5], pa.int64())})
    out = score_batches(rd.from_arrow(t), weights=[0.1, 1.0], bias=-4.0,
                        features=["f1", "f2"]).to_pandas().sort_values("doc_id")
    assert np.allclose(out.score, [-4.0 + 1.0 + 2.0, -4.0 + 30.0 + 5.0])
    assert out.keep.tolist() == [False, True]


def test_scorer_actor_pool_and_sigmoid():
    t = pa.table({"doc_id": list(range(20)),
                  "f": pa.array([float(i) for i in range(20)])})
    out = score_batches(rd.from_arrow(t).repartition(3), weights=[1.0], bias=-10.0,
                        features=["f"], sigmoid=True,
                        concurrency=(1, 2)).to_pandas()
    assert np.allclose(out.score_p, 1.0 / (1.0 + np.exp(-out.score)))
    assert (out.score_p.between(0, 1)).all()


def test_scorer_weight_arity_validated():
    ref = ray.put((np.array([1.0, 2.0]), 0.0))
    with pytest.raises(ValueError, match="weights"):
        LinearScorer(ref, ["only_one"])
