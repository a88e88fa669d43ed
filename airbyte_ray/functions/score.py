"""Batched model inference as a first-class stage: a linear quality
classifier whose 'checkpoint' (weights, bias) is loaded ONCE per actor /
worker and applied per batch with one vectorized pass — the canonical
model-scoring shape (load in ``__init__``, matmul in ``__call__``) that a
real classifier (fastText quality model, a distilled BERT scorer) would
slot into; the linear model keeps it runnable and SQL-checkable here.

Determinism contract: the emitted ``score`` is the raw LOGIT computed with
left-associated IEEE ops in a fixed feature order, so DuckDB reproduces it
bit-for-bit (every mul/add is correctly rounded, same order → same bits).
``sigmoid=True`` adds the probability for library users, but transcendental
libm/SIMD implementations differ across engines in the last ulp, so oracle
queries hash the logit and the boolean decision, not the probability.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import _worker_state


class LinearScorer:
    """Stateful inference stage: checkpoint fetched from the object store
    once per actor (``__init__``), one fused vector pass per batch."""

    def __init__(self, model_ref, features: list[str], out: str = "score",
                 sigmoid: bool = False):
        w, b = ray.get(model_ref)
        self.w = np.asarray(w, np.float64)
        self.b = float(b)
        self.features, self.out, self.sigmoid = list(features), out, sigmoid
        if len(self.w) != len(self.features):
            raise ValueError(f"{len(self.w)} weights for {len(self.features)} features")

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        # left-associated accumulation in declared feature order — the
        # bit-exactness contract (see module docstring)
        z = np.full(n, self.b, np.float64)
        for w, f in zip(self.w, self.features):
            z = z + w * t[f].to_numpy(zero_copy_only=False).astype(np.float64)
        t = t.append_column(self.out, pa.array(z))
        t = t.append_column("keep", pa.array(z > 0.0))
        if self.sigmoid:
            t = t.append_column(self.out + "_p", pa.array(1.0 / (1.0 + np.exp(-z))))
        return t


def _score_task(t: pa.Table, model_ref, features, out, sigmoid):
    s = _worker_state(("linear_scorer", model_ref.hex(), tuple(features), out, sigmoid),
                      lambda: LinearScorer(model_ref, features, out, sigmoid))
    return s(t)


def score_batches(
    ds: ray.data.Dataset,
    weights: list[float],
    bias: float,
    features: list[str],
    out: str = "score",
    sigmoid: bool = False,
    concurrency=None,
) -> ray.data.Dataset:
    """Attach ``out`` (logit) + ``keep`` (logit > 0) columns.  Tasks with a
    per-worker cached model by default; pass ``concurrency`` to pin an
    actor pool (the shape a heavyweight model needs)."""
    model_ref = ray.put((np.asarray(weights, np.float64), float(bias)))
    if concurrency is not None:
        return ds.map_batches(
            LinearScorer,
            fn_constructor_args=(model_ref, features, out, sigmoid),
            batch_format="pyarrow", concurrency=concurrency,
        )
    return ds.map_batches(
        partial(_score_task, model_ref=model_ref, features=features,
                out=out, sigmoid=sigmoid),
        batch_format="pyarrow",
    )
