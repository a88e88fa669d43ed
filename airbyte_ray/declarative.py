"""Declarative pipeline builder — the YAML-manifest source analog.

Reference: ``ManifestDeclarativeSource`` assembles a stream from config
components — requester + record selector + filter + transformations
(``declarative/retrievers/simple_retriever.py``,
``parsers/model_to_component_factory.py``).  Our engine is lake-native, so
the spec describes: a source (parquet/json/csv path + columns), a chain of
transform components (each a registered factory → a ``pa.Table → pa.Table``
stage), and an optional sink.  Custom components register via
:func:`register_component` (the reference's class-types registry,
``class_types_registry.py``).

Spec example (plain dict — parse YAML/JSON upstream if desired)::

    {
      "source": {"format": "parquet", "path": ".../events.parquet",
                  "columns": ["event_id", "value", "props"]},
      "transforms": [
        {"type": "flatten_json", "column": "props"},
        {"type": "record_filter", "expr": "value > 0"},
        {"type": "add_fields", "fields": {"v2": "value * 2"}},
        {"type": "remove_fields", "names": ["value"]},
        {"type": "hash_id", "cols": ["event_id"]}
      ],
      "sink": {"format": "parquet", "path": "/tmp/out"}
    }

Filter/field expressions are evaluated with ``pyarrow.dataset`` expression
syntax via ``pc.field`` names inside a restricted eval namespace — no Jinja.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .stages import transforms as T

ComponentFactory = Callable[[dict], Callable[[pa.Table], pa.Table]]

_REGISTRY: dict[str, ComponentFactory] = {}


def register_component(name: str):
    def deco(fn: ComponentFactory) -> ComponentFactory:
        _REGISTRY[name] = fn
        return fn

    return deco


def _expr_fn(expr: str) -> Callable[[pa.Table], pa.Array]:
    """Compile a column expression over batch columns: names resolve to
    columns, evaluated with pyarrow.compute semantics via a restricted
    namespace (no builtins)."""

    def fn(t: pa.Table) -> pa.Array:
        ns = {name: t[name] for name in t.schema.names}
        ns.update({"pc": pc, "pa": pa})
        out = eval(expr, {"__builtins__": {}}, ns)  # noqa: S307 — restricted ns
        return out if isinstance(out, (pa.Array, pa.ChunkedArray)) else pa.array(out)

    return fn


@register_component("add_fields")
def _add_fields(cfg: dict):
    return T.add_fields({k: _expr_fn(v) if isinstance(v, str) else v for k, v in cfg["fields"].items()})


@register_component("remove_fields")
def _remove_fields(cfg: dict):
    return T.remove_fields(cfg["names"])


@register_component("record_filter")
def _record_filter(cfg: dict):
    return T.record_filter(_expr_fn(cfg["expr"]))


@register_component("flatten_json")
def _flatten_json(cfg: dict):
    return T.flatten_json(cfg["column"], keep=cfg.get("keep"), prefix=cfg.get("prefix", ""))


@register_component("hash_id")
def _hash_id(cfg: dict):
    return T.hash_id(cfg["cols"], name=cfg.get("name", "_airbyte_hashid"))


@register_component("emitted_at")
def _emitted_at(cfg: dict):
    return T.emitted_at(cfg.get("name", "_airbyte_emitted_at"))


def build_pipeline(spec: dict) -> ray.data.Dataset:
    """Assemble and return the (lazy) Dataset for a declarative spec."""
    src = spec["source"]
    fmt = src.get("format", "parquet")
    if fmt == "parquet":
        cols = src.get("columns")
        if cols:
            # ray 2.49 bug: columns= together with partitioning=None raises
            # UnboundLocalError in parquet_datasource — use default
            # partitioning when pruning columns (pushdown matters more)
            ds = ray.data.read_parquet(src["path"], columns=cols)
        else:
            ds = ray.data.read_parquet(src["path"], partitioning=None)
    elif fmt == "json":
        ds = ray.data.read_json(src["path"])
    elif fmt == "csv":
        ds = ray.data.read_csv(src["path"])
    else:
        raise ValueError(f"unknown source format {fmt}")

    stages = []
    for tcfg in spec.get("transforms", []):
        kind = tcfg["type"]
        if kind not in _REGISTRY:
            raise ValueError(f"unknown component {kind!r}; register_component first")
        stages.append(_REGISTRY[kind](tcfg))
    if stages:
        ds = ds.map_batches(T.compose(*stages), batch_format="pyarrow")
    return ds


def run_pipeline(spec: dict) -> dict:
    """Build and, if a sink is configured, write; returns summary stats."""
    ds = build_pipeline(spec)
    sink = spec.get("sink")
    if sink:
        fmt = sink.get("format", "parquet")
        if fmt == "parquet":
            ds.write_parquet(sink["path"])
        elif fmt == "json":
            ds.write_json(sink["path"])
        elif fmt == "csv":
            ds.write_csv(sink["path"])
        else:
            raise ValueError(f"unknown sink format {fmt}")
        return {"written": True, "path": sink["path"]}
    return {"written": False, "rows": ds.count()}
