"""Connector ``spec`` verb + config validation.

Reference: connectors answer ``spec`` with a JSON-schema of their config
(``airbyte-cdk/python/airbyte_cdk/entrypoint.py:26-137``) and every read
first validates the user config against it with field-level errors
(``sources/utils/schema_helpers.py`` ``check_config_against_spec_or_exit``).
This module is that surface for the engine's two config shapes:

* **stream** — :class:`airbyte_ray.config.StreamConfig` (the
  ConfiguredAirbyteStream analog), including its cross-field rules
  (incremental ⇒ cursor_field, append_dedup ⇒ primary_key);
* **pipeline** — the declarative pipeline spec consumed by
  :func:`airbyte_ray.declarative.build_pipeline` / ``run_sync``.

Validation uses jsonschema Draft-7 (the reference's own dialect) and
reports every violation with its JSON path, so a malformed spec fails
before any Ray work starts.
"""

from __future__ import annotations

SPEC_DIALECT = "http://json-schema.org/draft-07/schema#"

STREAM_CONFIG_SCHEMA: dict = {
    "$schema": SPEC_DIALECT,
    "title": "StreamConfig",
    "type": "object",
    "required": ["name"],
    "additionalProperties": False,
    "properties": {
        "name": {"type": "string", "minLength": 1},
        "sync_mode": {"enum": ["full_refresh", "incremental"]},
        "destination_sync_mode": {"enum": ["append", "overwrite", "append_dedup"]},
        "cursor_field": {"type": ["string", "null"]},
        "primary_key": {"type": "array", "items": {"type": "string"}},
        "num_partitions": {"type": "integer", "minimum": 1},
        "format": {"enum": ["parquet", "json", "csv", "avro"]},
        "slice_window_s": {"type": ["number", "null"], "exclusiveMinimum": 0},
        "lookback_s": {"type": "number", "minimum": 0},
    },
    "allOf": [
        {
            "if": {"properties": {"sync_mode": {"const": "incremental"}},
                   "required": ["sync_mode"]},
            "then": {"required": ["cursor_field"],
                     "properties": {"cursor_field": {"type": "string"}}},
        },
        {
            "if": {"properties": {"destination_sync_mode": {"const": "append_dedup"}},
                   "required": ["destination_sync_mode"]},
            "then": {"required": ["primary_key"],
                     "properties": {"primary_key": {"minItems": 1}}},
        },
    ],
}

_TRANSFORM_SCHEMA = {
    "type": "object",
    "required": ["type"],
    "properties": {"type": {"type": "string", "minLength": 1}},
}

PIPELINE_SPEC_SCHEMA: dict = {
    "$schema": SPEC_DIALECT,
    "title": "DeclarativePipelineSpec",
    "type": "object",
    "required": ["source"],
    "properties": {
        "source": {
            "type": "object",
            "properties": {
                "path": {"type": ["string", "array"]},
                "format": {"enum": ["parquet", "json", "csv", "paginated"]},
                "columns": {"type": "array", "items": {"type": "string"}},
                # paginated-source keys (sources/paginated.py)
                "api_dir": {"type": "string"},
                "path_template": {"type": "string"},
                "paginator": {"enum": ["cursor", "offset", "page"]},
                "paginator_args": {"type": "object"},
                "record_path": {"type": "string"},
                "slices": {"type": "array", "items": {"type": "object"}},
                "parent_stream": {"type": "object"},
                "fields": {"type": "object",
                           "additionalProperties": {"type": "string"}},
                "auth": {
                    "type": "object",
                    "required": ["type"],
                    "properties": {
                        "type": {"enum": ["api_key", "bearer", "basic", "oauth2"]},
                    },
                    # per-type required keys (build_auth's contract): without
                    # these a malformed auth spec passed validation and died
                    # as an opaque KeyError inside actor init (review finding)
                    "allOf": [
                        {"if": {"properties": {"type": {"const": "api_key"}}},
                         "then": {"required": ["header", "token"]}},
                        {"if": {"properties": {"type": {"const": "bearer"}}},
                         "then": {"required": ["token"]}},
                        {"if": {"properties": {"type": {"const": "basic"}}},
                         "then": {"required": ["username"]}},
                        {"if": {"properties": {"type": {"const": "oauth2"}}},
                         "then": {"required": ["token_dir"]}},
                    ],
                },
            },
            "allOf": [
                {
                    "if": {"properties": {"format": {"const": "paginated"}},
                           "required": ["format"]},
                    "then": {"required": ["api_dir", "path_template"]},
                    "else": {"required": ["path"]},
                }
            ],
        },
        "transforms": {"type": "array", "items": _TRANSFORM_SCHEMA},
        "incremental": {
            "type": "object",
            "properties": {
                "cursor_field": {"type": "string"},
                "lookback_s": {"type": "number", "minimum": 0},
                "slice_window_s": {"type": ["number", "null"]},
            },
        },
        "sink": {
            "type": "object",
            "properties": {
                "path": {"type": "string"},
                "stream": {"type": "string"},
                "mode": {"enum": ["append", "overwrite", "append_dedup"]},
                "format": {"enum": ["parquet", "json", "csv", "avro"]},
                "primary_key": {"type": "array", "items": {"type": "string"}},
                "num_partitions": {"type": "integer", "minimum": 1},
                "state_dir": {"type": "string"},
            },
        },
        "config": {"type": "object"},
    },
}

_SPECS = {"stream": STREAM_CONFIG_SCHEMA, "pipeline": PIPELINE_SPEC_SCHEMA}


def connector_spec() -> dict:
    """The ``spec`` verb payload: one JSON-schema per config kind (the
    ConnectorSpecification.connectionSpecification analog)."""
    return {"documentationUrl": "README.md", "connectionSpecification": dict(_SPECS)}


def validate_config(config: dict, kind: str = "stream") -> list[str]:
    """Field-level validation errors (empty list = valid).  Each entry is
    ``<json-path>: <message>`` — the check_config_against_spec analog,
    reporting ALL violations, not just the first."""
    import jsonschema

    if kind not in _SPECS:
        raise ValueError(f"unknown spec kind {kind!r} (want one of {sorted(_SPECS)})")
    validator = jsonschema.Draft7Validator(_SPECS[kind])
    errs = []
    for e in sorted(validator.iter_errors(config), key=lambda e: list(e.absolute_path)):
        path = "$" + "".join(
            f"[{p}]" if isinstance(p, int) else f".{p}" for p in e.absolute_path
        )
        errs.append(f"{path}: {e.message}")
    return errs


def check_config_or_raise(config: dict, kind: str = "stream") -> None:
    """Raise ``ValueError`` listing every violation (the *_or_exit analog
    for library callers)."""
    errs = validate_config(config, kind)
    if errs:
        raise ValueError(
            f"invalid {kind} config ({len(errs)} error(s)):\n  " + "\n  ".join(errs)
        )
