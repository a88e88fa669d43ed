"""Paginated-API source analog (no network): requester + paginator +
record selector over file-backed page fixtures.

Reference surface being re-expressed:

* the HTTP fetch loop — request page, parse, emit records, compute next
  page token, stop when exhausted
  (``airbyte-cdk/python/airbyte_cdk/sources/streams/http/http.py:416-465``);
* pagination strategies — cursor-from-response, offset increment, page
  increment, each with a stop condition
  (``declarative/requesters/paginators/strategies/*.py``);
* record selection from the response body
  (``declarative/extractors/record_selector.py``);
* retry/backoff with server-driven waits
  (``http/rate_limiting.py`` — our :mod:`..stages.retry`).

This sandbox has no network, so the Requester is an interface and the
shipped implementation serves JSON pages from a directory — the page files
ARE the HTTP responses.  Everything above the requester (the fetch loop,
pagination, selection, retries, Ray parallelism) is the real machinery a
network-backed requester would plug into.

Ray-Data-first parallelism model: a *slice* (parent id, date window …) is
the unit of parallelism, exactly as in the reference — slices fan out as a
Dataset, and each slice's page loop runs sequentially inside an actor-pool
task (pagination is inherently sequential *within* a slice: the next
request depends on the previous response).  Records convert to Arrow at
the boundary, one table per page batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import pyarrow as pa
import ray.data

from ..stages.retry import with_retries


# ---------------------------------------------------------------------------
# responses + requesters
# ---------------------------------------------------------------------------

@dataclass
class Response:
    """Minimal HTTP-response analog."""

    status: int
    body: Any = None
    headers: dict = field(default_factory=dict)


class TransientError(RuntimeError):
    """Retryable failure (429/5xx analog).  ``retry_after`` carries the
    server-driven wait (Retry-After header analog)."""

    def __init__(self, status: int, retry_after: float | None = None):
        super().__init__(f"transient status {status}")
        self.status = status
        self.retry_after = retry_after


class FileFixtureRequester:
    """Serve pages from ``api_dir`` — request params format ``path_template``
    into a relative file path.  A missing file is a 404 (end of data, the
    empty-page stop condition).  ``flaky`` optionally injects transient
    failures: ``{path: n}`` fails the first n requests for that path with a
    429 carrying a Retry-After hint — the retry/backoff test hook.

    Auth-server behavior (exercises the :mod:`.auth` components):
    ``valid_tokens`` makes the server REQUIRE ``Authorization: Bearer
    <current>`` where the current token starts at ``valid_tokens[0]`` and
    rotates to the next entry every ``rotate_every`` authorized requests
    (the old token expires server-side) — a mid-read rotation forces the
    client's refresh-on-401 path.  Wrong/missing tokens get a 401."""

    def __init__(self, api_dir: str, path_template: str, flaky: dict | None = None,
                 retry_after: float = 0.01, valid_tokens: list[str] | None = None,
                 rotate_every: int = 0):
        self.api_dir = api_dir
        self.template = path_template
        self.flaky = dict(flaky or {})
        self.retry_after = retry_after
        self.request_count = 0
        self.valid_tokens = list(valid_tokens or [])
        self.rotate_every = rotate_every
        self._token_idx = 0
        self._authorized_count = 0
        self.unauthorized_count = 0

    def _check_auth(self, headers: dict | None) -> bool:
        if not self.valid_tokens:
            return True
        current = self.valid_tokens[min(self._token_idx, len(self.valid_tokens) - 1)]
        if (headers or {}).get("Authorization") != f"Bearer {current}":
            self.unauthorized_count += 1
            return False
        self._authorized_count += 1
        if self.rotate_every and self._authorized_count % self.rotate_every == 0:
            self._token_idx += 1  # current token just expired server-side
        return True

    def request(self, params: dict, headers: dict | None = None) -> Response:
        rel = self.template.format(**params)
        self.request_count += 1
        if not self._check_auth(headers):
            return Response(401)
        if self.flaky.get(rel, 0) > 0:
            self.flaky[rel] -= 1
            raise TransientError(429, retry_after=self.retry_after)
        path = os.path.join(self.api_dir, rel)
        if not os.path.exists(path):
            return Response(404)
        with open(path) as f:
            return Response(200, body=json.load(f))


# ---------------------------------------------------------------------------
# pagination strategies (cursor / offset / page)
# ---------------------------------------------------------------------------

class CursorPaginator:
    """Next token comes from the response body (``cursor_path``), stop when
    absent — ``CursorPaginationStrategy``."""

    def __init__(self, cursor_path: str = "next", start: Any = 0):
        self.cursor_path, self.start = cursor_path, start

    def first_params(self) -> dict:
        return {"page": self.start}

    def next_params(self, resp: Response, records: list) -> dict | None:
        token = (resp.body or {}).get(self.cursor_path)
        return None if token is None else {"page": token}


class OffsetPaginator:
    """Advance by len(records); stop when a page comes back short —
    ``OffsetIncrement``."""

    def __init__(self, page_size: int):
        self.page_size = page_size
        self._offset = 0

    def first_params(self) -> dict:
        self._offset = 0
        return {"offset": 0, "limit": self.page_size}

    def next_params(self, resp: Response, records: list) -> dict | None:
        if len(records) < self.page_size:
            return None
        self._offset += len(records)
        return {"offset": self._offset, "limit": self.page_size}


class PagePaginator:
    """Advance the page number; stop on a short (or empty) page —
    ``PageIncrement``."""

    def __init__(self, page_size: int, start_page: int = 0):
        self.page_size, self.start_page = page_size, start_page
        self._page = start_page

    def first_params(self) -> dict:
        self._page = self.start_page
        return {"page": self._page}

    def next_params(self, resp: Response, records: list) -> dict | None:
        if len(records) < self.page_size:
            return None
        self._page += 1
        return {"page": self._page}


PAGINATORS: dict[str, Callable[..., Any]] = {
    "cursor": CursorPaginator,
    "offset": OffsetPaginator,
    "page": PagePaginator,
}


def select_records(body: Any, record_path: str | None) -> list:
    """Record selector: descend ``record_path`` ('a.b' dpath-lite) into the
    response body; a missing path or 404 body yields no records."""
    node = body
    if record_path:
        for part in record_path.split("."):
            if not isinstance(node, dict) or part not in node:
                return []
            node = node[part]
    if node is None:
        return []
    return node if isinstance(node, list) else [node]


# ---------------------------------------------------------------------------
# the fetch loop + Ray integration
# ---------------------------------------------------------------------------

def read_pages(
    requester,
    paginator,
    record_path: str | None = None,
    slice_params: dict | None = None,
    max_retries: int = 5,
    sleep: Callable[[float], None] | None = None,
) -> Iterator[list]:
    """The reference fetch loop (``http.py:416-465``): request → select →
    yield → next token, with exponential backoff and server-driven waits
    around each request.  Yields one record list per page."""
    import time as _time

    call = with_retries(
        max_retries=max_retries,
        base_delay=0.05,
        retry_on=(TransientError,),
        backoff_hint=lambda e: getattr(e, "retry_after", None),
        sleep=sleep or _time.sleep,
    )(requester.request)

    params = paginator.first_params()
    while params is not None:
        resp = call({**(slice_params or {}), **params})
        if resp.status == 404:
            return
        if resp.status != 200:
            # e.g. a 401 that survived the auth refresh-retry: fail loudly —
            # treating it as an empty page would silently truncate the slice
            raise RuntimeError(f"request failed with status {resp.status}")
        records = select_records(resp.body, record_path)
        if records:
            yield records
        params = paginator.next_params(resp, records)


_FIELD_TYPES: dict[str, pa.DataType] = {
    "string": pa.string(), "int64": pa.int64(), "int32": pa.int32(),
    "float64": pa.float64(), "bool": pa.bool_(),
    "timestamp_us": pa.timestamp("us", tz="UTC"),
}


def spec_schema(spec: dict) -> pa.Schema | None:
    """Explicit output schema from ``spec['fields']`` ({name: type-string}).
    When present, every slice's output — including empty slices — conforms
    to it, so heterogeneous JSON pages (missing keys, empty slices) can't
    produce data-dependent block schemas (advice finding)."""
    f = spec.get("fields")
    if not f:
        return None
    return pa.schema([(n, _FIELD_TYPES[t]) for n, t in f.items()])


class _SliceFetcher:
    """Actor-pool stage: one task = one slice's full page loop.  The
    requester is constructed once per actor (the per-worker CachedSession
    analog); batches arrive as 1-row tables of slice params.

    With a declared schema (``spec['fields']``), ``__call__`` STREAMS —
    it yields a bounded Arrow batch every ``rows_per_batch`` rows, so an
    unbounded slice (a huge API stream) never accumulates in the worker
    heap and downstream stages start while the page loop is still
    running.  Without a declared schema the slice must be emitted whole
    (its column set is only known once every page arrived), which is the
    documented trade-off of schemaless specs."""

    def __init__(self, spec: dict):
        self.spec = spec
        self.schema = spec_schema(spec)
        self.requester = FileFixtureRequester(
            spec["api_dir"], spec["path_template"], flaky=spec.get("flaky"),
            valid_tokens=spec.get("server_tokens"),
            rotate_every=spec.get("server_rotate_every", 0),
        )
        if spec.get("auth"):
            # per-actor authenticator (token cache lives with the worker,
            # the CachedSession pattern); the wrapper injects headers and
            # refreshes-and-retries once on 401
            from .auth import AuthenticatedRequester, build_auth

            self.requester = AuthenticatedRequester(self.requester, build_auth(spec["auth"]))

    def __call__(self, t: pa.Table):
        spec = self.spec
        cap = int(spec.get("rows_per_batch", 4096))
        out: list[dict] = []
        for row in t.to_pylist():
            sl = json.loads(row["slice_json"])
            kind = spec.get("paginator", "page")
            # per-type defaults: CursorPaginator takes no page_size
            # (review finding)
            default_args = {} if kind == "cursor" else {"page_size": 100}
            pag = PAGINATORS[kind](**spec.get("paginator_args", default_args))
            for records in read_pages(
                self.requester, pag,
                record_path=spec.get("record_path"),
                slice_params=sl,
                max_retries=spec.get("max_retries", 5),
            ):
                for r in records:
                    out.append({**sl, **r})
                if self.schema is not None and len(out) >= cap:
                    # declared schema: stream a bounded batch mid-slice —
                    # heap stays O(rows_per_batch) however long the page
                    # loop runs (advice finding: no whole-slice pylist)
                    yield pa.Table.from_pylist(out, schema=self.schema)
                    out = []
        if self.schema is not None:
            # missing keys null-fill, values cast, empties come back with
            # the same columns — block schemas are data-independent
            yield pa.Table.from_pylist(out, schema=self.schema)
        elif not out:
            yield pa.Table.from_pylist([], schema=pa.schema([]))
        else:
            tbl = pa.Table.from_pylist(out)
            yield tbl.select(sorted(tbl.schema.names))  # stable cross-slice schema


def substream_slices(
    parent: "ray.data.Dataset | pa.Table | str",
    parent_key: str,
    slice_field: str | None = None,
    extra: dict | None = None,
) -> list[dict]:
    """SubstreamPartitionRouter: derive child-stream slices from a parent
    stream's records — one slice per distinct parent key, stamped as
    ``{slice_field: key}``
    (``declarative/partition_routers/substream_partition_router.py`` /
    ``HttpSubStream.stream_slices``).  The parent read prunes to the key
    column; distinct keys come back via a Ray aggregate, NOT a driver scan
    of parent rows."""
    slice_field = slice_field or parent_key
    if isinstance(parent, str):
        parent = ray.data.read_parquet(parent, columns=[parent_key])
    if isinstance(parent, pa.Table):
        raw = set(parent[parent_key].to_pylist())
    else:
        raw = set(parent.select_columns([parent_key]).unique(parent_key))
    # a null parent key cannot format into a request path — drop, don't crash
    keys = sorted(k for k in raw if k is not None)
    return [{slice_field: k, **(extra or {})} for k in keys]


def read_paginated(spec: dict, concurrency: tuple | int = (1, 8)) -> ray.data.Dataset:
    """Declarative paginated source → Dataset.

    spec keys: ``api_dir``, ``path_template`` (formatted with slice params +
    paginator params), ``paginator`` ('cursor'|'offset'|'page'),
    ``paginator_args``, ``record_path``, ``slices`` (list of param dicts —
    the unit of parallelism; defaults to one empty slice) OR
    ``parent_stream`` ({path, key, field?, extra?} — slices derived from a
    parent table, the SubstreamPartitionRouter), ``flaky``,
    ``max_retries``."""
    slices = spec.get("slices")
    if slices is None and spec.get("parent_stream"):
        ps = spec["parent_stream"]
        slices = substream_slices(
            ps["path"], ps["key"], ps.get("field"), ps.get("extra")
        )
    slices = slices or [{}]
    items = [{"slice_json": json.dumps(sl, sort_keys=True)} for sl in slices]
    return ray.data.from_items(items).map_batches(
        _SliceFetcher,
        fn_constructor_args=(spec,),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
