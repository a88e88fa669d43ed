"""Paginated-source analog: fetch loop, 3 pagination strategies, record
selection, retry/backoff interplay (reference http.py:416-465,
rate_limiting.py, paginators/strategies/*)."""

import json
import os

import pyarrow as pa
import pytest

from airbyte_ray.declarative import build_pipeline
from airbyte_ray.sources.paginated import (
    CursorPaginator,
    FileFixtureRequester,
    OffsetPaginator,
    PagePaginator,
    TransientError,
    read_pages,
    read_paginated,
    select_records,
)
from airbyte_ray.stages.retry import RetriesExhausted


def _write_pages(d, stream, pages, cursor=False):
    os.makedirs(os.path.join(d, stream), exist_ok=True)
    for i, recs in enumerate(pages):
        body = {"data": recs}
        if cursor and i + 1 < len(pages):
            body["next"] = i + 1
        with open(os.path.join(d, stream, f"page-{i}.json"), "w") as f:
            json.dump(body, f)


@pytest.fixture()
def api_dir(tmp_path):
    d = str(tmp_path / "api")
    # 3 full pages of 2 + one short page → 7 records
    pages = [[{"id": n * 2, "v": f"r{n * 2}"}, {"id": n * 2 + 1, "v": f"r{n * 2 + 1}"}] for n in range(3)]
    pages.append([{"id": 6, "v": "r6"}])
    _write_pages(d, "users", pages)
    _write_pages(d, "users_cursor", pages, cursor=True)
    return d


def _collect(requester, pag, **kw):
    out = []
    for recs in read_pages(requester, pag, record_path="data", **kw):
        out.extend(recs)
    return out


def test_page_increment_stops_on_short_page(api_dir):
    req = FileFixtureRequester(api_dir, "users/page-{page}.json")
    recs = _collect(req, PagePaginator(page_size=2))
    assert [r["id"] for r in recs] == list(range(7))
    assert req.request_count == 4  # stops on the short page, no 404 probe


def test_cursor_pagination_follows_next_token(api_dir):
    req = FileFixtureRequester(api_dir, "users_cursor/page-{page}.json")
    recs = _collect(req, CursorPaginator(cursor_path="next", start=0))
    assert [r["id"] for r in recs] == list(range(7))


def test_offset_paginator_params():
    pag = OffsetPaginator(page_size=3)
    assert pag.first_params() == {"offset": 0, "limit": 3}
    from airbyte_ray.sources.paginated import Response

    nxt = pag.next_params(Response(200), [{}, {}, {}])
    assert nxt == {"offset": 3, "limit": 3}
    assert pag.next_params(Response(200), [{}]) is None  # short page stops


def test_record_selector_dpath():
    assert select_records({"a": {"b": [1, 2]}}, "a.b") == [1, 2]
    assert select_records({"a": {}}, "a.b") == []
    assert select_records({"one": {"x": 1}}, "one") == [{"x": 1}]


def test_retry_backoff_uses_server_hint(api_dir):
    """Two injected 429s with Retry-After: the loop must retry with the
    server-driven wait and still return every record."""
    sleeps = []
    req = FileFixtureRequester(
        api_dir, "users/page-{page}.json",
        flaky={"users/page-1.json": 2}, retry_after=0.123,
    )
    recs = _collect(req, PagePaginator(page_size=2), sleep=sleeps.append)
    assert [r["id"] for r in recs] == list(range(7))
    assert sleeps == [0.123, 0.123]  # server hint, not the exponential base


def test_retries_exhausted_surfaces(api_dir):
    req = FileFixtureRequester(
        api_dir, "users/page-{page}.json", flaky={"users/page-0.json": 99}
    )
    with pytest.raises(RetriesExhausted):
        _collect(req, PagePaginator(page_size=2), max_retries=2, sleep=lambda s: None)


def test_read_paginated_slices_fan_out(api_dir, tmp_path):
    """Slices are the unit of parallelism; records carry their slice params
    (the SubstreamPartitionRouter parent-key stamp)."""
    for parent in ("p1", "p2"):
        _write_pages(str(tmp_path / "multi"), parent,
                     [[{"id": 0, "v": parent + "a"}, {"id": 1, "v": parent + "b"}], [{"id": 2, "v": parent + "c"}]])
    spec = {
        "api_dir": str(tmp_path / "multi"),
        "path_template": "{parent}/page-{page}.json",
        "paginator": "page",
        "paginator_args": {"page_size": 2},
        "record_path": "data",
        "slices": [{"parent": "p1"}, {"parent": "p2"}],
    }
    rows = read_paginated(spec).take_all()
    assert len(rows) == 6
    assert {(r["parent"], r["id"]) for r in rows} == {
        (p, i) for p in ("p1", "p2") for i in range(3)
    }


def test_declarative_paginated_pipeline(api_dir):
    """The paginated source composes with declarative transforms."""
    spec = {
        "source": {
            "format": "paginated",
            "api_dir": api_dir,
            "path_template": "users/page-{page}.json",
            "paginator": "page",
            "paginator_args": {"page_size": 2},
            "record_path": "data",
        },
        "transforms": [{"type": "record_filter", "expr": "id >= 3"}],
    }
    rows = build_pipeline(spec).take_all()
    assert sorted(r["id"] for r in rows) == [3, 4, 5, 6]


def test_declared_fields_conform_heterogeneous_slices(tmp_path):
    """spec['fields'] pins the output schema: slices whose JSON records have
    differing/missing keys — and fully EMPTY slices — all emit blocks with
    the same columns (advice finding: per-slice inferred schemas made block
    schemas data-dependent and broke downstream unions)."""
    d = str(tmp_path / "api")
    os.makedirs(os.path.join(d, "s1"))
    os.makedirs(os.path.join(d, "s2"))
    with open(os.path.join(d, "s1", "page-0.json"), "w") as f:
        json.dump({"data": [{"id": 1, "v": "a"}, {"id": 2}]}, f)  # 'v' missing on one
    with open(os.path.join(d, "s2", "page-0.json"), "w") as f:
        json.dump({"data": [{"id": 3, "extra": True}]}, f)  # undeclared key ignored
    # slice s3 has no page file at all → empty slice
    spec = {
        "api_dir": d,
        "path_template": "{s}/page-{page}.json",
        "paginator": "page",
        "paginator_args": {"page_size": 10},
        "record_path": "data",
        "slices": [{"s": "s1"}, {"s": "s2"}, {"s": "s3"}],
        "fields": {"id": "int64", "s": "string", "v": "string"},
    }
    ds = read_paginated(spec, concurrency=1)
    t = pa.Table.from_pylist(ds.take_all())
    assert sorted(t.column_names) == ["id", "s", "v"]
    rows = sorted(t.to_pylist(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[1]["v"] is None  # missing key null-filled
    assert "extra" not in t.column_names  # undeclared key dropped


def test_declared_schema_streams_bounded_batches(tmp_path):
    """With spec['fields'] and rows_per_batch, one huge slice yields many
    bounded Arrow batches mid-page-loop instead of accumulating the whole
    slice in the worker heap (advice finding)."""
    from airbyte_ray.sources.paginated import _SliceFetcher

    d = str(tmp_path / "api")
    n_pages, per_page = 10, 50
    pages = [[{"id": p * per_page + i} for i in range(per_page)]
             for p in range(n_pages)]
    _write_pages(d, "big", pages)
    spec = {
        "api_dir": d,
        "path_template": "big/page-{page}.json",
        "paginator": "page",
        "paginator_args": {"page_size": per_page},
        "record_path": "data",
        "fields": {"id": "int64"},
        "rows_per_batch": 100,
    }
    fetcher = _SliceFetcher(spec)
    batches = list(fetcher(pa.Table.from_pylist([{"slice_json": "{}"}])))
    assert len(batches) >= 5  # 500 rows / 100-cap → mid-slice emission
    assert all(b.num_rows <= 100 for b in batches)
    assert all(b.schema.names == ["id"] for b in batches)
    ids = sorted(i for b in batches for i in b.column("id").to_pylist())
    assert ids == list(range(n_pages * per_page))


# -- auth components (reference: declarative/auth/token.py, oauth.py) -------

def test_oauth2_refresh_on_401_mid_read(api_dir, tmp_path):
    """The server expires the first access token mid-read: the
    authenticated requester must refresh from the token endpoint exactly
    once (on the 401) and the full read completes — reference discipline:
    cached token until expiry, re-fetch on invalidation."""
    from airbyte_ray.sources.auth import AuthenticatedRequester, OAuth2Auth

    td = str(tmp_path / "tokens")
    os.makedirs(td)
    for k, tok in enumerate(["tokA", "tokB"]):
        with open(os.path.join(td, f"token-{k}.json"), "w") as f:
            json.dump({"access_token": tok, "expires_in": 3600}, f)

    inner = FileFixtureRequester(
        api_dir, "users/page-{page}.json",
        valid_tokens=["tokA", "tokB"], rotate_every=2,  # tokA dies after 2 uses
    )
    auth = OAuth2Auth(td)
    req = AuthenticatedRequester(inner, auth)
    recs = _collect(req, PagePaginator(page_size=2))
    assert [r["id"] for r in recs] == list(range(7))
    assert auth.refresh_count == 2  # initial fetch + exactly one 401 refresh
    assert inner.unauthorized_count == 1


def test_static_auth_headers_and_terminal_401(api_dir, tmp_path):
    """api_key/bearer/basic inject the right headers; a 401 that persists
    after the single refresh-retry surfaces as a hard error (not a silent
    empty stream)."""
    from airbyte_ray.sources.auth import (
        ApiKeyAuth, AuthenticatedRequester, BasicAuth, BearerAuth, build_auth,
    )

    assert ApiKeyAuth("X-Key", "k1").headers() == {"X-Key": "k1"}
    assert BearerAuth("t").headers() == {"Authorization": "Bearer t"}
    assert BasicAuth("u", "p").headers() == {"Authorization": "Basic dTpw"}
    assert build_auth({"type": "bearer", "token": "t"}).headers()[
        "Authorization"] == "Bearer t"

    ok = FileFixtureRequester(api_dir, "users/page-{page}.json", valid_tokens=["t"])
    recs = _collect(AuthenticatedRequester(ok, BearerAuth("t")), PagePaginator(page_size=2))
    assert len(recs) == 7

    bad = FileFixtureRequester(api_dir, "users/page-{page}.json", valid_tokens=["t"])
    with pytest.raises(RuntimeError, match="401"):
        _collect(AuthenticatedRequester(bad, BearerAuth("WRONG")), PagePaginator(page_size=2))


def test_auth_wired_into_declarative_spec(api_dir, tmp_path):
    """spec['auth'] flows through read_paginated: the actor-pool requester
    authenticates, survives a server-side token rotation, and the Dataset
    read completes."""
    td = str(tmp_path / "tok2")
    os.makedirs(td)
    for k, tok in enumerate(["s0", "s1", "s2"]):
        with open(os.path.join(td, f"token-{k}.json"), "w") as f:
            json.dump({"access_token": tok, "expires_in": 3600}, f)
    spec = {
        "api_dir": api_dir,
        "path_template": "users/page-{page}.json",
        "paginator": "page",
        "paginator_args": {"page_size": 2},
        "record_path": "data",
        "slices": [{}],
        "auth": {"type": "oauth2", "token_dir": td},
        "server_tokens": ["s0", "s1", "s2"],
        "server_rotate_every": 2,
    }
    rows = read_paginated(spec, concurrency=1).take_all()
    assert sorted(r["id"] for r in rows) == list(range(7))
