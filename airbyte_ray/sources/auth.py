"""Authenticator components for the paginated-source analog.

Re-expresses the reference's declarative auth stack
(``airbyte-cdk/python/airbyte_cdk/sources/declarative/auth/token.py`` —
ApiKeyAuthenticator / BearerAuthenticator / BasicHttpAuthenticator — and
``auth/oauth.py`` — DeclarativeOauth2Authenticator: access token fetched
from a refresh endpoint, cached until expiry, re-fetched when invalid)
against file fixtures: the sandbox has no network, so the "token endpoint"
is a JSON page served by the same :class:`FileFixtureRequester` mechanics,
and the fixture server validates the injected header and can expire tokens
mid-read to force a refresh.

The seam is :class:`AuthenticatedRequester`: it injects ``auth.headers()``
into every request and, on a 401, invalidates the cached token and retries
ONCE with fresh credentials (the abstract-oauth token-refresh-on-expiry
discipline).  Everything above the requester — fetch loop, pagination,
retries, Ray parallelism — is untouched.
"""

from __future__ import annotations

import base64
import json
import os
import time


class StaticHeaderAuth:
    """Base for auth components whose headers never change."""

    def headers(self) -> dict:  # pragma: no cover - overridden
        return {}

    def invalidate(self) -> None:
        """Static credentials can't refresh — a 401 with them is terminal."""


class ApiKeyAuth(StaticHeaderAuth):
    """``<header>: <token>`` (ApiKeyAuthenticator, token.py:19-54)."""

    def __init__(self, header: str, token: str):
        self.header, self.token = header, token

    def headers(self) -> dict:
        return {self.header: self.token}


class BearerAuth(StaticHeaderAuth):
    """``Authorization: Bearer <token>`` (BearerAuthenticator)."""

    def __init__(self, token: str):
        self.token = token

    def headers(self) -> dict:
        return {"Authorization": f"Bearer {self.token}"}


class BasicAuth(StaticHeaderAuth):
    """``Authorization: Basic base64(user:password)``
    (BasicHttpAuthenticator)."""

    def __init__(self, username: str, password: str = ""):
        raw = f"{username}:{password}".encode()
        self._value = "Basic " + base64.b64encode(raw).decode()

    def headers(self) -> dict:
        return {"Authorization": self._value}


class OAuth2Auth:
    """OAuth2 refresh-token flow against a file-fixture token endpoint
    (DeclarativeOauth2Authenticator, oauth.py:17-100 — fetch access token,
    cache until ``expires_in``, refresh when expired or invalidated).

    The fixture endpoint is ``<token_dir>/token-<k>.json`` where ``k``
    counts refreshes; each file carries ``{"access_token": ...,
    "expires_in": seconds}``.  A real deployment swaps ``_fetch`` for an
    HTTP POST of the refresh grant — everything else (caching, expiry,
    401-invalidation) is the production logic."""

    def __init__(self, token_dir: str, clock=time.monotonic):
        self.token_dir = token_dir
        self._clock = clock
        self._token: str | None = None
        self._expires_at: float = 0.0
        self.refresh_count = 0

    def _fetch(self) -> dict:
        path = os.path.join(self.token_dir, f"token-{self.refresh_count}.json")
        if not os.path.exists(path):
            raise RuntimeError(
                f"token refresh {self.refresh_count} failed: no credentials at {path}"
            )
        with open(path) as f:
            return json.load(f)

    def headers(self) -> dict:
        if self._token is None or self._clock() >= self._expires_at:
            body = self._fetch()
            self._token = body["access_token"]
            self._expires_at = self._clock() + float(body.get("expires_in", 3600))
            self.refresh_count += 1
        return {"Authorization": f"Bearer {self._token}"}

    def invalidate(self) -> None:
        """Server rejected the cached token (401) — drop it so the next
        ``headers()`` refreshes."""
        self._token = None


class AuthenticatedRequester:
    """Wrap any requester: inject auth headers, refresh-and-retry once on a
    401 (the reference's refresh-on-expiry + single retry discipline; a 401
    with FRESH credentials propagates — it is a real auth failure, not an
    expiry)."""

    def __init__(self, inner, auth):
        self.inner = inner
        self.auth = auth

    def request(self, params: dict):
        resp = self.inner.request(params, headers=self.auth.headers())
        if resp.status == 401:
            self.auth.invalidate()
            resp = self.inner.request(params, headers=self.auth.headers())
        return resp


def build_auth(spec: dict):
    """Auth component from a declarative spec dict (the model_to_component
    registry analog): ``{"type": "api_key"|"bearer"|"basic"|"oauth2", ...}``."""
    kind = spec["type"]
    if kind == "api_key":
        return ApiKeyAuth(spec["header"], spec["token"])
    if kind == "bearer":
        return BearerAuth(spec["token"])
    if kind == "basic":
        return BasicAuth(spec["username"], spec.get("password", ""))
    if kind == "oauth2":
        return OAuth2Auth(spec["token_dir"])
    raise ValueError(f"unknown auth type: {kind!r}")
