"""Retry/backoff for external-call stages — the HTTP retry parity.

Reference: exponential backoff with server-driven waits and max_retries
(``airbyte-cdk/.../streams/http/http.py:94-114,228-251``,
``rate_limiting.py``).  Ray already retries whole tasks
(``max_retries``/``retry_exceptions`` on map_batches); this decorator is the
*in-task* analog for per-call transient failures (an external service call
inside a batch fn), so one flaky call doesn't fail and re-run a whole task.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Iterable, Type


class RetriesExhausted(RuntimeError):
    pass


def with_retries(
    max_retries: int = 5,
    base_delay: float = 0.5,
    factor: float = 2.0,
    max_delay: float = 60.0,
    retry_on: Iterable[Type[BaseException]] = (Exception,),
    backoff_hint: Callable[[BaseException], float | None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """Exponential backoff decorator.  ``backoff_hint(exc)`` may return a
    server-driven wait (Retry-After analog), overriding the schedule."""
    retry_on = tuple(retry_on)

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last: BaseException | None = None
            for attempt in range(max_retries + 1):
                try:
                    return fn(*args, **kwargs)
                except retry_on as e:  # noqa: PERF203
                    last = e
                    if attempt == max_retries:
                        break
                    hint = backoff_hint(e) if backoff_hint else None
                    delay = hint if hint is not None else min(
                        base_delay * factor**attempt, max_delay
                    )
                    delay = max(delay, 0.0)  # a past Retry-After date yields a
                    # negative hint; time.sleep(-x) would abort the retry loop
                    sleep(delay)
            raise RetriesExhausted(
                f"{fn.__name__} failed after {max_retries + 1} attempts"
            ) from last

        return wrapper

    return deco
