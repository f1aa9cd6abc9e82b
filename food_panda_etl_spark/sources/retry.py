"""Single-layer retry with exponential backoff + jitter.

The reference nests two retry loops — 3 service-level retries around a
3-attempt HTTP client (``/root/reference/src/services/api.rs:33`` over
``src/clients/http.rs:74-156``) — up to 9 attempts per call. That
multiplication is a bug-shaped behavior SURVEY.md §3.2 flags to NOT copy:
here there is exactly one layer; Spark's ``spark.task.maxFailures``
provides the outer layer for free at task granularity.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def retry_with_backoff(
    fn: Callable[[int], T],
    *,
    retries: int = 3,
    base_delay_s: float = 1.0,
    max_jitter_s: float = 0.5,
    retryable: tuple[type[Exception], ...] = (Exception,),
    sleeper: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> T:
    """Call ``fn(attempt)`` with doubling backoff + jitter between failures
    (mirrors ``/root/reference/src/utils/retry.rs:4-29`` semantics, single
    layer). ``fn`` receives the 0-based attempt index — the reference uses
    it to rotate clients on HTTP 403 (``src/services/api.rs:90-91``).
    ``sleeper``/``rng`` are injectable so tests run without wall-clock
    sleeps."""
    rng = rng or random.Random()
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn(attempt)
        except retryable as exc:  # noqa: PERF203
            last = exc
            if attempt == retries:
                break
            delay = base_delay_s * (2**attempt) + rng.uniform(0.0, max_jitter_s)
            sleeper(delay)
    raise last  # type: ignore[misc]
