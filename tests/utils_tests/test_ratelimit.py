"""Rate limiter + backoff semantics (replaces ratelimit/backoff pkgs)."""

import time

import pytest

from instageo_tpu.utils.ratelimit import rate_limited, retry_backoff


def test_rate_limited_blocks_after_quota():
    calls = []

    @rate_limited(calls=3, period=0.4)
    def hit():
        calls.append(time.monotonic())

    start = time.monotonic()
    for _ in range(4):
        hit()
    # first 3 immediate, 4th waits for the window to roll
    assert calls[2] - start < 0.2
    assert calls[3] - start >= 0.35


def test_rate_limited_window_rolls():
    @rate_limited(calls=1, period=0.15)
    def hit():
        return time.monotonic()

    t1 = hit()
    t2 = hit()
    t3 = hit()
    assert t2 - t1 >= 0.12
    assert t3 - t2 >= 0.12


def test_retry_backoff_retries_then_succeeds():
    attempts = []

    @retry_backoff(exceptions=(ValueError,), max_tries=4, base=0.01,
                   jitter=False)
    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise ValueError("transient")
        return "ok"

    assert flaky() == "ok"
    assert len(attempts) == 3


def test_retry_backoff_raises_after_max_tries():
    attempts = []

    @retry_backoff(exceptions=(ValueError,), max_tries=3, base=0.01,
                   jitter=False)
    def always_fails():
        attempts.append(1)
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        always_fails()
    assert len(attempts) == 3


def test_retry_backoff_ignores_other_exceptions():
    @retry_backoff(exceptions=(ValueError,), max_tries=5, base=0.01)
    def boom():
        raise KeyError("not retried")

    with pytest.raises(KeyError):
        boom()


def test_retry_backoff_respects_max_time():
    attempts = []

    @retry_backoff(exceptions=(ValueError,), max_tries=50, max_time=0.2,
                   base=0.1, jitter=False)
    def slow_fail():
        attempts.append(1)
        raise ValueError("x")

    start = time.monotonic()
    with pytest.raises(ValueError):
        slow_fail()
    # stopped by the time budget, far short of 50 tries
    assert time.monotonic() - start < 2.0
    assert len(attempts) < 10
