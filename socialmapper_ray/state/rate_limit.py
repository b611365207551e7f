"""Token-bucket rate limiter (reference ST5, util/rate_limiter.py:14-64
and census/infrastructure/rate_limiter.py:66-113).

For stages with side effects against a rate-limited resource (an
external API at deploy time; nothing in this sandbox). Deterministic
and injectable-clock for tests; thread-safe like the reference
(RLock). The Ray-native usage is one bucket per ACTOR (each actor owns
its slice of the global budget: global_rate / pool_size), which needs
no cross-actor coordination.
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    def __init__(self, rate_per_sec: float, capacity: float | None = None,
                 clock=time.monotonic):
        self.rate = float(rate_per_sec)
        self.capacity = float(capacity if capacity is not None
                              else max(1.0, rate_per_sec))
        self._tokens = self.capacity
        self._clock = clock
        self._last = clock()
        self._lock = threading.RLock()

    def _refill(self):
        now = self._clock()
        self._tokens = min(self.capacity,
                           self._tokens + (now - self._last) * self.rate)
        self._last = now

    def try_acquire(self, n: float = 1.0) -> bool:
        with self._lock:
            self._refill()
            if self._tokens >= n:
                self._tokens -= n
                return True
            return False

    def acquire(self, n: float = 1.0, timeout: float | None = None,
                sleep=time.sleep) -> bool:
        """Block (sleeping) until n tokens are available or timeout."""
        deadline = None if timeout is None else self._clock() + timeout
        while True:
            with self._lock:
                self._refill()
                if self._tokens >= n:
                    self._tokens -= n
                    return True
                need = (n - self._tokens) / self.rate
            if deadline is not None and self._clock() + need > deadline:
                return False
            sleep(min(need, 0.05) if timeout is None else need)

    @property
    def available(self) -> float:
        with self._lock:
            self._refill()
            return self._tokens
