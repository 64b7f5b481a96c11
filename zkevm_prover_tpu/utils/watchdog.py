"""Watchdog — liveness timer for the aggregator stream.

Reference: src/utils/watchdog.hpp:6-23 + aggregator_client.cpp:873-888 — a
thread that kills the process when the stream stalls past the configured
timeout; recovery is restart + reconnect. Here the action is injectable so
services can reconnect instead of dying (and tests can observe firings).
"""

from __future__ import annotations

import threading


class Watchdog:
    def __init__(self, timeout_s: float, on_timeout, name: str = "watchdog"):
        self.timeout_s = timeout_s
        self.on_timeout = on_timeout
        self.name = name
        self._timer: threading.Timer | None = None
        self._lock = threading.Lock()
        self.fired = 0

    def _fire(self):
        self.fired += 1
        self.on_timeout()

    def start(self) -> None:
        self.kick()

    def kick(self) -> None:
        """Reset the countdown (call on every message received)."""
        with self._lock:
            if self._timer is not None:
                self._timer.cancel()
            self._timer = threading.Timer(self.timeout_s, self._fire)
            self._timer.daemon = True
            self._timer.start()

    def stop(self) -> None:
        with self._lock:
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
