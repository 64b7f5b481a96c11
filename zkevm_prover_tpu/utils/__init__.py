"""Utilities / observability / config (L1).

Framework counterpart of the reference's src/utils + src/config (SURVEY.md
§2 L1, §5): zklog-style structured logging, TimerStart/TimerStopAndLog phase
timers with TimeMetricStorage aggregation, a Watchdog, and the flat Config
with JSON + environment-variable overrides.
"""

from .config import Config
from .timers import TimeMetricStorage, timer
from .watchdog import Watchdog
from .zklog import zklog

__all__ = ["Config", "TimeMetricStorage", "timer", "Watchdog", "zklog"]
