"""Cross-cutting utilities: profiling/tracing, platform helpers."""

from .profiling import phase_timer, trace
from .platform import force_platform, sync

__all__ = ["phase_timer", "trace", "force_platform", "sync"]
