"""Utility helpers: profiling, timing."""

from .profiling import trace

__all__ = ["trace"]
