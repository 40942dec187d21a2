"""Utility helpers (profiling, platform selection)."""

from .platform import honor_jax_platforms_env
from .profiling import trace

__all__ = ["trace", "honor_jax_platforms_env"]
