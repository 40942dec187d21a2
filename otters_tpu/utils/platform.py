"""Platform selection helper for scripts and examples.

Remote-TPU images register their PJRT plugin from a ``sitecustomize`` hook
that pins ``jax_platforms`` in the jax CONFIG — and the config outranks the
``JAX_PLATFORMS`` environment variable. A script launched with
``JAX_PLATFORMS=cpu`` would therefore still initialize the remote backend
(and hang if the relay is unreachable). Calling this before the first
backend use re-asserts the user's explicit request.

The LIBRARY never calls this: selecting a platform is the application's
decision. Entry points (examples, bench.py, __graft_entry__) do.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """If JAX_PLATFORMS is set, write it into the jax config (which wins
    over any sitecustomize pin). No-op when unset or when backends are
    already initialized past the point of change."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
