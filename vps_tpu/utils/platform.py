"""Make the JAX_PLATFORMS env var authoritative for CLI tools.

The environment may install a sitecustomize that registers an out-of-process
TPU plugin and calls ``jax.config.update("jax_platforms", ...)`` at interpreter
startup. A config update beats the env var, so a child process launched with
``JAX_PLATFORMS=cpu`` (the documented way to pin a CLI tool to CPU — used by
the subprocess CLI tests) silently runs on the plugin's platform instead, and
hard-fails when that backend is unreachable. Every CLI tool calls
:func:`apply_env_platforms` right after ``import jax`` so the env var wins
again.
"""

from __future__ import annotations

import os


def apply_env_platforms() -> None:
    """Re-assert ``JAX_PLATFORMS`` from the environment over any value a
    sitecustomize set via ``jax.config.update`` at interpreter startup."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
