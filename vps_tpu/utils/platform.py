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


def cpu_cache_dir(base: str = "/tmp/jax_compile_cache_cpu") -> str:
    """Machine-fingerprinted XLA CPU compile-cache directory.

    XLA:CPU persistent-cache entries embed the COMPILE machine's CPU
    features; loading them on a host with different features logs
    ``cpu_aot_loader ... doesn't match`` and risks wrong code / SIGILL
    (observed: /tmp shipped in the image with another machine's AOT blobs —
    it timed out the round-3 multichip driver gate). Keying the directory by
    a digest of this host's cpuinfo flags implements the CLAUDE.md "wipe the
    cache" rule in code: a different machine simply starts a fresh dir.
    """
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            flags = model = ""
            for line in f:
                # model name too: XLA tuning features (+prefer-no-scatter /
                # +prefer-no-gather on some microarches) are derived from
                # CPU-model detection, NOT the flags list — two hosts with
                # identical flag lists can still emit incompatible AOT code
                # (observed as cpu_aot_loader feature-mismatch warnings).
                if not flags and line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
            feats = model + "|" + flags
    except OSError:
        import platform as _pl

        feats = _pl.machine() + _pl.processor()
    return f"{base}_{hashlib.md5(feats.encode()).hexdigest()[:10]}"


def configure_compile_cache(min_compile_secs: float = 5.0) -> str:
    """Enable the persistent XLA compile cache with a platform-safe dir:
    CPU runs get the machine-fingerprinted :func:`cpu_cache_dir` (stale
    cross-machine AOT entries risk SIGILL); device runs share
    /tmp/jax_compile_cache. Call after :func:`apply_env_platforms`."""
    import jax

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms.split(",")[0] == "cpu":
        d = cpu_cache_dir()
    else:
        d = "/tmp/jax_compile_cache"
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return d


def apply_env_platforms() -> None:
    """Re-assert ``JAX_PLATFORMS`` from the environment over any value a
    sitecustomize set via ``jax.config.update`` at interpreter startup."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
