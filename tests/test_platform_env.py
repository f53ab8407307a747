"""apply_env_platforms: the JAX_PLATFORMS env var must beat a
sitecustomize-installed jax.config override (the CLI tools' pin-to-CPU
path used by every subprocess test)."""

import os

import jax

from vps_tpu.utils.platform import apply_env_platforms


def test_env_var_beats_config_update(monkeypatch):
    orig = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "cpu,cpu")  # stand-in "wrong" value
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        apply_env_platforms()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", orig)


def test_noop_without_env(monkeypatch):
    orig = jax.config.jax_platforms
    try:
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        jax.config.update("jax_platforms", "cpu")
        apply_env_platforms()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", orig)
