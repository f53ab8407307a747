"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY.md §4).

Note: this image boots every interpreter with an axon TPU PJRT plugin via
sitecustomize (which imports jax), so env vars alone are too late —
``jax.config.update`` is the authoritative switch.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vps_tpu.utils.platform import cpu_cache_dir  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite's big graphs (train step, predict,
# video scan) dominate wall-clock; warm reruns cut ~40 min to minutes.
# MACHINE-FINGERPRINTED dir: XLA:CPU AOT entries from a different host's
# CPU features risk wrong code/SIGILL (CLAUDE.md wipe rule, in code).
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
