"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
virtual host-platform mesh (same XLA collectives, same program).

Environments that pre-register a TPU PJRT plugin at interpreter start (via
sitecustomize) also set jax.config's jax_platforms at register time, so the
JAX_PLATFORMS env var alone is ignored — override the config directly before
any backend initializes. XLA_FLAGS is read lazily at CPU-client creation, so
setting it here (pre-first-device-use) still takes effect.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compile cache: CPU compiles of the jitted search/build programs
# take 5-15s each; cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) >= 8, (
    f"test harness needs an 8-device CPU mesh, got {jax.devices()}"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    """`slow` marker: reference-scale / torture cells skipped by default on
    the single-core CI host (RUN_SLOW=1 runs everything — the nightly/IT
    tier, like the reference's gradle integTest split)."""
    import pytest

    if os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
