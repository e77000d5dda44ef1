"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
virtual host-platform mesh (same XLA collectives, same program).

Environments that pre-register a TPU PJRT plugin at interpreter start (via
sitecustomize, gated on PALLAS_AXON_POOL_IPS) ignore JAX_PLATFORMS=cpu set
this late — the plugin's hooks canonicalize the platform back to the TPU.
When that hijack is detected, re-exec the whole pytest process once with
the plugin disabled so the suite genuinely runs on 8 CPU devices.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_JVTPU_CPU_MESH_REEXEC") != "1"
):
    env = os.environ.copy()
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize guard -> no TPU plugin
    env["_JVTPU_CPU_MESH_REEXEC"] = "1"
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compile cache: CPU compiles of the jitted search/build programs
# take 5-15s each; cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
