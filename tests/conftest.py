"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding/collective tests use
``xla_force_host_platform_device_count`` (the standard JAX CPU-simulation
path). This must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
