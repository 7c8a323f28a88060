"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding/collective tests use
``xla_force_host_platform_device_count`` (the standard JAX CPU-simulation
path). This must run before jax is imported anywhere.
"""

import os
import sys

# force CPU even when the session environment pins a TPU platform (axon);
# set TFKALDI_TEST_TPU=1 to run the suite on the real chip instead
if not os.environ.get("TFKALDI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
