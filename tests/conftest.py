"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding/collective tests use
``xla_force_host_platform_device_count`` (the standard JAX CPU-simulation
path).

Note: this environment ships a sitecustomize (PYTHONPATH=/root/.axon_site)
that force-selects the remote-TPU 'axon' platform regardless of
JAX_PLATFORMS, so we must override via the config API after import.
Set TFKALDI_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("TFKALDI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
