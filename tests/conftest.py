"""Test configuration.

Forces JAX onto a virtual 8-device CPU backend (the multi-device "fake
backend" the reference never had — SURVEY.md §4) so sharding/collective tests
run without TPU hardware. Must run before jax is imported anywhere.

Also puts /root/reference on sys.path: the PyTorch reference implementation
is the *oracle* for parity tests (imported and executed, never copied).
"""

import os
import sys

# Force the CPU backend: the environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel), which is single-client and must not be grabbed by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
