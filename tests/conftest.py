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
# PALLAS_AXON_REMOTE_COMPILE in particular routes every XLA compile through a
# remote RPC (~75s of wall per compile) — scrub all axon plumbing.
os.environ["JAX_PLATFORMS"] = "cpu"
for _var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
             "AXON_LOOPBACK_RELAY", "PALLAS_AXON_TPU_GEN",
             "AXON_POOL_SVC_OVERRIDE"):
    os.environ.pop(_var, None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize imports jax at interpreter start (axon plugin registration),
# so env-var changes above don't reach already-latched config values —
# update them on the live config object as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite compiles hundreds of distinct XLA:CPU programs; keeping every
    jitted executable alive for the whole run eventually segfaults the
    compiler on this toolchain (deterministically, deep into the run, inside
    backend_compile_and_load — standalone the same tests pass). Bounding the
    live-executable count per module avoids the threshold; cross-module
    fixtures only pay a recompile."""
    yield
    import jax
    jax.clear_caches()
