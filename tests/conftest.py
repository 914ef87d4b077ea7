"""Test configuration: force JAX onto CPU with 8 virtual devices.

The environment's axon sitecustomize pre-imports JAX and pins JAX_PLATFORMS=axon (the real TPU
tunnel), so plain env vars are not enough: we must update jax.config before the backend is
initialized. The test pyramid runs platform-independent (the codec's integer paths are
backend-exact and the fp32 elementwise paths are IEEE on both CPU and TPU); sharding tests use
the 8-device virtual mesh. Real-TPU validation happens in bench.py and tools/validate_tpu.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of pytest rootdir configuration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
