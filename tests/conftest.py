"""Test configuration: force JAX onto CPU with 8 virtual devices.

The test pyramid runs platform-independent (the codec's integer paths are backend-exact and the
fp32 elementwise paths are IEEE on both CPU and TPU); sharding tests use the 8-device virtual
mesh. Real-TPU validation happens in bench.py / the driver's compile checks.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of pytest rootdir configuration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
