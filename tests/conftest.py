"""Test configuration: force a virtual 8-device CPU mesh before jax import.

Sharding/collective tests run against 8 virtual CPU devices
(xla_force_host_platform_device_count) so multi-chip code paths are exercised
without TPU hardware; the driver separately dry-runs the multi-chip path.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
