"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the tunneled "axon" TPU plugin into
every interpreter and env-var platform forcing is ignored, so the switch to
CPU must happen through jax.config before any backend initialization.
Sharding/collective tests then exercise 8 virtual CPU devices; the driver
separately dry-runs the multi-chip path, and TPU hardware runs use bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
