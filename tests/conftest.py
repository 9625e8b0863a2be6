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


def pytest_sessionstart(session):
    """Fail the whole run loudly when the native .so does not build.

    Most modules fall back to slow NumPy paths silently, so a compile
    error would otherwise show up only as mysterious slowness while every
    test still passes (it happened: a mid-file symbol-order bug cost an
    entire perf investigation).  GPTPU_NATIVE_OPTIONAL=1 restores the
    lenient behavior for environments without a toolchain.
    """
    if os.environ.get("GPTPU_NATIVE_OPTIONAL"):
        return
    from goldpolish_tpu import native

    try:
        native.lib()
    except native.NativeUnavailable as e:
        raise RuntimeError(f"native build failed (broken commit?): {e}") from e


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (> ~2s); `-m 'not slow'` is the fast "
        "tier (< 60s) for mid-iteration runs",
    )
