"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference system is CUDA-only and untestable off-GPU; this framework is
XLA-portable by design, so the whole test suite runs on CPU with 8 virtual
devices to exercise the multi-chip sharding paths.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform
must be forced through jax.config before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# VOLSURFS_TPU_TESTS=1 keeps the real TPU backend so the on-chip
# regression-replay tier (tests marked `tpu`) can run against the chip;
# everything else runs on the virtual 8-device CPU mesh.
if os.environ.get("VOLSURFS_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
    config.addinivalue_line(
        "markers",
        "tpu: on-chip regression replay (needs VOLSURFS_TPU_TESTS=1 and a "
        "real TPU; skips cleanly on CPU)",
    )
