"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; all sharding/pjit tests run
against XLA's host-platform device emulation (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the env var alone is not enough when a TPU platform plugin (e.g. 'axon')
# pre-set JAX_PLATFORMS in the parent environment — force it via config too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {devs}"
    return devs
