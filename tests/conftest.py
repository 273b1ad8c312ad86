"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
exercised without TPU hardware (the TPU answer to "multi-node CI").
These env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DATA = Path(os.environ.get("DEEPRANK2_TPU_TEST_DATA", "/root/reference/tests/data"))


@pytest.fixture(scope="session")
def data_path() -> Path:
    if not REFERENCE_DATA.exists():
        pytest.skip(f"test data not found at {REFERENCE_DATA} (set DEEPRANK2_TPU_TEST_DATA)")
    return REFERENCE_DATA
