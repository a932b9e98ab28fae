"""Test harness setup: force an 8-device CPU mesh before JAX is imported.

Real multi-chip hardware is not available in CI; all sharding paths are
validated on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
ASSETS = REPO / "assets"


@pytest.fixture(scope="session")
def assets() -> pathlib.Path:
    return ASSETS
