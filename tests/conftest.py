"""Test harness setup: force an 8-device CPU mesh before JAX is imported.

Real multi-chip hardware is not available in CI; all sharding paths are
validated on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel, which must never be used from unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
# Every XLA compile round-trips through the axon relay (~0.4s each) even on
# CPU; the persistent cache makes reruns cheap.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
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
