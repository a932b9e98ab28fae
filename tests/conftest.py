"""Test harness setup: pure-CPU JAX with a virtual 8-device mesh.

Two environment fixes, both of which must happen before JAX initializes:

1. The ambient environment pins ``JAX_PLATFORMS=axon`` (the real-TPU tunnel)
   and injects an ``axon`` sitecustomize via PYTHONPATH that routes *every*
   XLA compilation — even for the CPU backend — through a loopback relay at
   ~0.4-1.4s/compile.  The sitecustomize runs at interpreter startup, before
   conftest, so the only clean escape is to re-run pytest once in a child
   process with a sanitized environment.  The relaunch happens from
   ``pytest_cmdline_main`` (not conftest import time) so the child's output
   reaches the terminal instead of pytest's already-started FD capture.
2. Multi-chip hardware is unavailable in CI; all sharding paths run on a
   virtual 8-device CPU mesh (the driver separately dry-runs the multi-chip
   path via ``__graft_entry__.dryrun_multichip``).
"""

import os
import pathlib
import sys

_SENTINEL = "KMLDPC_TESTS_SANITIZED"
_SANITIZED = os.environ.get(_SENTINEL) == "1" or "axon" not in os.environ.get(
    "PYTHONPATH", ""
)

if _SANITIZED:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()


def pytest_cmdline_main(config):
    if _SANITIZED:
        return None  # proceed normally
    import subprocess

    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p
    )
    if "xla_force_host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
    return subprocess.call(
        [sys.executable, "-m", "pytest", *config.invocation_params.args], env=env
    )


import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
ASSETS = REPO / "assets"


@pytest.fixture(scope="session")
def assets() -> pathlib.Path:
    return ASSETS
