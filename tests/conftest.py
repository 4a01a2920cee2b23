"""Test configuration: force an 8-fake-device CPU platform.

Multi-chip sharding (pjit/shard_map over a Mesh) is tested without TPU pods
via XLA's host-platform device-count override — the standard JAX trick
(SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f64 available for oracle comparisons in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")

if os.environ.get("JAX_PLATFORMS") != "cpu":
    # On TPU images a sitecustomize may import-and-configure jax at
    # interpreter start, before this conftest can set JAX_PLATFORMS —
    # re-exec pytest with the env fixed so the whole process is CPU +
    # 8 fake devices. Sentinel guards against an exec loop.
    os.environ["JAX_PLATFORMS"] = "cpu"
    if os.environ.get("_ETPU_TEST_REEXEC") != "1":
        os.environ["_ETPU_TEST_REEXEC"] = "1"
        os.execvpe(
            sys.executable,
            [sys.executable, "-m", "pytest"] + sys.argv[1:],
            os.environ,
        )

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

CONFIG_DIR = REPO / "examples" / "configs"


@pytest.fixture(scope="session")
def mip_xml() -> str:
    return str(CONFIG_DIR / "mip_2d_ex1.xml")


@pytest.fixture(scope="session")
def ocp_xml() -> str:
    return str(CONFIG_DIR / "ocp_2d_ex1.xml")
