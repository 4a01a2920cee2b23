"""Test configuration: force an 8-fake-device CPU platform.

Multi-chip sharding (pjit/shard_map over a Mesh) is tested without TPU
pods via XLA's host-platform device-count override — the standard JAX
trick (SURVEY.md §4).

On TPU images a sitecustomize registers a remote-TPU backend at
interpreter start and *overrides* ``jax_platforms`` via jax.config (env
vars are not enough). Backends are not initialized yet when this conftest
loads, so pointing the config back at CPU here wins — as long as no
fixture touched jax.devices() earlier.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

CONFIG_DIR = REPO / "etol_tpu" / "configs"


@pytest.fixture(scope="session")
def mip_xml() -> str:
    return str(CONFIG_DIR / "mip_2d_ex1.xml")


@pytest.fixture(scope="session")
def ocp_xml() -> str:
    return str(CONFIG_DIR / "ocp_2d_ex1.xml")
