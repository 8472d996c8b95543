"""Test fixtures.

Analog of the reference's ArrowSQLRunner (Tests/ArrowSQLRunner/
ArrowSQLRunner.h:53-84): tests run the full real engine on tiny
in-memory tables; the oracle is pandas (SQLiteComparator analog).

JAX runs on CPU with 8 virtual devices so multi-chip sharding tests can
execute without TPU hardware (SURVEY.md §4.3 implication).
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS to the TPU
# tunnel (a sitecustomize hook re-registers it regardless of the env
# var), which is wrong for unit tests — and orders of magnitude slower
# per op.  Overriding the jax config after import wins over the hook.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def hdk():
    import hdk_tpu

    return hdk_tpu.HDK()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
