"""Pallas group-by kernel (interpret mode on CPU; compiled path
validated on TPU — see ops/pallas_groupby.py)."""

import numpy as np
import pytest

import hdk_tpu  # noqa: F401
import jax.numpy as jnp

from hdk_tpu.ops.pallas_groupby import groupby_sums, supported


def test_onehot_matmul_groupby_interpret(rng):
    n, e = 4096, 50
    gid = rng.integers(0, e, n).astype(np.int32)
    gid[::11] = e + 3  # dead rows discard
    vals = rng.normal(size=(n, 2)).astype(np.float32)
    out = np.asarray(groupby_sums(jnp.asarray(gid), jnp.asarray(vals), e,
                                  interpret=True))
    exp = np.zeros((e, 2), np.float32)
    for g in range(e):
        exp[g] = vals[gid == g].sum(0)
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-3)


def test_supported_bounds():
    assert supported(1024, 3, 1_000_000)
    assert not supported(1 << 20, 3, 1_000_000)  # VMEM infeasible
