"""Order-preserving int64 key mapping, incl. the TPU-safe arithmetic
f64 path (TPU's X64 rewriter cannot lower bitcasts FROM f64; the
arithmetic IEEE-bit reconstruction must agree with the bitcast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdk_tpu.exec import groupby as gb


@pytest.fixture()
def doubles(rng):
    exps = rng.integers(-1000, 1023, 5000)
    vals = rng.random(5000) * np.exp2(exps.clip(-700, 700))
    vals = vals * np.where(rng.random(5000) < 0.5, -1.0, 1.0)
    special = np.array([0.0, -0.0, np.inf, -np.inf, np.nan,
                        2.2250738585072014e-308,  # min normal
                        1.7976931348623157e308, 1.0, -1.0, 2.0, 0.5,
                        np.nextafter(1.0, 2.0), np.nextafter(2.0, 1.0)])
    return np.concatenate([vals, special])


def test_f64_ieee_bits_exact(doubles):
    x = doubles
    got = np.asarray(jax.jit(gb._f64_ieee_bits)(jnp.asarray(x, jnp.float64)))
    want = np.abs(x).view(np.int64) & 0x7FFFFFFFFFFFFFFF
    want = np.where(np.isnan(x), 0x7FF8000000000000, want)
    want = np.where(x == 0, 0, want)
    np.testing.assert_array_equal(got, want)


def test_arith_and_bitcast_paths_agree(doubles):
    xj = jnp.asarray(doubles, jnp.float64)
    saved = gb._F64_BITCAST_OK
    try:
        gb._F64_BITCAST_OK = False
        o_arith = np.asarray(jax.jit(gb._orderable_int64)(xj))
        gb._F64_BITCAST_OK = True
        o_bc = np.asarray(jax.jit(gb._orderable_int64)(xj))
    finally:
        gb._F64_BITCAST_OK = saved
    np.testing.assert_array_equal(o_arith, o_bc)


def test_orderable_monotone(doubles):
    x = doubles[~np.isnan(doubles)]
    saved = gb._F64_BITCAST_OK
    try:
        gb._F64_BITCAST_OK = False
        o = np.asarray(jax.jit(gb._orderable_int64)(
            jnp.asarray(x, jnp.float64)))
    finally:
        gb._F64_BITCAST_OK = saved
    idx = np.argsort(x, kind="stable")
    assert (np.diff(o[idx]) >= 0).all()
    # strictly increasing between distinct values (injective), except the
    # 0.0/-0.0 pair which deliberately compares equal
    xs = x[idx]
    distinct = xs[1:] != xs[:-1]
    assert (np.diff(o[idx])[distinct] > 0).all()


def test_f32_path_native_bitcast(rng):
    x = (rng.normal(size=2000) * np.exp2(
        rng.integers(-120, 120, 2000))).astype(np.float32)
    x[:4] = [np.float32(0.0), np.float32(-0.0), np.inf, -np.inf]
    o = np.asarray(jax.jit(gb._orderable_int64)(jnp.asarray(x)))
    idx = np.argsort(x, kind="stable")
    assert (np.diff(o[idx]) >= 0).all()
    assert o[0] == o[1]  # +/-0.0 equal
