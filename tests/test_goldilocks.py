"""Property tests: JAX Goldilocks/GL3 ops vs the pure-Python model."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.ops import gl3
from zkevm_prover_tpu.ops import refmodel as rm

P = gl.P

# adversarial values around the reduction edge cases
EDGE = [0, 1, 2, 0xFFFFFFFF, 0x100000000, P - 1, P - 2, P - 0xFFFFFFFF,
        (1 << 63), (1 << 63) + 12345, P - (1 << 32), 7, 49]


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 1 << 32, n, dtype=np.uint64) << np.uint64(32)) | rng.integers(
        0, 1 << 32, n, dtype=np.uint64
    )


def _pairs():
    a = np.array(EDGE + list(_rand(512, 1) % P), dtype=np.uint64)
    b = np.array(list(reversed(EDGE)) + list(_rand(512, 2) % P), dtype=np.uint64)
    return jnp.asarray(a), jnp.asarray(b)


def test_add_sub_mul_vs_model():
    a, b = _pairs()
    an, bn = np.asarray(a), np.asarray(b)
    want_add = [rm.add(int(x), int(y)) for x, y in zip(an, bn)]
    want_sub = [rm.sub(int(x), int(y)) for x, y in zip(an, bn)]
    want_mul = [rm.mul(int(x), int(y)) for x, y in zip(an, bn)]
    assert gl.to_int_list(gl.add(a, b)) == want_add
    assert gl.to_int_list(gl.sub(a, b)) == want_sub
    assert gl.to_int_list(gl.mul(a, b)) == want_mul


def test_neg_inv():
    a, _ = _pairs()
    an = np.asarray(a)
    assert gl.to_int_list(gl.neg(a)) == [(-int(x)) % P if x else 0 for x in an]
    got_inv = gl.to_int_list(gl.inv(a))
    assert got_inv == [rm.inv(int(x)) for x in an]


def test_batch_inverse():
    a = jnp.asarray(_rand(257, 3) % np.uint64(P - 1) + np.uint64(1))
    got = gl.batch_inverse(a)
    assert gl.to_int_list(gl.mul(a, got)) == [1] * 257


def test_pow_const():
    a = jnp.asarray(_rand(64, 4) % P)
    for e in [0, 1, 2, 7, P - 2, 12345678901234567]:
        got = gl.to_int_list(gl.pow_const(a, e))
        want = [pow(int(x), e, P) for x in np.asarray(a)]
        assert got == want


def test_w_tower_and_shift():
    for k in range(1, 33):
        assert pow(gl.w(k), 1 << k, P) == 1
        assert pow(gl.w(k), 1 << (k - 1), P) != 1
        assert gl.w(k - 1) == gl.w(k) * gl.w(k) % P
    assert pow(gl.shift(), 1 << 32, P) != 1
    assert gl.shift() * gl.shift_inv() % P == 1


def test_gl3_mul_vs_model():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, P, (33, 3), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, P, (33, 3), dtype=np.uint64))
    got = np.asarray(gl3.mul(a, b))
    for i in range(33):
        want = rm.mul3(tuple(int(v) for v in np.asarray(a)[i]), tuple(int(v) for v in np.asarray(b)[i]))
        assert tuple(int(v) for v in got[i]) == want


def test_gl3_inv_and_batch():
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.integers(1, P, (17, 3), dtype=np.uint64))
    prod = gl3.mul(a, gl3.inv(a))
    assert np.all(np.asarray(prod) == np.asarray(gl3.one((17,))))
    binv = gl3.batch_inverse(a, axis=0)
    prod2 = gl3.mul(a, binv)
    assert np.all(np.asarray(prod2) == np.asarray(gl3.one((17,))))


def test_gl3_mul_base_embedding():
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.integers(0, P, (5, 3), dtype=np.uint64))
    s = jnp.asarray(rng.integers(0, P, (5,), dtype=np.uint64))
    got = gl3.mul(a, gl3.from_base(s))
    assert np.all(np.asarray(got) == np.asarray(gl3.mul_base(a, s)))
