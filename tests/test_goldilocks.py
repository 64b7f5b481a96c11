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


def test_numpy_backend_matches_jax():
    """The backend-polymorphic ops (quick-check fast path) must agree with
    the jax path bit-for-bit on every op the quick checker uses."""
    rng = np.random.default_rng(10)
    a_np = rng.integers(0, P, (33,), dtype=np.uint64)
    b_np = rng.integers(0, P, (33,), dtype=np.uint64)
    a_j, b_j = jnp.asarray(a_np), jnp.asarray(b_np)
    with np.errstate(over="ignore"):
        for op in (gl.add, gl.sub, gl.mul):
            got = op(a_np, b_np)
            assert isinstance(got, np.ndarray)
            assert np.all(got == np.asarray(op(a_j, b_j))), op.__name__
        assert np.all(gl.neg(a_np) == np.asarray(gl.neg(a_j)))
        assert np.all(gl.inv(a_np) == np.asarray(gl.inv(a_j)))
        assert int(gl.modsum(a_np)) == int(gl.modsum(a_j))
        assert np.all(gl.batch_inverse(a_np) == np.asarray(gl.batch_inverse(a_j)))
        assert np.all(gl.scan_mul(a_np) ==
                      np.asarray(gl.scan_mul(jnp.asarray(a_np))))
        assert np.all(gl.scan_mul(a_np, reverse=True) ==
                      np.asarray(gl.scan_mul(jnp.asarray(a_np), reverse=True)))
        a3_np = rng.integers(1, P, (9, 3), dtype=np.uint64)
        b3_np = rng.integers(0, P, (9, 3), dtype=np.uint64)
        a3_j, b3_j = jnp.asarray(a3_np), jnp.asarray(b3_np)
        assert np.all(gl3.mul(a3_np, b3_np) == np.asarray(gl3.mul(a3_j, b3_j)))
        assert np.all(gl3.inv(a3_np) == np.asarray(gl3.inv(a3_j)))
        assert np.all(gl3.batch_inverse(a3_np)
                      == np.asarray(gl3.batch_inverse(a3_j)))
        assert np.all(gl3.from_base(a_np) == np.asarray(gl3.from_base(a_j)))
        s_np = rng.integers(0, P, (9,), dtype=np.uint64)
        assert np.all(gl3.mul_base(a3_np, s_np)
                      == np.asarray(gl3.mul_base(a3_j, jnp.asarray(s_np))))


def test_numpy_h1h2_and_z_match_jax():
    from zkevm_prover_tpu.stark.prover import calculate_h1h2, calculate_z

    rng = np.random.default_rng(11)
    n, d = 32, 2
    t_np = rng.integers(0, 50, (n, d)).astype(np.uint64)
    f_np = t_np[rng.integers(0, n, n)]  # every f row appears in t
    h1n, h2n, okn = calculate_h1h2(f_np, t_np)
    h1j, h2j, okj = calculate_h1h2(jnp.asarray(f_np), jnp.asarray(t_np))
    assert bool(okn) and bool(okj)
    assert np.all(h1n == np.asarray(h1j)) and np.all(h2n == np.asarray(h2j))
    with np.errstate(over="ignore"):
        num = rng.integers(1, P, (n,), dtype=np.uint64)
        den = rng.integers(1, P, (n,), dtype=np.uint64)
        zn = calculate_z(num, den)
        zj = calculate_z(jnp.asarray(num), jnp.asarray(den))
        assert isinstance(zn, np.ndarray)
        assert np.all(zn == np.asarray(zj))
