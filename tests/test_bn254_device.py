"""Device BN254 — Montgomery limb field ops + Pippenger MSM vs the exact
host implementation (ops/bn254.py).

Reference surface: src/ffiasm/fq.cpp (Montgomery field) and
src/ffiasm/multiexp.c.hpp:37-115 (ParallelMultiexp bucket method).
"""

import numpy as np
import pytest

from zkevm_prover_tpu.ops import bn254 as host
from zkevm_prover_tpu.ops import bn254_device as dev

P = host.P
rng = np.random.default_rng(42)


def _rand_fq(n):
    return [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]


def test_field_add_sub_mul_roundtrip():
    import jax.numpy as jnp

    a_int = _rand_fq(16)
    b_int = _rand_fq(16)
    a = jnp.asarray(np.stack([dev.limbs_np(x) for x in a_int]))
    b = jnp.asarray(np.stack([dev.limbs_np(x) for x in b_int]))
    s = np.asarray(dev.fp_add(a, b))
    d = np.asarray(dev.fp_sub(a, b))
    for i in range(16):
        assert dev.to_int(s[i]) == (a_int[i] + b_int[i]) % P
        assert dev.to_int(d[i]) == (a_int[i] - b_int[i]) % P

    am = dev.to_mont(a)
    bm = dev.to_mont(b)
    pm = np.asarray(dev.from_mont(dev.fp_mul(am, bm)))
    for i in range(16):
        assert dev.to_int(pm[i]) == a_int[i] * b_int[i] % P


def _rand_points(n):
    g = host.G1_GEN
    pts, k = [], 7
    for _ in range(n):
        pts.append(host.g1_mul(g, k))
        k = (k * k + 3) % host.R
    return pts


def test_g1_msm_matches_host():
    n = 33
    pts = _rand_points(n)
    scalars = [int.from_bytes(rng.bytes(32), "little") % host.R
               for _ in range(n)]
    got = dev.g1_msm_device(pts, scalars)
    want = host.g1_msm(pts, scalars)
    assert got == want


def test_g1_msm_edge_cases():
    g = host.G1_GEN
    # zero scalars only
    assert dev.g1_msm_device([g, g], [0, 0]) is host.INF
    # single point
    assert dev.g1_msm_device([g], [5]) == host.g1_mul(g, 5)
    # cancellation: k*G + (r-k)*G = INF
    k = 12345
    assert dev.g1_msm_device([g, g], [k, host.R - k]) is host.INF


def test_g2_msm_matches_host():
    n = 9
    g2 = host.G2_GEN
    pts, k = [], 11
    for _ in range(n):
        pts.append(host.g2_mul(g2, k))
        k = (k * 3 + 1) % host.R
    scalars = [int.from_bytes(rng.bytes(32), "little") % host.R
               for _ in range(n)]
    got = dev.g2_msm_device(pts, scalars)
    want = host.g2_msm(pts, scalars)
    assert got == want
