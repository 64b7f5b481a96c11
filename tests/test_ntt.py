"""NTT/INTT/extendPol tests vs the pure-Python model and algebraic identities."""

import numpy as np
import jax.numpy as jnp

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.ops import ntt
from zkevm_prover_tpu.ops import refmodel as rm

P = gl.P


def _rand_col(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, n, dtype=np.uint64)


def test_small_ntt_vs_model():
    for n_bits in [1, 2, 3, 6, 9]:
        n = 1 << n_bits
        x = _rand_col(n, n_bits)
        got = gl.to_int_list(ntt.ntt(jnp.asarray(x)))
        want = rm.ntt([int(v) for v in x], gl.w(n_bits))
        assert got == want, f"n_bits={n_bits}"


def test_four_step_matches_small_path():
    # force the four-step path (> _SMALL_BITS) against the direct model
    n_bits = 13
    n = 1 << n_bits
    x = _rand_col(n, 42)
    got = gl.to_int_list(ntt.ntt(jnp.asarray(x)))
    want = rm.ntt([int(v) for v in x], gl.w(n_bits))
    assert got == want


def test_intt_roundtrip_multicolumn():
    n_bits = 12
    n = 1 << n_bits
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, P, (n, 5), dtype=np.uint64))
    back = ntt.intt(ntt.ntt(x))
    assert np.all(np.asarray(back) == np.asarray(x))


def test_ntt_evaluates_polynomial():
    # NTT(coefs)[j] == P(w^j)
    n_bits = 5
    n = 1 << n_bits
    coefs = _rand_col(n, 4)
    evals = gl.to_int_list(ntt.ntt(jnp.asarray(coefs)))
    w = gl.w(n_bits)
    for j in [0, 1, 7, n - 1]:
        x = pow(w, j, P)
        want = 0
        for c in reversed([int(v) for v in coefs]):
            want = (want * x + int(c)) % P
        assert evals[j] == want


def test_extend_pol_agrees_on_coset():
    # LDE output j equals P(shift * w_ext^j) where P interpolates the evals
    n_bits, n_bits_ext = 4, 6
    n = 1 << n_bits
    evals = _rand_col(n, 5)
    lde = gl.to_int_list(ntt.extend_pol(jnp.asarray(evals), n_bits, n_bits_ext))
    coefs = rm.intt([int(v) for v in evals], gl.w(n_bits))
    w_ext = gl.w(n_bits_ext)
    for j in [0, 1, 13, 63]:
        x = gl.shift() * pow(w_ext, j, P) % P
        want = 0
        for c in reversed(coefs):
            want = (want * x + c) % P
        assert lde[j] == want


def test_extend_pol_prefix_consistency():
    # rows j*blowup of the extension reproduce the original evals? No —
    # the coset is disjoint from the trace domain. Instead check linearity.
    n_bits, n_bits_ext = 5, 7
    n = 1 << n_bits
    a = jnp.asarray(_rand_col(n, 6))
    b = jnp.asarray(_rand_col(n, 7))
    lhs = ntt.extend_pol(gl.add(a, b), n_bits, n_bits_ext)
    rhs = gl.add(
        ntt.extend_pol(a, n_bits, n_bits_ext), ntt.extend_pol(b, n_bits, n_bits_ext)
    )
    assert np.all(np.asarray(lhs) == np.asarray(rhs))
