"""Cubic extension field F_p^3 = F_p[x]/(x^3 - x - 1) over Goldilocks.

TPU-native replacement for the reference's `Goldilocks3` (absent submodule;
API reconstructed from call sites, e.g. src/starkpil/starks.cpp:277,
src/starkpil/polinomial.hpp:722). Elements are uint64 arrays whose LAST axis
has size 3 (coefficients [c0, c1, c2] of c0 + c1·x + c2·x^2).

The reduction polynomial x^3 = x + 1 matches the pil-stark stack (verified
against the f3g multiplication identity used throughout the reference's
generated constraint code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl

FIELD_EXTENSION = 3


def zero(shape=(), np_backend: bool = False):
    if np_backend:
        return np.zeros((*shape, 3), dtype=np.uint64)
    return jnp.zeros((*shape, 3), dtype=jnp.uint64)


def one(shape=(), np_backend: bool = False):
    if np_backend:
        z = np.zeros((*shape, 3), dtype=np.uint64)
        z[..., 0] = 1
        return z
    z = jnp.zeros((*shape, 3), dtype=jnp.uint64)
    return z.at[..., 0].set(jnp.uint64(1))


def from_base(a):
    """Embed base-field array (shape s) into F_p^3 (shape s + (3,))."""
    if not isinstance(a, jax.Array):
        z = np.zeros((*a.shape, 3), dtype=np.uint64)
        z[..., 0] = a
        return z
    z = jnp.zeros((*a.shape, 3), dtype=jnp.uint64)
    return z.at[..., 0].set(a)


def add(a, b):
    return gl.add(a, b)


def sub(a, b):
    return gl.sub(a, b)


def neg(a):
    return gl.neg(a)


def mul(a, b):
    """Karatsuba-style 6-mul product with reduction by x^3 = x + 1."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    A = gl.mul(gl.add(a0, a1), gl.add(b0, b1))
    B = gl.mul(gl.add(a0, a2), gl.add(b0, b2))
    C = gl.mul(gl.add(a1, a2), gl.add(b1, b2))
    D = gl.mul(a0, b0)
    E = gl.mul(a1, b1)
    F = gl.mul(a2, b2)
    G = gl.sub(D, E)
    r0 = gl.sub(gl.add(C, G), F)
    r1 = gl.sub(gl.sub(gl.add(A, C), gl.add(E, E)), D)
    r2 = gl.sub(B, G)
    return gl._ns(a, b).stack([r0, r1, r2], axis=-1)


def mul_base(a, s):
    """F_p^3 element times base-field scalar/array (broadcast over last axis)."""
    xp = gl._ns(a, s)
    s = xp.asarray(s, dtype=np.uint64)
    return gl.mul(a, s[..., None])


def square(a):
    return mul(a, a)


def inv(a):
    """Inverse via the adjugate of the multiplication-by-a matrix.

    mul-by-a in basis {1, x, x^2} is M = [[a0, a2, a1],
                                          [a1, a0+a2, a1+a2],
                                          [a2, a1, a0+a2]];
    inv(a) = M^{-1} · (1,0,0)^T = adj(M)[:,0] / det(M). Costs ~15 base muls
    plus one base inversion (vs a p^3-2 power ladder).
    """
    if isinstance(a, jax.Array):
        # Materialize the operand: XLA:CPU fusing a computed upstream value
        # into the adjugate+Fermat graph yields a fusion whose evaluation is
        # catastrophically slow (hours at 512 elements — the round-4
        # multichip-dryrun timeout). See gl.inv for the same guard.
        a = jax.lax.optimization_barrier(a)
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    m11 = gl.add(a0, a2)
    m12 = gl.add(a1, a2)
    # det = a0*(m11*m11 - a1*m12) - a2*(a1*m11 - a1*a2... ) expand by 1st column
    # cof00 = m11*m11 - m12*a1
    cof00 = gl.sub(gl.mul(m11, m11), gl.mul(m12, a1))
    # cof10 = -(a1*m11 - m12*a2)
    cof10 = gl.neg(gl.sub(gl.mul(a1, m11), gl.mul(m12, a2)))
    # cof20 = a1*a1 - m11*a2
    cof20 = gl.sub(gl.mul(a1, a1), gl.mul(m11, a2))
    det = gl.add(
        gl.add(gl.mul(a0, cof00), gl.mul(a2, cof10)),
        gl.mul(a1, cof20),
    )
    det_inv = gl.inv(det)
    return gl._ns(a).stack(
        [gl.mul(cof00, det_inv), gl.mul(cof10, det_inv), gl.mul(cof20, det_inv)],
        axis=-1,
    )


def batch_inverse(a, axis: int = 0):
    """Montgomery batch inversion of F_p^3 elements along `axis`.

    Mirrors Polinomial::batchInverseParallel (src/starkpil/polinomial.hpp:635)
    as two associative scans + one field inversion.
    """
    xp = gl._ns(a)
    n = a.shape[axis]
    fwd = gl.scan_mul(a, axis=axis, op=mul)
    rev = gl.scan_mul(a, axis=axis, reverse=True, op=mul)

    def _slice(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(lo, hi)
        return arr[tuple(sl)]

    total_inv = inv(_slice(fwd, n - 1, n))
    ones = one(_slice(a, 0, 1).shape[:-1], np_backend=xp is np)
    pre = xp.concatenate([ones, _slice(fwd, 0, n - 1)], axis=axis)
    suf = xp.concatenate([_slice(rev, 1, n), ones], axis=axis)
    return mul(mul(pre, suf), total_inv)


def pow_const(a, e: int):
    e = int(e)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    if result is None:
        return one(a.shape[:-1])
    return result
