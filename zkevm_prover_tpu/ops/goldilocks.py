"""Goldilocks base field (p = 2^64 - 2^32 + 1) arithmetic on JAX arrays.

TPU-native replacement for the reference's `Goldilocks` class (submodule
`src/goldilocks/src/goldilocks_base_field.hpp`, used from e.g.
`src/starkpil/starks.cpp`, `src/starkpil/fri/friProve.cpp:12-13`): instead of
scalar/AVX2/AVX512 paths we expose vectorized ops over `uint64` jnp arrays.
XLA lowers uint64 to u32-pair arithmetic on TPU; the algorithms below only use
wrapping u64 add/sub/mul-lo, shifts, masks and compares so they are exact on
every backend. Hot kernels (NTT butterflies, Poseidon) additionally have
hand-written Pallas u32-pair implementations in `*_pallas.py`.

Elements are canonical uint64 values in [0, p). All functions are shape-
polymorphic and jit-friendly (no Python branches on traced values).

Field constants follow the pil-stark conventions of the reference stack:
multiplicative-subgroup generator tower W[k] (primitive 2^k-th roots of
unity, W[32] = 7277203076849721926) and coset shift 49 (`Goldilocks::w(nBits)`
/ `Goldilocks::shift()` call sites: src/starkpil/zhInv.cpp:14-28,
src/starkpil/fri/friProve.cpp:12-13,36). The goldilocks submodule is absent
from the reference snapshot, so these two constants are configurable via
`set_field_params` should a different tower generator be required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 0xFFFFFFFF_00000001  # 2^64 - 2^32 + 1
P_U64 = np.uint64(P)
M32 = np.uint64(0xFFFFFFFF)
EPSILON = np.uint64(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1

# Primitive 2^32-th root of unity of the pil-stark/goldilocks stack and the
# LDE coset shift. Both have been cross-checked for algebraic validity:
# W32 has exact multiplicative order 2^32; 49 is outside the 2-adic subgroup.
_DEFAULT_W32 = 7277203076849721926
_DEFAULT_SHIFT = 49

_params = {"w32": _DEFAULT_W32, "shift": _DEFAULT_SHIFT}


def set_field_params(w32: int | None = None, shift: int | None = None) -> None:
    """Override the root-of-unity tower generator / coset shift (host ints)."""
    if w32 is not None:
        if pow(w32, 1 << 32, P) != 1 or pow(w32, 1 << 31, P) == 1:
            raise ValueError("w32 must have multiplicative order exactly 2^32")
        _params["w32"] = w32
        _w_tower.cache_clear()
    if shift is not None:
        if pow(shift, 1 << 32, P) == 1:
            raise ValueError("shift must not lie in the 2-adic subgroup")
        _params["shift"] = shift


@functools.lru_cache(maxsize=None)
def _w_tower() -> tuple[int, ...]:
    w = [1] * 33
    w[32] = _params["w32"]
    for k in range(31, -1, -1):
        w[k] = (w[k + 1] * w[k + 1]) % P
    return tuple(w)


def w(n_bits: int) -> int:
    """Primitive 2^n_bits-th root of unity (host int). Mirrors Goldilocks::w."""
    return _w_tower()[n_bits]


def shift() -> int:
    """LDE coset shift (host int). Mirrors Goldilocks::shift()."""
    return _params["shift"]


def shift_inv() -> int:
    return pow(_params["shift"], P - 2, P)


# ---------------------------------------------------------------------------
# Core vectorized ops (uint64 in, uint64 out, canonical [0, p))
#
# Every op is BACKEND-POLYMORPHIC: with jax arrays (or tracers) it runs on
# jnp as before; with pure numpy inputs it stays in numpy. The numpy path
# exists for the prover's quick satisfiability checks — eager jnp dispatch
# is ~1000x slower than numpy on small arrays, and the quick checker's whole
# point is to avoid XLA compiles (stark/prover.py check_constraints).
# ---------------------------------------------------------------------------


def _ns(*vals):
    """jnp if any input is a jax array/tracer, else numpy."""
    for v in vals:
        if isinstance(v, jax.Array):
            return jnp
    return np


def asgl(x) -> jax.Array:
    """Convert ints / numpy / jax arrays to canonical uint64 field elements."""
    if isinstance(x, (int, np.integer)):
        return jnp.uint64(int(x) % P)
    a = jnp.asarray(x)
    if a.dtype != jnp.uint64:
        a = a.astype(jnp.uint64)
    return a


def add(a, b):
    xp = _ns(a, b)
    s = a + b
    # carry out of u64, or landed in [p, 2^64): subtract p (== add 2^32-1 mod 2^64)
    adj = (s < a) | (s >= P_U64)
    return s + xp.where(adj, EPSILON, np.uint64(0))


def sub(a, b):
    xp = _ns(a, b)
    d = a - b
    borrow = a < b
    return d - xp.where(borrow, EPSILON, np.uint64(0))


def neg(a):
    return _ns(a).where(a == 0, np.uint64(0), P_U64 - a)


def _mul128(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) uint64 pair."""
    a_lo = a & M32
    a_hi = a >> np.uint64(32)
    b_lo = b & M32
    b_hi = b >> np.uint64(32)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + (ll >> np.uint64(32))          # <= 2^64 - 2^32, no overflow
    mid2 = hl + (mid & M32)                   # no overflow
    hi = hh + (mid >> np.uint64(32)) + (mid2 >> np.uint64(32))
    lo = (mid2 << np.uint64(32)) | (ll & M32)
    return hi, lo


def _reduce128(hi, lo):
    """Reduce a 128-bit value mod p using 2^64 = 2^32 - 1, 2^96 = -1 (mod p)."""
    xp = _ns(hi, lo)
    hi_hi = hi >> np.uint64(32)
    hi_lo = hi & M32
    t0 = lo - hi_hi
    t0 = t0 - xp.where(lo < hi_hi, EPSILON, np.uint64(0))
    t1 = hi_lo * M32
    t2 = t0 + t1
    t2 = t2 + xp.where(t2 < t1, EPSILON, np.uint64(0))
    return xp.where(t2 >= P_U64, t2 - P_U64, t2)


def mul(a, b):
    hi, lo = _mul128(a, b)
    return _reduce128(hi, lo)


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
    """a ** e for a host-known integer exponent (square-and-multiply)."""
    e = int(e)
    if e == 0:
        return _ns(a).full_like(a, np.uint64(1))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inv(a):
    """Field inverse via Fermat (a^(p-2)); inv(0) = 0 by convention.

    The input rides through an optimization barrier on the jax backend:
    XLA:CPU fusing an upstream computed value into this ~120-multiply
    square-and-multiply chain produces a fusion whose evaluation is
    catastrophically slow (hours for a 512-element input — the round-4
    multichip-dryrun timeout and test-suite blowup). Materializing the
    operand first keeps the chain a plain CSE'd loop on every backend.
    """
    if isinstance(a, jax.Array):
        a = jax.lax.optimization_barrier(a)
    return pow_const(a, P - 2)


def scan_mul(a, axis: int = 0, reverse: bool = False, op=None):
    """Inclusive prefix product along `axis` (log-depth on both backends).

    jax: lax.associative_scan. numpy: Hillis-Steele doubling with the same
    exact field semantics."""
    op = op or mul
    if isinstance(a, jax.Array):
        return jax.lax.associative_scan(op, a, axis=axis, reverse=reverse)
    x = np.flip(a, axis=axis) if reverse else a.copy()
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim
    k = 1
    while k < n:
        hi, lo = list(sl), list(sl)
        hi[axis] = slice(k, None)
        lo[axis] = slice(0, n - k)
        y = x.copy()
        y[tuple(hi)] = op(x[tuple(hi)], x[tuple(lo)])
        x = y
        k *= 2
    return np.flip(x, axis=axis) if reverse else x


def batch_inverse(a, axis: int = 0):
    """Montgomery batch inversion along `axis` using two prefix-product scans.

    Replaces the reference's sequential Polinomial::batchInverse
    (src/starkpil/polinomial.hpp:698) with O(log n)-depth associative scans —
    the TPU-friendly formulation (one field inversion total).
    """
    xp = _ns(a)
    n = a.shape[axis]
    fwd = scan_mul(a, axis=axis)
    rev = scan_mul(a, axis=axis, reverse=True)

    def _slice(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(lo, hi)
        return arr[tuple(sl)]

    total_inv = inv(_slice(fwd, n - 1, n))
    ones = xp.ones_like(_slice(a, 0, 1))
    pre = xp.concatenate([ones, _slice(fwd, 0, n - 1)], axis=axis)
    suf = xp.concatenate([_slice(rev, 1, n), ones], axis=axis)
    return mul(mul(pre, suf), total_inv)


def modsum(x, axis=0):
    """Sum of canonical field elements mod p along `axis`, O(1)-depth.

    Splits each element into u32 halves so the native (wrapping) u64 sums
    cannot overflow for up to 2^32 terms, then recombines mod p. This turns a
    log-depth modular reduction tree into two hardware sums — the TPU
    formulation of the reference's per-thread accumulate in evmap
    (src/starkpil/starks.cpp:614-640).
    """
    xp = _ns(x)
    n = x.shape[axis] if x.ndim else 1
    assert n <= (1 << 32), "modsum supports up to 2^32 terms"
    lo = xp.sum(x & M32, axis=axis, dtype=np.uint64)
    hi = xp.sum(x >> np.uint64(32), axis=axis, dtype=np.uint64)
    # lo, hi < 2^32 * n <= 2^64: exact. total = lo + 2^32*hi (mod p)
    lo = xp.where(lo >= P_U64, lo - P_U64, lo)  # lo < 2^64 < 2p
    hi = xp.where(hi >= P_U64, hi - P_U64, hi)
    return add(lo, mul(hi, np.uint64(1 << 32)))


def from_int_array(xs) -> jax.Array:
    """Host conversion: python ints / arbitrary ints -> canonical uint64 array."""
    arr = np.array([int(v) % P for v in np.ravel(np.asarray(xs, dtype=object))], dtype=np.uint64)
    return jnp.asarray(arr.reshape(np.shape(xs)))


def to_int_list(a) -> list[int]:
    return [int(v) for v in np.ravel(np.asarray(a))]
