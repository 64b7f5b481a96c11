"""Goldilocks arithmetic on u32 limb pairs — the Pallas/Mosaic-compatible form.

Mosaic (the Pallas TPU backend) has no 64-bit integer lanes, so kernels
carry field elements as (lo, hi) uint32 pairs. Every helper here is plain
jnp on u32 arrays — usable identically inside Pallas kernels and in normal
XLA programs, and unit-testable against python ints.

This is the TPU replacement for the reference's AVX2/AVX512 Goldilocks layer
at the register level (SURVEY.md §2.1): 32x32->64 via 16-bit splits, 64-bit
ops via u32 carry chains, and the 2^64 = 2^32 - 1 reduction.

Conventions: a "pair" is (lo, hi) uint32 arrays; u32 arithmetic wraps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U16 = np.uint32(0xFFFF)
U32P_HI = np.uint32(0xFFFFFFFF)  # p = (0xFFFFFFFF << 32) | 1
U32P_LO = np.uint32(0x00000001)


def _u32(x):
    return x if hasattr(x, "astype") else jnp.uint32(x)



def _b2u(c):
    """bool -> u32 0/1 (Mosaic's bool->u32 convert_element_type recurses;
    a select lowers cleanly)."""
    return jnp.where(c, np.uint32(1), np.uint32(0))

def add64(a_lo, a_hi, b_lo, b_hi):
    """(a + b) mod 2^64 -> (lo, hi, carry_out[u32 0/1])."""
    lo = a_lo + b_lo
    c = _b2u(lo < a_lo)
    hi = a_hi + b_hi
    c2 = _b2u(hi < a_hi)
    hi2 = hi + c
    c3 = _b2u(hi2 < hi)
    return lo, hi2, c2 + c3


def sub64(a_lo, a_hi, b_lo, b_hi):
    """(a - b) mod 2^64 -> (lo, hi, borrow_out[u32 0/1])."""
    lo = a_lo - b_lo
    bw = _b2u(a_lo < b_lo)
    hi = a_hi - b_hi
    bw2 = _b2u(a_hi < b_hi)
    hi2 = hi - bw
    bw3 = _b2u(hi < bw)
    return lo, hi2, bw2 + bw3


def mul32(a, b):
    """Full 32x32 -> 64 product as (lo, hi) via 16-bit splits."""
    a0 = a & U16
    a1 = a >> np.uint32(16)
    b0 = b & U16
    b1 = b >> np.uint32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    mid_c = _b2u(mid < p01)  # overflow of the 32-bit mid sum
    lo = p00 + (mid << np.uint32(16))
    lo_c = _b2u(lo < p00)
    hi = p11 + (mid >> np.uint32(16)) + (mid_c << np.uint32(16)) + lo_c
    return lo, hi


def mul64(a_lo, a_hi, b_lo, b_hi):
    """Full 64x64 -> 128 product as four u32 limbs (r0=lowest..r3)."""
    ll_lo, ll_hi = mul32(a_lo, b_lo)
    lh_lo, lh_hi = mul32(a_lo, b_hi)
    hl_lo, hl_hi = mul32(a_hi, b_lo)
    hh_lo, hh_hi = mul32(a_hi, b_hi)
    # mid = lh + ll_hi   (64-bit, cannot overflow: <= (2^64-1) + (2^32-1))
    mid_lo, mid_hi, _ = add64(lh_lo, lh_hi, ll_hi, jnp.zeros_like(ll_hi))
    # mid2 = hl + mid_lo (64-bit, no overflow)
    mid2_lo, mid2_hi, _ = add64(hl_lo, hl_hi, mid_lo, jnp.zeros_like(mid_lo))
    # hi64 = hh + mid_hi + mid2_hi
    h_lo, h_hi, _ = add64(hh_lo, hh_hi, mid_hi, jnp.zeros_like(mid_hi))
    h_lo, h_hi, _ = add64(h_lo, h_hi, mid2_hi, jnp.zeros_like(mid2_hi))
    return ll_lo, mid2_lo, h_lo, h_hi  # r0, r1, r2, r3


def _geq_p(lo, hi):
    return (hi > U32P_HI) | ((hi == U32P_HI) & (lo >= U32P_LO))


def _sub_p(lo, hi, pred):
    """Conditionally subtract p where pred (bool)."""
    d_lo, d_hi, _ = sub64(lo, hi, jnp.where(pred, U32P_LO, np.uint32(0)),
                          jnp.where(pred, U32P_HI, np.uint32(0)))
    return d_lo, d_hi


def reduce128(r0, r1, r2, r3):
    """(r3·2^96 + r2·2^64 + r1·2^32 + r0) mod p -> canonical (lo, hi).

    Same identity as ops/goldilocks._reduce128: with n = hi64 = (r3, r2),
    t0 = lo64 - hi_hi (borrow adds -EPSILON), t1 = hi_lo · (2^32 - 1),
    result = t0 + t1 with overflow adding EPSILON, then canonicalize.
    """
    zero = jnp.zeros_like(r0)
    # t0 = lo64 - r3 (borrow -> subtract EPSILON = add -(2^32-1) = sub (0xffffffff,0))
    t0_lo, t0_hi, borrow = sub64(r0, r1, r3, zero)
    eps = np.uint32(0xFFFFFFFF)
    bsel = borrow > 0
    t0_lo, t0_hi, _ = sub64(t0_lo, t0_hi,
                            jnp.where(bsel, eps, np.uint32(0)), zero)
    # t1 = r2 * (2^32 - 1) = (r2 << 32) - r2
    t1_lo, t1_hi, _ = sub64(zero, r2, r2, zero)
    # t2 = t0 + t1, overflow adds EPSILON
    t2_lo, t2_hi, carry = add64(t0_lo, t0_hi, t1_lo, t1_hi)
    csel = carry > 0
    t2_lo, t2_hi, _ = add64(t2_lo, t2_hi,
                            jnp.where(csel, eps, np.uint32(0)), zero)
    return _sub_p(t2_lo, t2_hi, _geq_p(t2_lo, t2_hi))


def add_gl(a_lo, a_hi, b_lo, b_hi):
    """Canonical field add."""
    lo, hi, carry = add64(a_lo, a_hi, b_lo, b_hi)
    adj = (carry > 0) | _geq_p(lo, hi)
    # subtract p == add 2^32-1 (mod 2^64)
    eps = np.uint32(0xFFFFFFFF)
    zero = jnp.zeros_like(lo)
    lo2, hi2, _ = add64(lo, hi, jnp.where(adj, eps, np.uint32(0)), zero)
    return lo2, hi2


def mul_gl(a_lo, a_hi, b_lo, b_hi):
    """Canonical field multiply."""
    return reduce128(*mul64(a_lo, a_hi, b_lo, b_hi))


def mul_small(a_lo, a_hi, c: int):
    """a · c as three u32 limbs (c static, 0 <= c < 2^16) — for the
    small-integer circulant MDS accumulation (values up to 2^80).

    With c < 2^16 the cross products of mul32 vanish (b1 = 0), so each
    32-bit limb costs two 16x16 multiplies.
    """
    if c == 0:
        z = jnp.zeros_like(a_lo)
        return z, z, z
    if c == 1:
        return a_lo, a_hi, jnp.zeros_like(a_lo)
    if c & (c - 1) == 0 and c.bit_length() - 1 <= 16:
        return shift_gl(a_lo, a_hi, c.bit_length() - 1)[:3]
    cc = np.uint32(c)
    l0 = (a_lo & U16) * cc
    l1 = (a_lo >> np.uint32(16)) * cc
    h0 = (a_hi & U16) * cc
    h1 = (a_hi >> np.uint32(16)) * cc
    # r = l0 + l1·2^16 + h0·2^32 + h1·2^48, all terms < 2^32
    r0 = l0 + (l1 << np.uint32(16))
    c0 = _b2u(r0 < l0)
    r1 = h0 + (l1 >> np.uint32(16)) + c0
    # no carry: h0 < 2^32 - 2^16 and the addends are < 2^16 + 1
    r1b = r1 + (h1 << np.uint32(16))
    c1 = _b2u(r1b < r1)
    r2 = (h1 >> np.uint32(16)) + c1
    return r0, r1b, r2


def shift_gl(a_lo, a_hi, e: int):
    """a · 2^e as four u32 limbs (e static, 0 <= e <= 16) — for the
    power-of-two fast paths (values up to 2^80)."""
    if e == 0:
        z = jnp.zeros_like(a_lo)
        return a_lo, a_hi, z, z
    sh = np.uint32(e)
    ish = np.uint32(32 - e)
    r0 = a_lo << sh
    r1 = (a_hi << sh) | (a_lo >> ish)
    r2 = a_hi >> ish
    z = jnp.zeros_like(a_lo)
    return r0, r1, r2, z


def split_u64(x):
    """u64 array -> (lo, hi) u32 arrays (host/XLA side)."""
    return (
        (x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
        (x >> np.uint64(32)).astype(jnp.uint32),
    )


def join_u64(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))
