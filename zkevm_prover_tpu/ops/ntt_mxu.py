"""Goldilocks NTT on the MXU: base transforms as int8 limb matmuls.

The radix-2 NTT in ops/ntt.py is VPU-compute-bound: every butterfly is a
64x64-bit field multiply emulated in u32 limbs (~dozens of VPU ops), and
the systolic array sits idle. This module moves the O(N log N) multiply
work onto the MXU, where it is nearly free, leaving the VPU only the
limb recombination and modular reduction:

  * The NTT is factored four-step style (the same natural-order recursion
    as ops/ntt._ntt_root) until the transform size S fits a DFT matrix
    W[k, i] = root^(ik) of side <= 2^MAX_BASE_BITS.
  * The base transform X = W @ x over GL is computed exactly in integer
    limbs: W and x are split into NL = ceil(64/7) unsigned 7-bit limbs
    (7 bits so every limb fits signed int8, the MXU's native operand).
    The full product needs all NL x NL limb-pair matmuls; pairs with the
    same limb-weight sum t = m + j are accumulated INSIDE one matmul by
    stacking them along the contraction axis, so the MXU produces one
    int32 "diagonal" R_t per t with no overflow:
        R_t = sum_{m+j=t} W_m @ x_j   <= 127 * 127 * NL * S  <  2^31.
  * The diagonals are recombined as sum_t R_t * 2^(7t) and reduced mod p
    on the VPU (the only remaining elementwise work).

Geometric input scaling is folded in for free: `_ntt_g(x, n, root, c, r)`
computes NTT(c * r^i * x[i]) by absorbing (r^n2)^i1 into the base DFT
matrices host-side at every level — so `extend_pol`'s coset shift
(NTT_Goldilocks::extendPol's shift^i coefficient scaling) and the INTT's
1/N never touch the device as separate passes.

Reference for the op contract: NTT_Goldilocks::{NTT,INTT,extendPol}
(absent submodule; call sites src/starkpil/starks.cpp:53,134,215).
Bit-exactness vs ops/ntt.py is property-tested in tests/test_ntt.py.

DISPATCH DECISION (measured on the v5e chip, artifacts/bench/
ntt_2e21x64.json): at the production LDE shape (2^21 -> 2^22 x 64 cols)
this path runs at 126 Melem/s vs the VPU radix path's 337 Melem/s — the
19-diagonal limb recombination costs the VPU more than the butterfly
multiplies it removes. `extend_pol` therefore stays on ops/ntt.py; this
module remains the measured record of the technique (the same
diagonal-stacked limb matmul IS the win for Poseidon's MDS, where the
matrix is small-integer and one limb wide — ops/poseidon_pallas.py
mxu96 mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from . import ntt as nttmod

LIMB_BITS = 7
NL = -(-64 // LIMB_BITS)          # 10 limbs of 7 bits
N_DIAG = 2 * NL - 1               # 19 limb-weight diagonals
MAX_BASE_BITS = 8                 # DFT matmul side <= 256

# 2^(32q) mod p for the 5 u64 recombination groups
_C_Q = tuple(pow(2, 32 * q, gl.P) for q in range(5))


@functools.lru_cache(maxsize=None)
def _base_matrices(s_bits: int, root: int, c: int, r: int):
    """Host-built diagonal-stacked int8 limb matrices for the base DFT
    W[k, i] = root^(ik) * c * r^i  (side S = 2^s_bits).

    Returns a tuple of N_DIAG int8 arrays; entry t has shape
    (S, k_t * S) where k_t = |{(m, j): m + j = t, 0 <= m, j < NL}| and
    the j-blocks are stacked in ascending j so they line up with the
    contiguous slice x_limbs[j0*S : (j1+1)*S] of the limb-stacked input.
    """
    s = 1 << s_bits
    w = np.zeros((s, s), dtype=np.uint64)
    row = [c % gl.P]
    for i in range(1, s):
        row.append(row[-1] * r % gl.P)
    for k in range(s):
        wk = pow(root, k, gl.P)
        acc = 1
        vals = np.empty(s, dtype=np.uint64)
        for i in range(s):
            vals[i] = row[i] * acc % gl.P
            acc = acc * wk % gl.P
        w[k] = vals
    limbs = [
        ((w >> np.uint64(LIMB_BITS * m)) & np.uint64(0x7F)).astype(np.int8)
        for m in range(NL)
    ]
    diags = []
    for t in range(N_DIAG):
        js = range(max(0, t - NL + 1), min(NL - 1, t) + 1)
        diags.append(np.concatenate([limbs[t - j] for j in js], axis=1))
    return tuple(diags)


def _limb_stack(x):
    """(S, M) uint64 -> (NL*S, M) int8 of unsigned 7-bit limbs."""
    parts = [
        ((x >> np.uint64(LIMB_BITS * j)) & np.uint64(0x7F)).astype(jnp.int8)
        for j in range(NL)
    ]
    return jnp.concatenate(parts, axis=0)


def _combine_diagonals(diags):
    """[R_0..R_18] int32 (S, M) -> canonical GL (S, M) uint64.

    v = sum_t R_t * 2^(7t) is regrouped into five u64 words G_q
    (q = 7t // 32, shifted values < 2^57, <= 5 terms per group < 2^60)
    and reduced as sum_q G_q * (2^(32q) mod p).
    """
    groups: list = [None] * 5
    for t, r_t in enumerate(diags):
        q, sh = (7 * t) // 32, (7 * t) % 32
        term = r_t.astype(jnp.uint64) << np.uint64(sh)
        groups[q] = term if groups[q] is None else groups[q] + term
    out = None
    for q, g in enumerate(groups):
        if g is None:
            continue
        term = gl.mul(g, jnp.uint64(_C_Q[q]))  # also canonicalizes g
        out = term if out is None else gl.add(out, term)
    return out


_SLAB = 1 << 17  # batch columns per matmul slab (bounds the liveness of
#                  the 19 int32 diagonal intermediates: 19*S*SLAB*4 bytes)


def _base_ntt_slab(x, s_bits: int, diags):
    s = 1 << s_bits
    xs = _limb_stack(x)
    outs = []
    for t in range(N_DIAG):
        k_t = diags[t].shape[1] // s
        j0 = max(0, t - NL + 1)
        sl = xs[j0 * s:(j0 + k_t) * s]
        outs.append(jax.lax.dot_general(
            jnp.asarray(diags[t]), sl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    return _combine_diagonals(outs)


def _base_ntt(x, s_bits: int, root: int, c: int, r: int):
    """DFT matmul along axis 0: x (S, ...) uint64 -> NTT(c * r^i * x)."""
    s = 1 << s_bits
    bshape = x.shape[1:]
    m = 1
    for d in bshape:
        m *= d
    x2 = x.reshape(s, m)
    diags = _base_matrices(s_bits, root, c, r)
    if m <= _SLAB or m % _SLAB:
        out = _base_ntt_slab(x2, s_bits, diags)
    else:
        out = jnp.concatenate(
            [_base_ntt_slab(x2[:, i:i + _SLAB], s_bits, diags)
             for i in range(0, m, _SLAB)], axis=1)
    return out.reshape(s, *bshape)


def _split(n_bits: int) -> tuple[int, int]:
    """(b1, b2) with b1 the this-level transform and b2 recursed."""
    if n_bits <= 2 * MAX_BASE_BITS:
        b1 = n_bits // 2
    else:
        b1 = MAX_BASE_BITS
    return b1, n_bits - b1


def _ntt_g(x, n_bits: int, root: int, c: int, r: int):
    """NTT along axis 0 of (2^n_bits, ...) with folded scaling c * r^i."""
    if n_bits == 0:
        return gl.mul(x, jnp.uint64(c)) if c != 1 else x
    if n_bits <= MAX_BASE_BITS:
        return _base_ntt(x, n_bits, root, c, r)
    b1, b2 = _split(n_bits)
    n1, n2 = 1 << b1, 1 << b2
    bshape = x.shape[1:]
    a = x.reshape(n1, n2, *bshape)
    # this-level transform over i1; (r^n2)^i1 folds into the matrix
    w1 = pow(root, n2, gl.P)
    y = _base_ntt(a, b1, w1, 1, pow(r, n2, gl.P))
    # outer twiddle root^(k1*i2)
    t_outer = nttmod._outer_twiddles(n_bits, b1, root).reshape(
        (n1, n2) + (1,) * len(bshape))
    z = gl.mul(y, t_outer)
    # recurse over i2 (carries the c and the per-i2 part of the scaling)
    z = jnp.moveaxis(z, 1, 0)
    t = _ntt_g(z, b2, pow(root, n1, gl.P), c, r)
    return t.reshape(1 << n_bits, *bshape)


def ntt(x, n_bits: int | None = None):
    """Forward NTT along axis 0 (natural order) — MXU base transforms."""
    if n_bits is None:
        n_bits = int(x.shape[0]).bit_length() - 1
    assert x.shape[0] == 1 << n_bits
    return _ntt_g(x, n_bits, gl.w(n_bits), 1, 1)


def intt(x, n_bits: int | None = None):
    """Inverse NTT along axis 0; the 1/N scaling rides the base matrices."""
    if n_bits is None:
        n_bits = int(x.shape[0]).bit_length() - 1
    assert x.shape[0] == 1 << n_bits
    w_inv = pow(gl.w(n_bits), gl.P - 2, gl.P)
    n_inv = pow(1 << n_bits, gl.P - 2, gl.P)
    return _ntt_g(x, n_bits, w_inv, n_inv, 1)


def extend_pol(evals, n_bits: int, n_bits_ext: int, shift: int | None = None):
    """Low-degree extension onto the shifted coset (extendPol contract).

    The coset scaling shift^i folds into the forward transform's base
    matrices and twiddles (r=shift) — no standalone scaling pass, unlike
    ops/ntt.extend_pol's explicit geometric_powers multiply.
    """
    if shift is None:
        shift = gl.shift()
    n = 1 << n_bits
    coefs = intt(evals, n_bits)
    pad = jnp.zeros(((1 << n_bits_ext) - n, *evals.shape[1:]),
                    dtype=jnp.uint64)
    return _ntt_g(jnp.concatenate([coefs, pad], axis=0), n_bits_ext,
                  gl.w(n_bits_ext), 1, shift)
