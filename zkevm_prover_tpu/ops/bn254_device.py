"""BN254 on device — Montgomery limb field ops + Pippenger MSM.

Reference: src/ffiasm/fq.cpp (generated Montgomery asm) and
src/ffiasm/multiexp.c.hpp:37-115 (ParallelMultiexp: per-thread bucket
accumulation over w-bit scalar windows, then the running-sum reduction).

TPU-native redesign: field elements are 8x32-bit limbs in uint64 lanes
(XLA emulates u64 on TPU; 32x32 products fit exactly), Montgomery CIOS
multiplication fully vectorized over point arrays. Pippenger becomes a
data-parallel pipeline per window:

  window slice -> sort points by bucket index -> SEGMENTED associative
  scan with the Jacobian group law (log-depth, the TPU substitute for
  the reference's serial bucket loop) -> scatter segment totals to the
  bucket array -> suffix associative scan + tree reduction (the
  running-sum trick, also log-depth) -> window combine by c doublings.

Everything is branchless: infinity rides Z == 0 and add/double are
computed jointly with `where` selection (the standard SIMD-EC approach).
The group law is field-generic so G2 (Fp2 limb pairs) reuses it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bn254 as host

M32 = jnp.uint64(0xFFFFFFFF)
NLIMB = 8
P_INT = host.P
R_MONT = (1 << 256) % P_INT
R2_INT = (R_MONT * R_MONT) % P_INT
# -p^{-1} mod 2^32 (the CIOS m-factor)
NPRIME = (-pow(P_INT, -1, 1 << 32)) % (1 << 32)


def limbs_np(x: int) -> np.ndarray:
    return np.array([(x >> (32 * i)) & 0xFFFFFFFF for i in range(NLIMB)],
                    dtype=np.uint64)


def to_int(l) -> int:
    a = np.asarray(l, dtype=np.uint64)
    return sum(int(a[..., i]) << (32 * i) for i in range(NLIMB))


_P = jnp.asarray(limbs_np(P_INT))
_P_INTS = [int(v) for v in limbs_np(P_INT)]    # python ints for the CIOS
_R2 = jnp.asarray(limbs_np(R2_INT))
_ONEM = jnp.asarray(limbs_np(R_MONT))          # 1 in Montgomery form
_ZERO = jnp.zeros(NLIMB, dtype=jnp.uint64)


# ---------------------------------------------------------------------------
# Fp: Montgomery arithmetic on (..., 8) uint64 arrays
# ---------------------------------------------------------------------------


def _ge(a, b):
    """a >= b lexicographically from the top limb (…, 8) -> (…,) bool."""
    gt = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    decided = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    for i in range(NLIMB - 1, -1, -1):
        ai, bi = a[..., i], b[..., i]
        gt = jnp.where(~decided & (ai > bi), True, gt)
        decided = decided | (ai != bi)
    return gt | ~decided  # equal counts as >=


def _sub_raw(a, b):
    """a - b with borrow chain (assumes a >= b)."""
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint64)
    for i in range(NLIMB):
        d = a[..., i] - b[..., i] - borrow
        out.append(d & M32)
        borrow = (d >> 63) & jnp.uint64(1)  # wrapped => borrow
    return jnp.stack(out, axis=-1)


def _add_raw(a, b):
    out = []
    carry = jnp.zeros(a.shape[:-1], dtype=jnp.uint64)
    for i in range(NLIMB):
        s = a[..., i] + b[..., i] + carry
        out.append(s & M32)
        carry = s >> 32
    return jnp.stack(out, axis=-1), carry


def fp_add(a, b):
    s, carry = _add_raw(a, b)
    over = (carry > 0) | _ge(s, _P)
    return jnp.where(over[..., None], _sub_raw(s, _P), s)


def fp_sub(a, b):
    lt = ~_ge(a, b)
    s, _ = _add_raw(a, jnp.where(lt[..., None], _P, _ZERO))
    return _sub_raw(s, b)


def fp_neg(a):
    z = is_zero(a)
    return jnp.where(z[..., None], a, _sub_raw(jnp.broadcast_to(_P, a.shape), a))


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def fp_mul(a, b):
    """Montgomery CIOS product of (…, 8) limb arrays.

    The outer limb loop is a lax.fori_loop: an 8x-unrolled CIOS inside
    log-unrolled EC scans explodes the HLO and XLA:CPU compile time; the
    fori body is traced once.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (NLIMB,))
    t0 = jnp.zeros(shape + (NLIMB,), dtype=jnp.uint64)
    t_hi0 = jnp.zeros(shape, dtype=jnp.uint64)
    np_u = jnp.uint64(NPRIME)

    def body(i, st):
        t, t_hi = st
        ai = jnp.take(a, i, axis=-1)
        carry = jnp.zeros(shape, dtype=jnp.uint64)
        tl = [t[..., j] for j in range(NLIMB)]
        for j in range(NLIMB):
            tmp = tl[j] + ai * b[..., j] + carry
            tl[j] = tmp & M32
            carry = tmp >> 32
        t_hi = t_hi + carry
        m = (tl[0] * np_u) & M32
        tmp = tl[0] + m * jnp.uint64(_P_INTS[0])
        carry = tmp >> 32
        for j in range(1, NLIMB):
            tmp = tl[j] + m * jnp.uint64(_P_INTS[j]) + carry
            tl[j - 1] = tmp & M32
            carry = tmp >> 32
        tmp = t_hi + carry
        tl[NLIMB - 1] = tmp & M32
        t_hi = tmp >> 32
        return jnp.stack(tl, axis=-1), t_hi

    t, t_hi = jax.lax.fori_loop(0, NLIMB, body, (t0, t_hi0))
    res = t
    over = (t_hi > 0) | _ge(res, _P)
    return jnp.where(over[..., None], _sub_raw(res, _P), res)


def fp_sq(a):
    return fp_mul(a, a)


def to_mont(a):
    return fp_mul(a, _R2)


def from_mont(a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return fp_mul(a, one)


class _FpOps:
    add = staticmethod(fp_add)
    sub = staticmethod(fp_sub)
    mul = staticmethod(fp_mul)
    sq = staticmethod(fp_sq)
    neg = staticmethod(fp_neg)

    @staticmethod
    def zero_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def is_zero(a):
        return is_zero(a)


# ---------------------------------------------------------------------------
# Fp2 = Fp[u]/(u^2+1): limb arrays of shape (…, 2, 8)
# ---------------------------------------------------------------------------


class _Fp2Ops:
    @staticmethod
    def add(a, b):
        return fp_add(a, b)  # limb-wise over the (2, 8) tail

    @staticmethod
    def sub(a, b):
        return fp_sub(a, b)

    @staticmethod
    def neg(a):
        return fp_neg(a)

    @staticmethod
    def mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        m00 = fp_mul(a0, b0)
        m11 = fp_mul(a1, b1)
        # Karatsuba cross term
        cross = fp_mul(fp_add(a0, a1), fp_add(b0, b1))
        re = fp_sub(m00, m11)
        im = fp_sub(fp_sub(cross, m00), m11)
        return jnp.stack([re, im], axis=-2)

    @staticmethod
    def sq(a):
        return _Fp2Ops.mul(a, a)

    @staticmethod
    def zero_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))


# ---------------------------------------------------------------------------
# Jacobian group law (field-generic, branchless)
# ---------------------------------------------------------------------------


def jac_double(F, X, Y, Z):
    """2009 Bernstein-Lange dbl-2009-l (a = 0)."""
    A = F.sq(X)
    B = F.sq(Y)
    C = F.sq(B)
    t = F.sub(F.sq(F.add(X, B)), F.add(A, C))
    D = F.add(t, t)
    E = F.add(F.add(A, A), A)
    Fv = F.sq(E)
    X3 = F.sub(Fv, F.add(D, D))
    c8 = F.add(F.add(C, C), F.add(C, C))
    c8 = F.add(c8, c8)
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), c8)
    Z3 = F.mul(F.add(Y, Y), Z)
    return X3, Y3, Z3


def jac_add(F, X1, Y1, Z1, X2, Y2, Z2):
    """Full Jacobian addition, branchless: handles P==Q (double) and
    either operand at infinity via `where` selection."""
    Z1Z1 = F.sq(Z1)
    Z2Z2 = F.sq(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    Rr = F.sub(S2, S1)
    HH = F.sq(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.sq(Rr), HHH), F.add(V, V))
    Y3 = F.sub(F.mul(Rr, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(Z1, Z2), H)

    dX, dY, dZ = jac_double(F, X1, Y1, Z1)
    same_x = F.is_zero(H)
    same_y = F.is_zero(Rr)
    p1_inf = F.is_zero(Z1)
    p2_inf = F.is_zero(Z2)
    is_dbl = same_x & same_y & ~p1_inf & ~p2_inf
    # P + (-P): same x, different y -> infinity
    is_opp = same_x & ~same_y & ~p1_inf & ~p2_inf

    def sel(c, a, b):
        c = c.reshape(c.shape + (1,) * (a.ndim - c.ndim))
        return jnp.where(c, a, b)

    X = sel(is_dbl, dX, X3)
    Y = sel(is_dbl, dY, Y3)
    Z = sel(is_dbl, dZ, Z3)
    Z = sel(is_opp, F.zero_like(Z), Z)
    X = sel(p1_inf, X2, sel(p2_inf, X1, X))
    Y = sel(p1_inf, Y2, sel(p2_inf, Y1, Y))
    Z = sel(p1_inf, Z2, sel(p2_inf, Z1, Z))
    return X, Y, Z


# ---------------------------------------------------------------------------
# Pippenger MSM
# ---------------------------------------------------------------------------


def _all_window_digits(scalars, c: int, n_windows: int) -> np.ndarray:
    """(n_windows, N) int32 digit matrix, computed on host (scalars are
    host data; this is trivial next to the EC work)."""
    out = np.zeros((n_windows, len(scalars)), dtype=np.int32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s) % host.R
        for w in range(n_windows):
            out[w, i] = (s >> (w * c)) & mask
    return out


def _ec_scan(F, X, Y, Z, flags=None):
    """Inclusive (optionally segmented) scan of the group law along axis 0.

    Hillis-Steele with a lax.fori_loop over log2(n) distances — the EC
    combine is traced ONCE (associative_scan would unroll it per level,
    exploding XLA:CPU compile time). `flags` marks segment starts; the
    segmented-scan operator is (f1,v1)*(f2,v2) = (f1|f2, f2 ? v2 : v1+v2).
    """
    n = X.shape[0]
    steps = max(1, (n - 1).bit_length())
    if flags is None:
        flags = jnp.zeros(n, dtype=jnp.bool_)
    rows = jnp.arange(n)

    def body(s, st):
        X, Y, Z, FL = st
        sh = 1 << s
        pX = jnp.roll(X, sh, axis=0)
        pY = jnp.roll(Y, sh, axis=0)
        pZ = jnp.roll(Z, sh, axis=0)
        pF = jnp.roll(FL, sh, axis=0)
        # rows < sh have no predecessor: treat it as the identity
        inval = rows < sh
        pZ = jnp.where(inval.reshape((n,) + (1,) * (Z.ndim - 1)),
                       jnp.zeros_like(pZ), pZ)
        pF = jnp.where(inval, False, pF)
        sX, sY, sZ = jac_add(F, pX, pY, pZ, X, Y, Z)

        def sel(c, a_, b_):
            c = c.reshape(c.shape + (1,) * (a_.ndim - c.ndim))
            return jnp.where(c, a_, b_)

        return (sel(FL, X, sX), sel(FL, Y, sY), sel(FL, Z, sZ), FL | pF)

    X, Y, Z, _ = jax.lax.fori_loop(0, steps, body, (X, Y, Z, flags))
    return X, Y, Z


def _segmented_bucket_sums(F, pts, digits, n_buckets: int):
    """Sort by digit, segmented-scan the group law, scatter segment totals.

    pts: (X, Y, Z) arrays with leading dim N. Returns bucket (X, Y, Z)
    arrays of leading dim n_buckets (bucket 0 = unused).
    """
    n = digits.shape[0]
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    X, Y, Z = (a[order] for a in pts)
    # drop digit-0 points to infinity so they never contribute
    z0 = (d_sorted == 0)
    Z = jnp.where(z0.reshape((n,) + (1,) * (Z.ndim - 1)), jnp.zeros_like(Z), Z)

    # segmented inclusive scan: flags mark segment starts
    flags = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), d_sorted[1:] != d_sorted[:-1]])
    sX, sY, sZ = _ec_scan(F, X, Y, Z, flags=flags)

    # segment ends: last row of each equal-digit run
    ends = jnp.concatenate(
        [d_sorted[1:] != d_sorted[:-1], jnp.ones(1, jnp.bool_)])
    bX = jnp.zeros((n_buckets,) + X.shape[1:], jnp.uint64)
    bY = jnp.zeros((n_buckets,) + Y.shape[1:], jnp.uint64)
    bZ = jnp.zeros((n_buckets,) + Z.shape[1:], jnp.uint64)
    idx = jnp.where(ends, d_sorted, n_buckets)  # out-of-range rows dropped
    bX = bX.at[idx].set(sX, mode="drop")
    bY = bY.at[idx].set(sY, mode="drop")
    bZ = bZ.at[idx].set(sZ, mode="drop")
    return bX, bY, bZ


def _bucket_reduce(F, bX, bY, bZ):
    """sum_b b * bucket[b] = sum of suffix sums (running-sum trick):
    a reversed scan builds the suffixes, a second scan totals them."""
    rX, rY, rZ = (a[::-1] for a in (bX, bY, bZ))
    sX, sY, sZ = _ec_scan(F, rX, rY, rZ)          # suffix sums, k = B..1
    tX, tY, tZ = _ec_scan(F, sX, sY, sZ)          # running total
    return tX[-1], tY[-1], tZ[-1]


@functools.partial(jax.jit, static_argnames=("c", "fp2"))
def _msm_device(Xm, Ym, digits, *, c: int, fp2: bool):
    """digits: (n_windows, N) int32, window 0 = least significant. The
    window loop is a lax.scan (ONE traced body — an unrolled python loop
    compiles pathologically on XLA) running high -> low with c doublings
    between windows."""
    F = _Fp2Ops if fp2 else _FpOps
    one = jnp.broadcast_to(_ONEM, Xm.shape) if not fp2 else jnp.stack(
        [jnp.broadcast_to(_ONEM, Xm[..., 0, :].shape),
         jnp.zeros_like(Xm[..., 0, :])], axis=-2)
    Z = one  # affine inputs: Z = 1 (Montgomery)
    zero_pt = (jnp.zeros_like(Xm[0]), jnp.zeros_like(Ym[0]),
               jnp.zeros_like(Z[0]))

    def step(acc, dig):
        aX, aY, aZ = acc
        for _ in range(c):
            aX, aY, aZ = jac_double(F, aX, aY, aZ)
        bX, bY, bZ = _segmented_bucket_sums(
            F, (Xm, Ym, Z), dig, (1 << c) + 1)
        wX, wY, wZ = _bucket_reduce(F, bX[1:], bY[1:], bZ[1:])
        return jac_add(F, aX, aY, aZ, wX, wY, wZ), None

    (accX, accY, accZ), _ = jax.lax.scan(step, zero_pt, digits[::-1])
    return accX, accY, accZ


def g1_msm_device(points, scalars):
    """Drop-in for host.g1_msm: points [(x, y) ints | None], scalars
    [int]. Runs Pippenger on the accelerator, returns an affine tuple."""
    pairs = [(p, s) for p, s in zip(points, scalars)
             if p is not None and int(s) % host.R]
    if not pairs:
        return host.INF
    pts, scs = zip(*pairs)
    n = len(pts)
    xs = np.stack([limbs_np(p[0] * R_MONT % P_INT) for p in pts])
    ys = np.stack([limbs_np(p[1] * R_MONT % P_INT) for p in pts])
    c = max(2, min(13, n.bit_length() - 1))
    n_windows = -(-254 // c)
    X, Y, Z = _msm_device(jnp.asarray(xs), jnp.asarray(ys),
                          jnp.asarray(_all_window_digits(scs, c, n_windows)),
                          c=c, fp2=False)
    return _jac_out_to_affine(np.asarray(X), np.asarray(Y), np.asarray(Z))


def g2_msm_device(points, scalars):
    """Drop-in for host.g2_msm: points are ((x0,x1),(y0,y1)) Fp2 pairs."""
    pairs = [(p, s) for p, s in zip(points, scalars)
             if p is not None and int(s) % host.R]
    if not pairs:
        return host.INF
    pts, scs = zip(*pairs)
    xs = np.stack([
        np.stack([limbs_np(p[0][0] * R_MONT % P_INT),
                  limbs_np(p[0][1] * R_MONT % P_INT)]) for p in pts])
    ys = np.stack([
        np.stack([limbs_np(p[1][0] * R_MONT % P_INT),
                  limbs_np(p[1][1] * R_MONT % P_INT)]) for p in pts])
    n = len(pts)
    c = max(2, min(13, n.bit_length() - 1))
    n_windows = -(-254 // c)
    X, Y, Z = _msm_device(jnp.asarray(xs), jnp.asarray(ys),
                          jnp.asarray(_all_window_digits(scs, c, n_windows)),
                          c=c, fp2=True)
    return _jac2_out_to_affine(np.asarray(X), np.asarray(Y), np.asarray(Z))


def _jac_out_to_affine(X, Y, Z):
    xi = to_int(from_mont(jnp.asarray(X)))
    yi = to_int(from_mont(jnp.asarray(Y)))
    zi = to_int(from_mont(jnp.asarray(Z)))
    if zi == 0:
        return host.INF
    z_inv = host.fq_inv(zi)
    z2 = z_inv * z_inv % P_INT
    return (xi * z2 % P_INT, yi * z2 % P_INT * z_inv % P_INT)


def _jac2_out_to_affine(X, Y, Z):
    def f2(a):
        return (to_int(from_mont(jnp.asarray(a[0]))),
                to_int(from_mont(jnp.asarray(a[1]))))

    xi, yi, zi = f2(X), f2(Y), f2(Z)
    if zi == (0, 0):
        return host.INF
    z_inv = host.f2_inv(zi)
    z2 = host.f2_mul(z_inv, z_inv)
    return (host.f2_mul(xi, z2), host.f2_mul(yi, host.f2_mul(z2, z_inv)))
