"""Goldilocks NTT / INTT / low-degree extension on device (JAX).

TPU-native replacement for the reference's `NTT_Goldilocks`
(`NTT`, `INTT`, `extendPol` — absent submodule; call sites:
src/starkpil/starks.cpp:53,134,215,262,285, src/starkpil/fri/friProve.cpp:102).

Design: Cooley-Tukey over the leading axis, vectorized over all trailing axes
(columns ride the VPU lanes — the analogue of the reference's column-blocked
OpenMP NTT). Small transforms (<= 2^_SMALL_BITS) are a fully unrolled
bit-reversed iterative radix-2 pass; larger sizes use the recursive four-step
factorization N = N1·N2 (column NTTs → outer twiddle → row NTTs → transpose),
which is also the multi-chip decomposition (parallel/ntt_sharded.py replaces
the transpose with an all-to-all over the mesh).

All twiddle/power tables are computed once on device via log-depth prefix
scans and cached per (n_bits, root) — no host-side big-int loops, no giant
constants baked into HLO.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl

_SMALL_BITS = 11


@functools.lru_cache(maxsize=None)
def _bitrev(n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(n_bits):
        rev |= ((idx >> b) & 1) << (n_bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n_bits: int, root: int) -> tuple[np.ndarray, ...]:
    """Host tables w_m^j (j < m/2) for each stage m = 2, 4, ..., 2^n_bits."""
    out = []
    for s in range(1, n_bits + 1):
        m = 1 << s
        wm = pow(root, (1 << n_bits) // m, gl.P)
        tw = np.empty(m // 2, dtype=np.uint64)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = acc * wm % gl.P
        out.append(tw)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _host_powers(base: int, n: int) -> np.ndarray:
    """Host table [1, base, ..., base^(n-1)] (small n only; exact python ints)."""
    tw = np.empty(n, dtype=np.uint64)
    acc = 1
    for j in range(n):
        tw[j] = acc
        acc = acc * base % gl.P
    return tw


def geometric_powers(base: int, n: int, np_backend: bool = False):
    """[1, base, base^2, ..., base^(n-1)] as a device array.

    Small tables come from a cached host computation; large ones are built by
    a log-depth associative scan *inline* in the current computation — they are
    intentionally NOT cached, because caching values produced under a jit trace
    would leak tracers across traces. Recomputing the scan costs O(log n)
    passes, noise next to the NTT butterflies that consume it, and XLA CSEs
    duplicates within one program.

    np_backend=True returns a numpy array (the quick-check path).
    """
    if n <= 4096:
        host = _host_powers(base, n)
        return host.copy() if np_backend else jnp.asarray(host)
    if np_backend:
        seed = np.concatenate(
            [np.ones((1,), np.uint64),
             np.full((n - 1,), np.uint64(base % gl.P))])
        return gl.scan_mul(seed)
    seed = jnp.concatenate(
        [jnp.ones((1,), jnp.uint64), jnp.full((n - 1,), jnp.uint64(base % gl.P))]
    )
    return jax.lax.associative_scan(gl.mul, seed)


def _outer_twiddles(n_bits: int, b1: int, root: int) -> jax.Array:
    """T[k1, i2] = root^(k1*i2), shape (2^b1, 2^(n_bits-b1)), built inline.

    Row k1 is a geometric series with ratio root^k1: broadcast the 1-D power
    table and scan along the i2 axis. Inline (uncached) for the same
    tracer-safety reason as geometric_powers.
    """
    n1, n2 = 1 << b1, 1 << (n_bits - b1)
    rows = geometric_powers(root, n1)  # root^k1
    x = jnp.concatenate(
        [jnp.ones((n1, 1), jnp.uint64), jnp.broadcast_to(rows[:, None], (n1, n2 - 1))],
        axis=1,
    )
    return jax.lax.associative_scan(gl.mul, x, axis=1)


def _ntt_small(x, n_bits: int, root: int):
    """Iterative radix-2 NTT along axis 0; x shape (2^n_bits, ...)."""
    n = 1 << n_bits
    bshape = x.shape[1:]
    x = jnp.take(x, jnp.asarray(_bitrev(n_bits)), axis=0)
    tws = _stage_twiddles(n_bits, root)
    for s in range(1, n_bits + 1):
        m = 1 << s
        v = x.reshape(n // m, m, *bshape)
        tw = jnp.asarray(tws[s - 1]).reshape((1, m // 2) + (1,) * len(bshape))
        a = v[:, : m // 2]
        b = gl.mul(v[:, m // 2 :], tw)
        x = jnp.concatenate([gl.add(a, b), gl.sub(a, b)], axis=1).reshape(n, *bshape)
    return x


def _ntt_root(x, n_bits: int, root: int):
    if n_bits == 0:
        return x
    if n_bits <= _SMALL_BITS:
        return _ntt_small(x, n_bits, root)
    b1 = n_bits // 2
    b2 = n_bits - b1
    n1, n2 = 1 << b1, 1 << b2
    bshape = x.shape[1:]
    a = x.reshape(n1, n2, *bshape)
    # column NTTs over i1
    y = _ntt_root(a, b1, pow(root, n2, gl.P))
    # outer twiddle root^(k1*i2)
    t_outer = _outer_twiddles(n_bits, b1, root).reshape((n1, n2) + (1,) * len(bshape))
    z = gl.mul(y, t_outer)
    # row NTTs over i2
    z = jnp.moveaxis(z, 1, 0)  # (n2, n1, ...)
    t = _ntt_root(z, b2, pow(root, n1, gl.P))
    # output index k = k1 + n1*k2 -> layout (k2, k1)
    return t.reshape(1 << n_bits, *bshape)


def ntt(x, n_bits: int | None = None):
    """Forward NTT along axis 0 (coefficients -> evaluations, natural order)."""
    if n_bits is None:
        n_bits = int(x.shape[0]).bit_length() - 1
    assert x.shape[0] == 1 << n_bits
    return _ntt_root(x, n_bits, gl.w(n_bits))


def intt(x, n_bits: int | None = None):
    """Inverse NTT along axis 0 (evaluations -> coefficients)."""
    if n_bits is None:
        n_bits = int(x.shape[0]).bit_length() - 1
    assert x.shape[0] == 1 << n_bits
    w_inv = pow(gl.w(n_bits), gl.P - 2, gl.P)
    y = _ntt_root(x, n_bits, w_inv)
    n_inv = jnp.uint64(pow(1 << n_bits, gl.P - 2, gl.P))
    return gl.mul(y, n_inv)


# ---------------------------------------------------------------------------
# Bit-reversal-free LDE: DIF INTT (natural in -> bitrev out) feeds DIT NTT
# (bitrev in -> natural out), so the two bit-reversal permutations cancel.
# The zero-pad becomes an interleave (coefficient i of the small domain sits
# at bitrev index blowup*r), the coset shift^i scaling becomes a product of
# log2(N) masked constant factors on the bitrev-ordered table, and no
# jnp.take gather ever touches the bulk data.
# ---------------------------------------------------------------------------


def _dit_small(x, n_bits: int, root: int):
    """Iterative radix-2 DIT, BIT-REVERSED input -> natural output.
    (_ntt_small without its input permutation.)"""
    n = 1 << n_bits
    bshape = x.shape[1:]
    tws = _stage_twiddles(n_bits, root)
    for s in range(1, n_bits + 1):
        m = 1 << s
        v = x.reshape(n // m, m, *bshape)
        tw = jnp.asarray(tws[s - 1]).reshape((1, m // 2) + (1,) * len(bshape))
        a = v[:, : m // 2]
        b = gl.mul(v[:, m // 2 :], tw)
        x = jnp.concatenate([gl.add(a, b), gl.sub(a, b)], axis=1).reshape(n, *bshape)
    return x


def _dif_small(x, n_bits: int, root: int):
    """Iterative radix-2 DIF, natural input -> BIT-REVERSED output."""
    n = 1 << n_bits
    bshape = x.shape[1:]
    tws = _stage_twiddles(n_bits, root)
    for s in range(n_bits, 0, -1):
        m = 1 << s
        v = x.reshape(n // m, m, *bshape)
        tw = jnp.asarray(tws[s - 1]).reshape((1, m // 2) + (1,) * len(bshape))
        a = v[:, : m // 2]
        b = v[:, m // 2 :]
        x = jnp.concatenate(
            [gl.add(a, b), gl.mul(gl.sub(a, b), tw)], axis=1
        ).reshape(n, *bshape)
    return x


@functools.lru_cache(maxsize=None)
def _bitrev_twiddles(n_bits: int, b1: int, root: int) -> np.ndarray:
    """T[r1, i2] = root^(bitrev_b1(r1) * i2) — the four-step outer twiddle
    with its transform-side index bit-reversed (host table, small sizes)."""
    n1, n2 = 1 << b1, 1 << (n_bits - b1)
    rev = _bitrev(b1)
    t = np.empty((n1, n2), dtype=np.uint64)
    for r1 in range(n1):
        wk = pow(root, int(rev[r1]), gl.P)
        acc = 1
        for i2 in range(n2):
            t[r1, i2] = acc
            acc = acc * wk % gl.P
    return t


def _outer_twiddles_bitrev(n_bits: int, b1: int, root: int):
    """Device variant of _bitrev_twiddles for large sizes: rows are
    geometric with host-int ratios root^bitrev(r1); built as a broadcast +
    log-depth scan along i2 (same inline/no-cache rule as geometric_powers).
    """
    n1, n2 = 1 << b1, 1 << (n_bits - b1)
    if n1 * n2 <= (1 << 22):
        return jnp.asarray(_bitrev_twiddles(n_bits, b1, root))
    rev = _bitrev(b1)
    ratios = np.array([pow(root, int(r), gl.P) for r in rev], dtype=np.uint64)
    x = jnp.concatenate(
        [jnp.ones((n1, 1), jnp.uint64),
         jnp.broadcast_to(jnp.asarray(ratios)[:, None], (n1, n2 - 1))],
        axis=1)
    return jax.lax.associative_scan(gl.mul, x, axis=1)


def _ntt_dit_br(x, n_bits: int, root: int):
    """Full-size DIT: bit-reversed input -> natural output, four-step
    recursion with NO permutation pass (derivation: with r = r1*2^b2 + r2,
    bitrev_n(r) = bitrev_b2(r2)*2^b1 + bitrev_b1(r1), so the (2^b2, 2^b1)
    view's axis-1 transform is itself bitrev-input DIT and the outer
    twiddle table absorbs the index reversal host-side)."""
    if n_bits == 0:
        return x
    if n_bits <= _SMALL_BITS:
        return _dit_small(x, n_bits, root)
    b1 = n_bits // 2
    b2 = n_bits - b1
    n1, n2 = 1 << b1, 1 << b2
    bshape = x.shape[1:]
    a = x.reshape(n2, n1, *bshape)
    # inner transform over the CONTIGUOUS axis (size 2^b1, bitrev input)
    a = jnp.moveaxis(a, 1, 0)  # (n1, n2, ...)
    y = _ntt_dit_br(a, b1, pow(root, n2, gl.P))  # natural k1
    # outer twiddle root^(k1 * i2) with i2 = bitrev_b2(s2)
    t = _outer_twiddles_bitrev(n_bits, b2, root)  # (n2, n1) -> [s2, k1]
    z = gl.mul(y, t.T.reshape((n1, n2) + (1,) * len(bshape)))
    # outer transform over s2 (size 2^b2, bitrev input), natural k2
    z = jnp.moveaxis(z, 1, 0)  # (n2, n1, ...)
    out = _ntt_dit_br(z, b2, pow(root, n1, gl.P))
    # position k2*n1 + k1 == k for k = k1 + n1*k2 (natural)
    return out.reshape(1 << n_bits, *bshape)


def _ntt_dif_br(x, n_bits: int, root: int):
    """Full-size DIF: natural input -> bit-reversed output (the transpose
    of _ntt_dit_br's flow graph)."""
    if n_bits == 0:
        return x
    if n_bits <= _SMALL_BITS:
        return _dif_small(x, n_bits, root)
    b1 = n_bits // 2
    b2 = n_bits - b1
    n1, n2 = 1 << b1, 1 << b2
    bshape = x.shape[1:]
    a = x.reshape(n1, n2, *bshape)
    # transform over i1 (axis 0, size 2^b1, natural in -> bitrev s1 out)
    y = _ntt_dif_br(a, b1, pow(root, n2, gl.P))
    # outer twiddle root^(bitrev_b1(s1) * i2)
    t = _outer_twiddles_bitrev(n_bits, b1, root)  # (n1, n2) -> [s1, i2]
    z = gl.mul(y, t.reshape((n1, n2) + (1,) * len(bshape)))
    # transform over i2 (size 2^b2) -> bitrev s2; output pos s1*2^b2 + s2
    z = jnp.moveaxis(z, 1, 0)
    o = _ntt_dif_br(z, b2, pow(root, n1, gl.P))
    o = jnp.moveaxis(o, 1, 0)  # (n1, n2, ...) = [s1, s2]
    return o.reshape(1 << n_bits, *bshape)


def _bitrev_geometric(base: int, n_bits: int):
    """[base^bitrev(r) for r < 2^n_bits] via log2(n) masked constant muls
    (bitrev(r) = sum of bits -> the power factorizes over bits of r)."""
    n = 1 << n_bits
    out = jnp.ones((n,), jnp.uint64)
    r = jnp.arange(n, dtype=jnp.uint32)
    for j in range(n_bits):
        factor = jnp.uint64(pow(base, 1 << (n_bits - 1 - j), gl.P))
        out = jnp.where((r >> j) & 1 == 1, gl.mul(out, factor), out)
    return out


def extend_pol(evals, n_bits: int, n_bits_ext: int, shift: int | None = None):
    """Low-degree extension onto the shifted coset (NTT_Goldilocks::extendPol).

    evals (N, ...) on the trace domain -> (NExt, ...) values P(shift·w_ext^j),
    bit-for-bit the INTT -> shift^i scale -> zero-pad -> NTT composition, but
    computed permutation-free: DIF INTT emits coefficients in bitrev order,
    the scale table is built in bitrev order (log n masked muls), the
    zero-pad is an interleave (coef i lands at DIT input index blowup *
    bitrev(i)), and the DIT forward consumes bitrev order directly.
    """
    if shift is None:
        shift = gl.shift()
    n = 1 << n_bits
    blowup = 1 << (n_bits_ext - n_bits)
    w_inv = pow(gl.w(n_bits), gl.P - 2, gl.P)
    c_br = _ntt_dif_br(evals, n_bits, w_inv)  # bitrev-order coefficients * n
    n_inv = pow(n, gl.P - 2, gl.P)
    scale = gl.mul(_bitrev_geometric(shift, n_bits), jnp.uint64(n_inv))
    c_br = gl.mul(c_br, scale.reshape((n,) + (1,) * (evals.ndim - 1)))
    # interleave blowup-1 zero rows after each coefficient row
    z = jnp.zeros((n, blowup - 1, *evals.shape[1:]), dtype=jnp.uint64)
    x = jnp.concatenate([c_br[:, None], z], axis=1).reshape(
        1 << n_bits_ext, *evals.shape[1:])
    return _ntt_dit_br(x, n_bits_ext, gl.w(n_bits_ext))
