"""Poseidon-GL permutation as a Pallas TPU kernel.

The whole 30-round permutation runs in VMEM on u32 limb pairs (gl_u32):
one HBM read and one write per state instead of a round-trip per round —
the speed-of-light formulation the XLA fori_loop path cannot reach (its
loop body materializes the state in HBM every iteration).

Layout: states ride the LANE axis — arrays are (12, B) with the batch on
lanes (multiples of 128) and the 12 state rows on sublanes; the MDS mixes
rows with statically unrolled shift-adds (power-of-two circulant, see
ops/poseidon_constants.MDS_SHIFTS) accumulated in three u32 limbs.

Requires the power-of-two MDS (the default constant set); loaded constant
sets with a generic MDS fall back to the XLA path in poseidon_gl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gl_u32 as g32
from . import poseidon_constants as pc
from . import poseidon_gl as pgl

WIDTH = pc.WIDTH
TB = 512  # batch tile (lanes)


def _acc3_add(a0, a1, a2, r0, r1, r2):
    """3-limb accumulator += 3-limb term (sums stay < 2^96)."""
    s0 = a0 + r0
    c0 = g32._b2u(s0 < a0)
    s1 = a1 + r1
    c1 = g32._b2u(s1 < a1)
    s1b = s1 + c0
    c1b = g32._b2u(s1b < s1)
    s2 = a2 + r2 + c1 + c1b
    return s0, s1b, s2


def _sbox7(lo, hi):
    x2l, x2h = g32.mul_gl(lo, hi, lo, hi)
    x3l, x3h = g32.mul_gl(x2l, x2h, lo, hi)
    x6l, x6h = g32.mul_gl(x3l, x3h, x3l, x3h)
    return g32.mul_gl(x6l, x6h, lo, hi)


def _mds_rows(lo, hi, exps):
    """Power-of-two circulant MDS on lists of 12 row-vector limb pairs."""
    out_lo, out_hi = [], []
    zero = jnp.zeros_like(lo[0])
    for i in range(WIDTH):
        a0 = a1 = a2 = zero
        for j in range(WIDTH):
            r0, r1, r2, _ = g32.shift_gl(lo[j], hi[j], int(exps[i, j]))
            a0, a1, a2 = _acc3_add(a0, a1, a2, r0, r1, r2)
        rl, rh = g32.reduce128(a0, a1, a2, zero)
        out_lo.append(rl)
        out_hi.append(rh)
    return out_lo, out_hi


def _make_kernel(exps: np.ndarray, clo: np.ndarray, chi: np.ndarray,
                 half: int, rp: int, n_rounds: int):
    """Fully unrolled 30-round kernel, state as 12 row vectors, constants as
    SCALAR immediates per (round, lane): dynamic indexing trips Mosaic
    lowering (int64 induction vars), and captured array constants are
    rejected by pallas_call — scalars are neither."""

    def kernel(lo_ref, hi_ref, olo_ref, ohi_ref):
        lo = [lo_ref[j, :] for j in range(WIDTH)]
        hi = [hi_ref[j, :] for j in range(WIDTH)]
        for r in range(n_rounds):
            for j in range(WIDTH):
                lo[j], hi[j] = g32.add_gl(lo[j], hi[j],
                                          np.uint32(clo[j, r]),
                                          np.uint32(chi[j, r]))
            sbox_rows = (0,) if half <= r < half + rp else range(WIDTH)
            for j in sbox_rows:
                lo[j], hi[j] = _sbox7(lo[j], hi[j])
            lo, hi = _mds_rows(lo, hi, exps)
        for j in range(WIDTH):
            olo_ref[j, :] = lo[j]
            ohi_ref[j, :] = hi[j]

    return kernel


@functools.lru_cache(maxsize=2)
def _permute_call(source: str, interpret: bool):
    exps = pgl._mds_shifts(source)
    if exps is None:
        return None  # generic MDS: no pallas path
    C, _ = pgl._tables_host(source)
    clo = (C & 0xFFFFFFFF).astype(np.uint32).T.copy()  # (12, N_ROUNDS)
    chi = (C >> 32).astype(np.uint32).T.copy()
    kernel = _make_kernel(np.asarray(exps), clo, chi, pc.ROUNDS_F // 2,
                          pc.ROUNDS_P, pc.N_ROUNDS)

    def run(lo, hi):  # (12, B) u32 each, B % TB == 0
        b = lo.shape[1]
        grid = (b // TB,)
        specs = pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM)
        out_shape = (
            jax.ShapeDtypeStruct((WIDTH, b), jnp.uint32),
            jax.ShapeDtypeStruct((WIDTH, b), jnp.uint32),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[specs, specs],
            out_specs=(
                pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(lo, hi)

    return run


def available() -> bool:
    return _permute_call(pc.source(), False) is not None


def permute(states, *, interpret: bool = False):
    """Poseidon permutation of (H, 12) uint64 states via the Pallas kernel."""
    h = states.shape[0]
    pad = (-h) % TB
    x = states
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, WIDTH), dtype=jnp.uint64)], axis=0
        )
    xt = x.T  # (12, H+pad)
    lo, hi = g32.split_u64(xt)
    run = _permute_call(pc.source(), interpret)
    assert run is not None, "pallas path requires the power-of-two MDS"
    olo, ohi = run(lo, hi)
    out = g32.join_u64(olo, ohi).T
    return out[:h]
