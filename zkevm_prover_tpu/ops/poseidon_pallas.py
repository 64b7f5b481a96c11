"""Poseidon-GL permutation as a Pallas TPU kernel.

The whole 30-round permutation runs in VMEM on u32 limb pairs (gl_u32):
one HBM read and one write per state instead of a round-trip per round —
the speed-of-light formulation the XLA fori_loop path cannot reach (its
loop body materializes the state in HBM every iteration).

Layout: states ride the LANE axis — arrays are (12, B) with the batch on
lanes (multiples of 128) and the 12 state rows on sublanes; the MDS mixes
rows with statically unrolled small-constant multiply-adds (the reference
circulant+diag, ops/poseidon_constants.MDS_CIRC) accumulated in three u32
limbs.

Requires a small-integer MDS (true of the reference circulant, max entry
41); loaded constant sets with a generic MDS fall back to the XLA path in
poseidon_gl.
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


def _mds_rows(lo, hi, coeffs):
    """Small-integer MDS on lists of 12 row-vector limb pairs (entries are
    static ints <= 2^16 — the reference circulant's max entry is 41)."""
    out_lo, out_hi = [], []
    zero = jnp.zeros_like(lo[0])
    for i in range(WIDTH):
        a0 = a1 = a2 = zero
        for j in range(WIDTH):
            r0, r1, r2 = g32.mul_small(lo[j], hi[j], int(coeffs[i, j]))
            a0, a1, a2 = _acc3_add(a0, a1, a2, r0, r1, r2)
        rl, rh = g32.reduce128(a0, a1, a2, zero)
        out_lo.append(rl)
        out_hi.append(rh)
    return out_lo, out_hi


ROUND_PAD = 32  # constants table lanes (30 rounds, padded)


def _make_kernel(exps: np.ndarray, half: int, rp: int, n_rounds: int):
    """Round loops are lax.fori_loop with the round's constants selected by
    a one-hot vector that is ROLLED each iteration — the induction variable
    never touches data (dynamic indexing trips Mosaic's int64 lowering, a
    fully unrolled body compiles for minutes, and captured array constants
    are rejected by pallas_call).

    State is 12 row-vector limb pairs; constants arrive as (12, 32) u32
    inputs; the one-hot select is a 32-lane masked reduction per round."""

    def kernel(lo_ref, hi_ref, clo_ref, chi_ref, olo_ref, ohi_ref):
        lo0 = [lo_ref[j, :] for j in range(WIDTH)]
        hi0 = [hi_ref[j, :] for j in range(WIDTH)]
        # Mosaic has no unsigned reductions: select in i32 bit-space
        CLO = pltpu.bitcast(clo_ref[:], jnp.int32)   # (12, 32)
        CHI = pltpu.bitcast(chi_ref[:], jnp.int32)

        def one_hot(col: int):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ROUND_PAD), 1)
            return jnp.where(lane == col, np.int32(1), np.int32(0))

        def body(partial: bool):
            def run(_r, carry):
                oh, lo, hi = carry
                cl = pltpu.bitcast(
                    jnp.sum(CLO * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                ch = pltpu.bitcast(
                    jnp.sum(CHI * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                lo = list(lo)
                hi = list(hi)
                for j in range(WIDTH):
                    lo[j], hi[j] = g32.add_gl(lo[j], hi[j], cl[j], ch[j])
                rows = (0,) if partial else range(WIDTH)
                for j in rows:
                    lo[j], hi[j] = _sbox7(lo[j], hi[j])
                lo, hi = _mds_rows(lo, hi, exps)
                return pltpu.roll(oh, np.int32(1), axis=1), tuple(lo), tuple(hi)

            return run

        oh, lo, hi = jax.lax.fori_loop(
            0, half, body(False), (one_hot(0), tuple(lo0), tuple(hi0)))
        oh, lo, hi = jax.lax.fori_loop(half, half + rp, body(True),
                                       (oh, lo, hi))
        _, lo, hi = jax.lax.fori_loop(half + rp, n_rounds, body(False),
                                      (oh, lo, hi))
        for j in range(WIDTH):
            olo_ref[j, :] = lo[j]
            ohi_ref[j, :] = hi[j]

    return kernel


def _circ_diag(coeffs: np.ndarray):
    """Decompose M as circulant + diagonal (M[i][j] = circ[(j-i)%12] +
    diag[i]·δ_ij — the reference MDS shape); None if M isn't that shape."""
    circ = [int(coeffs[1, (k + 1) % WIDTH]) for k in range(WIDTH)]
    diag = [int(coeffs[i, i]) - circ[0] for i in range(WIDTH)]
    if diag[1] != 0:
        return None
    for i in range(WIDTH):
        if diag[i] < 0:
            return None
        for j in range(WIDTH):
            want = circ[(j - i) % WIDTH] + (diag[i] if i == j else 0)
            if int(coeffs[i, j]) != want:
                return None
    return circ, diag


def _make_kernel_2d(circ: list, diag: list, half: int, rp: int,
                    n_rounds: int):
    """Whole-state (12, TB) formulation — one VPU op covers all rows.

    The 1-D kernel drives each of the 12 state rows as a separate (TB,)
    vector, using 1/8 of the VPU's sublane parallelism. Here the state is
    a single (12, TB) tile and the circulant MDS becomes 12 uniform
    multiply terms over sublane-rotated copies (out_i = Σ_k c_k·s_{(i+k)%12},
    realized as static slices of the doubled state) plus one masked
    diagonal term, so the MDS costs ~13 vector ops instead of 144 and the
    S-box runs on the full tile.
    """
    e0 = [int(v) for v in circ]
    dg = [int(v) for v in diag]

    def kernel(lo_ref, hi_ref, clo_ref, chi_ref, olo_ref, ohi_ref):
        CLO = pltpu.bitcast(clo_ref[:], jnp.int32)   # (12, 32)
        CHI = pltpu.bitcast(chi_ref[:], jnp.int32)

        def one_hot(col: int):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ROUND_PAD), 1)
            return jnp.where(lane == col, np.int32(1), np.int32(0))

        def body(partial: bool):
            def run(_r, carry):
                oh, lo, hi = carry
                cl = pltpu.bitcast(
                    jnp.sum(CLO * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                ch = pltpu.bitcast(
                    jnp.sum(CHI * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                lo, hi = g32.add_gl(lo, hi, cl, ch)
                if partial:
                    l0, h0 = _sbox7(lo[0:1], hi[0:1])
                    lo = jnp.concatenate([l0, lo[1:]], axis=0)
                    hi = jnp.concatenate([h0, hi[1:]], axis=0)
                else:
                    lo, hi = _sbox7(lo, hi)
                ssl = jnp.concatenate([lo, lo], axis=0)   # (24, TB)
                ssh = jnp.concatenate([hi, hi], axis=0)
                zero = jnp.zeros_like(lo)
                a0 = a1 = a2 = zero
                for k in range(WIDTH):
                    r0, r1, r2 = g32.mul_small(
                        ssl[k:k + WIDTH], ssh[k:k + WIDTH], e0[k])
                    a0, a1, a2 = _acc3_add(a0, a1, a2, r0, r1, r2)
                if any(dg):
                    # diagonal term: diag[i]·s_i, nonzero rows only (the
                    # reference has a single +8 at row 0)
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, lo.shape, 0)
                    for i, d in enumerate(dg):
                        if d == 0:
                            continue
                        r0, r1, r2 = g32.mul_small(lo, hi, d)
                        sel = row == i
                        z = jnp.zeros_like(r0)
                        a0, a1, a2 = _acc3_add(
                            a0, a1, a2,
                            jnp.where(sel, r0, z),
                            jnp.where(sel, r1, z),
                            jnp.where(sel, r2, z))
                lo, hi = g32.reduce128(a0, a1, a2, zero)
                return pltpu.roll(oh, np.int32(1), axis=1), lo, hi

            return run

        lo = lo_ref[:, :]
        hi = hi_ref[:, :]
        oh, lo, hi = jax.lax.fori_loop(0, half, body(False),
                                       (one_hot(0), lo, hi))
        oh, lo, hi = jax.lax.fori_loop(half, half + rp, body(True),
                                       (oh, lo, hi))
        _, lo, hi = jax.lax.fori_loop(half + rp, n_rounds, body(False),
                                      (oh, lo, hi))
        olo_ref[:, :] = lo
        ohi_ref[:, :] = hi

    return kernel


def _make_kernel_blocked(exps: np.ndarray, half: int, rp: int,
                         n_rounds: int, lanes: int):
    """Row-list structure with each state row an aligned (8, lanes) block.

    The (TB,) row vectors of the 1-D kernel occupy one sublane out of 8
    per VPU tile; the (12, TB) whole-state kernel fixes utilization but
    pays sublane relayouts for the circulant slices. Here the batch is
    folded onto sublanes host-side — refs are (96, lanes) with row j at
    the aligned sublane slice [8j, 8j+8) — so every op runs on full
    (8, 128) tiles and no relayout is ever needed.
    """

    def kernel(lo_ref, hi_ref, clo_ref, chi_ref, olo_ref, ohi_ref):
        CLO = pltpu.bitcast(clo_ref[:], jnp.int32)   # (12, 32)
        CHI = pltpu.bitcast(chi_ref[:], jnp.int32)

        def one_hot(col: int):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ROUND_PAD), 1)
            return jnp.where(lane == col, np.int32(1), np.int32(0))

        def body(partial: bool):
            def run(_r, carry):
                oh, lo, hi = carry
                cl = pltpu.bitcast(
                    jnp.sum(CLO * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                ch = pltpu.bitcast(
                    jnp.sum(CHI * oh, axis=1, keepdims=True,
                            dtype=jnp.int32), jnp.uint32)
                lo = list(lo)
                hi = list(hi)
                for j in range(WIDTH):
                    lo[j], hi[j] = g32.add_gl(lo[j], hi[j],
                                              cl[j:j + 1], ch[j:j + 1])
                rows = (0,) if partial else range(WIDTH)
                for j in rows:
                    lo[j], hi[j] = _sbox7(lo[j], hi[j])
                lo, hi = _mds_rows(lo, hi, exps)
                return (pltpu.roll(oh, np.int32(1), axis=1),
                        tuple(lo), tuple(hi))

            return run

        lo0 = [lo_ref[8 * j:8 * j + 8, :] for j in range(WIDTH)]
        hi0 = [hi_ref[8 * j:8 * j + 8, :] for j in range(WIDTH)]
        oh, lo, hi = jax.lax.fori_loop(0, half, body(False),
                                       (one_hot(0), tuple(lo0), tuple(hi0)))
        oh, lo, hi = jax.lax.fori_loop(half, half + rp, body(True),
                                       (oh, lo, hi))
        _, lo, hi = jax.lax.fori_loop(half + rp, n_rounds, body(False),
                                      (oh, lo, hi))
        for j in range(WIDTH):
            olo_ref[8 * j:8 * j + 8, :] = lo[j]
            ohi_ref[8 * j:8 * j + 8, :] = hi[j]

    return kernel


MODE = "blocked"   # "1d" | "2d" | "blocked"
BLOCK_LANES = 2048  # lanes per grid step in blocked mode (16384 states)


@functools.lru_cache(maxsize=4)
def _permute_call(source: str, interpret: bool, mode: str = "1d"):
    coeffs = pgl._mds_coeffs(source)
    if coeffs is None:
        return None  # generic MDS: no pallas path
    C, _ = pgl._tables_host(source)
    cpad = np.zeros((WIDTH, ROUND_PAD), dtype=np.uint64)
    cpad[:, : pc.N_ROUNDS] = C.T
    clo = (cpad & 0xFFFFFFFF).astype(np.uint32)
    chi = (cpad >> 32).astype(np.uint32)
    if mode == "blocked":
        kernel = _make_kernel_blocked(np.asarray(coeffs), pc.ROUNDS_F // 2,
                                      pc.ROUNDS_P, pc.N_ROUNDS,
                                      BLOCK_LANES)

        def run(lo, hi):  # (96, B/8) u32 each, (B/8) % BLOCK_LANES == 0
            cols = lo.shape[1]
            grid = (cols // BLOCK_LANES,)
            spec = pl.BlockSpec((8 * WIDTH, BLOCK_LANES),
                                lambda i: (i * 0, i),
                                memory_space=pltpu.VMEM)
            cspec = pl.BlockSpec((WIDTH, ROUND_PAD),
                                 lambda i: (i * 0, i * 0),
                                 memory_space=pltpu.VMEM)
            out_shape = (
                jax.ShapeDtypeStruct((8 * WIDTH, cols), jnp.uint32),
                jax.ShapeDtypeStruct((8 * WIDTH, cols), jnp.uint32),
            )
            return pl.pallas_call(
                kernel, grid=grid,
                in_specs=[spec, spec, cspec, cspec],
                out_specs=(
                    pl.BlockSpec((8 * WIDTH, BLOCK_LANES),
                                 lambda i: (i * 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8 * WIDTH, BLOCK_LANES),
                                 lambda i: (i * 0, i),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=out_shape,
                interpret=interpret,
            )(lo, hi, jnp.asarray(clo), jnp.asarray(chi))

        return run
    if mode == "2d":
        cd = _circ_diag(np.asarray(coeffs))
        if cd is None:
            return None  # 2d needs the circulant+diag shape
        kernel = _make_kernel_2d(cd[0], cd[1], pc.ROUNDS_F // 2,
                                 pc.ROUNDS_P, pc.N_ROUNDS)
    else:
        kernel = _make_kernel(np.asarray(coeffs), pc.ROUNDS_F // 2,
                              pc.ROUNDS_P, pc.N_ROUNDS)

    def run(lo, hi):  # (12, B) u32 each, B % TB == 0
        b = lo.shape[1]
        grid = (b // TB,)
        specs = pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((WIDTH, ROUND_PAD), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        out_shape = (
            jax.ShapeDtypeStruct((WIDTH, b), jnp.uint32),
            jax.ShapeDtypeStruct((WIDTH, b), jnp.uint32),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[specs, specs, cspec, cspec],
            out_specs=(
                pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WIDTH, TB), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(lo, hi, jnp.asarray(clo), jnp.asarray(chi))

    return run


def available() -> bool:
    return _permute_call(pc.source(), False, MODE) is not None


def permute(states, *, interpret: bool = False):
    """Poseidon permutation of (H, 12) uint64 states via the Pallas kernel."""
    h = states.shape[0]
    pad = (-h) % (8 * BLOCK_LANES if MODE == "blocked" else TB)
    x = states
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, WIDTH), dtype=jnp.uint64)], axis=0
        )
    xt = x.T  # (12, H+pad)
    lo, hi = g32.split_u64(xt)
    run = _permute_call(pc.source(), interpret, MODE)
    assert run is not None, "pallas path requires a small-integer MDS"
    if MODE == "blocked":
        # fold the batch onto sublanes: (12, B) -> (12, 8, B/8) -> (96, B/8)
        b = lo.shape[1]
        lo = lo.reshape(WIDTH * 8, b // 8)
        hi = hi.reshape(WIDTH * 8, b // 8)
        olo, ohi = run(lo, hi)
        olo = olo.reshape(WIDTH, b)
        ohi = ohi.reshape(WIDTH, b)
    else:
        olo, ohi = run(lo, hi)
    out = g32.join_u64(olo, ohi).T
    return out[:h]
