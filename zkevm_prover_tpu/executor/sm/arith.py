"""Arith SM — 256-bit multiply-add: x1·y1 + x2 = y2·2^256 + y3.

Reference: src/sm/arith/ equation eq0 (`x1*y1 - p2_256*y2 + x2 - y3`,
sm_arith_eq0.cpp, SURVEY.md App. C): 16-bit limb columns, each operation
occupying a 32-row group with the carry chained through the rows and CLK
position selectors — the same shape is kept here because it needs only ONE
carry column (one range plookup pair) instead of 31 committed carries.

Committed columns: X1_0..15, Y1_0..15, X2_0..15, Y2_0..15, Y3_0..15 (limb
values, constant within a group), CAR_0..k (carry entering the row, chunked
for range checking). Constant columns: CLK_0..31 cyclic selectors.

Row k of a group enforces output position k:
    conv_k + x2_k·[k<16] + CAR = out_k + CAR'·2^16
    conv_k = Σ_{i+j=k} x1_i·y1_j,  out_k = y3_k (k<16) else y2_{k-16}
All 32 identities are CLK-muxed into ONE polynomial constraint; all-zero
padding rows satisfy it (0·0+0=0), so no activity selector is needed.
Carry bound: CAR = sum_j CAR_j·2^(j·nb) with ceil(20/nb) chunks, each
plookup'd into [0, N) — carry < 16·2^16 < 2^20 in honest traces, and the
check bounds it well below the field, keeping the limb identity sound.
"""

from __future__ import annotations

import numpy as np

from ...stark import expr as ex
from ...stark.air import AIR

L = 16          # limbs per 256-bit operand
W = 1 << 16     # limb base
GROUP = 32      # rows per operation
N_LIMB_COLS = 5 * L
CARRY_BITS = 20  # carry < 16 * 2^16


def carry_chunks(n_bits: int) -> int:
    """Number of [0, 2^n_bits) chunks needed to range-check a carry."""
    return -(-CARRY_BITS // n_bits)


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    assert n % GROUP == 0
    air = AIR("arith", n_bits)
    x1 = air.committed(*[f"X1_{i}" for i in range(L)])
    y1 = air.committed(*[f"Y1_{i}" for i in range(L)])
    x2 = air.committed(*[f"X2_{i}" for i in range(L)])
    y2 = air.committed(*[f"Y2_{i}" for i in range(L)])
    y3 = air.committed(*[f"Y3_{i}" for i in range(L)])
    n_chunks = carry_chunks(n_bits)
    car_cols = air.committed(*[f"CAR_{j}" for j in range(n_chunks)])
    if n_chunks == 1:
        car_cols = (car_cols,)

    clk = []
    for k in range(GROUP):
        v = np.zeros(n, dtype=np.uint64)
        v[k::GROUP] = 1
        clk.append(air.constant(f"CLK{k}", v))
    rng = air.constant("RANGE", np.arange(n, dtype=np.uint64))

    # limbs constant within a group (self-gated at the wrap: row N-1 is
    # always a CLK31 row because N % 32 == 0)
    for col in (*x1, *y1, *x2, *y2, *y3):
        air.require_zero((1 - clk[GROUP - 1]) * (ex.Cm(col.id, True) - col))

    car, carp = None, None
    for j, c in enumerate(car_cols):
        t = c * (1 << (j * n_bits)) if j else c
        tp = ex.Cm(c.id, True) * (1 << (j * n_bits)) if j else ex.Cm(c.id, True)
        car = t if car is None else car + t
        carp = tp if carp is None else carp + tp

    # CLK-muxed limb identity
    e = car - carp * W
    for k in range(2 * L):
        conv = None
        for i in range(max(0, k - L + 1), min(L, k + 1)):
            term = x1[i] * y1[k - i]
            conv = term if conv is None else conv + term
        body = conv if conv is not None else ex.Number(0)  # k=31: empty conv
        if k < L:
            body = body + x2[k] - y3[k]
        else:
            body = body - y2[k - L]
        e = e + clk[k] * body
    # no wrap gate needed: at row N-1 (a CLK31 row) CAR' wraps to row 0,
    # where clk[0]·CAR forces it to zero — exactly the k=31 requirement.
    air.require_zero(e)
    # carry starts at zero on every group boundary
    air.require_zero(clk[0] * car)
    # carry range chunks
    for c in car_cols:
        air.lookup([c], [rng])
    return air


def execute(actions: list[dict], n_bits: int) -> np.ndarray:
    """actions: [{x1, y1, x2}] 256-bit ints; 32 rows per action."""
    n = 1 << n_bits
    n_chunks = carry_chunks(n_bits)
    n_cols = N_LIMB_COLS + n_chunks
    tr = np.zeros((n, n_cols), dtype=np.uint64)
    assert len(actions) * GROUP <= n
    for a_idx, act in enumerate(actions):
        x1v, y1v, x2v = act["x1"], act["y1"], act["x2"]
        total = x1v * y1v + x2v
        y3v = total & ((1 << 256) - 1)
        y2v = total >> 256
        limbs = lambda v: [(v >> (16 * i)) & 0xFFFF for i in range(L)]
        lx1, ly1, lx2, ly2, ly3 = map(limbs, (x1v, y1v, x2v, y2v, y3v))
        base = a_idx * GROUP
        carry = 0
        for k in range(GROUP):
            conv = sum(
                lx1[i] * ly1[k - i]
                for i in range(max(0, k - L + 1), min(L, k + 1))
            )
            lhs = conv + (lx2[k] if k < L else 0) + carry
            outk = ly3[k] if k < L else ly2[k - L]
            chunks = [
                (carry >> (j * n_bits)) & ((1 << n_bits) - 1)
                for j in range(n_chunks)
            ]
            tr[base + k] = lx1 + ly1 + lx2 + ly2 + ly3 + chunks
            carry = (lhs - outk) >> 16
            assert 0 <= carry < (1 << 20)
        assert carry == 0, "top carry must vanish"
    return tr


def result(action: dict) -> tuple[int, int]:
    total = action["x1"] * action["y1"] + action["x2"]
    return total >> 256, total & ((1 << 256) - 1)
