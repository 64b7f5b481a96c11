"""Arith SM — 256-bit mul-add and secp256k1 point arithmetic.

Reference: src/sm/arith/ (sm_arith_eq0..eq4 for the Goldilocks fork's
secp256k1 path; eq5-10 extend to BN254 Fp2). Equations over 16-bit limb
columns, one operation per 32-row group, selectors choosing which
identities are live (arith_executor.cpp:380-505):

  eq0 (SELEQ0): x1·y1 + x2 = y2·2^256 + y3
  eq1/eq2 (SELADD/SELDBL): the EC slope —
      s·(x2-x1) ≡ y2-y1 (mod p)    or    2·s·y1 ≡ 3·x1² (mod p)
  eq3: x3 ≡ s² - x1 - x2'   (x2' = x1 when doubling)
  eq4: y3 ≡ s·(x1-x3) - y1

Each modular identity is proven as an exact integer statement
E + p·OFF = p·QHAT with a committed 17-limb nonnegative quotient and a
signed carry chain (range-checked in a shifted window); the constant
p·OFF's 2^512 limb, when present, is folded into row 31's carry-out slot.
All identities are CLK-muxed into one polynomial per chain, exactly the
eq0 scheme. The alias-free x3/y3 < p check (reference selEq3 chunk
comparison) is a pending refinement.

Row layout per group: limb/selector columns constant within the group;
row k carries the weight-2^16k balance of every live equation.
"""

from __future__ import annotations

import numpy as np

from ...stark import expr as ex
from ...stark.air import AIR

L = 16          # limbs per 256-bit operand
QL = 17         # quotient limbs (QHAT < 6p < 2^259)
W = 1 << 16     # limb base
GROUP = 32      # rows per operation
CARRY_BITS = 20       # eq0 carry < 16·2^16 (unsigned)
EC_CARRY_BITS = 27    # EC chains: |carry| < 2^26, shifted window [0, 2^27)
EC_SHIFT = 1 << 26

FPEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
# quotient offsets per equation (derived from each E's exact range)
OFF_SLOPE = 3 * FPEC          # covers add (|q|<=p) and dbl (q in (-3p, 2p))
OFF_X3 = 4
OFF_Y3 = FPEC + 2

MASK256 = (1 << 256) - 1


def _limbs(v: int, count: int) -> list[int]:
    return [(v >> (16 * i)) & 0xFFFF for i in range(count)]


# constant D = p·OFF as 33 limbs; d[32] folds into row 31 of the chain
_D_SLOPE = _limbs(FPEC * OFF_SLOPE, 33)
_D_X3 = _limbs(FPEC * OFF_X3, 33)
_D_Y3 = _limbs(FPEC * OFF_Y3, 33)
_P_LIMBS = _limbs(FPEC, L)


def carry_chunks(n_bits: int) -> int:
    return -(-CARRY_BITS // n_bits)


def ec_carry_chunks(n_bits: int) -> int:
    return -(-EC_CARRY_BITS // n_bits)


def _conv(a, b, k, la=L, lb=L):
    """Σ_{i+j=k} a_i·b_j as an expression (None when empty)."""
    acc = None
    for i in range(max(0, k - lb + 1), min(la, k + 1)):
        t = a[i] * b[k - i]
        acc = t if acc is None else acc + t
    return acc


def _conv_const(c, b, k, lb=QL):
    """Σ_{i+j=k} c_i·b_j with constant limbs c."""
    acc = None
    for i in range(max(0, k - lb + 1), min(L, k + 1)):
        if c[i] == 0:
            continue
        t = b[k - i] * int(c[i])
        acc = t if acc is None else acc + t
    return acc


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    assert n % GROUP == 0
    air = AIR("arith", n_bits)
    x1 = air.committed(*[f"X1_{i}" for i in range(L)])
    y1 = air.committed(*[f"Y1_{i}" for i in range(L)])
    x2 = air.committed(*[f"X2_{i}" for i in range(L)])
    y2 = air.committed(*[f"Y2_{i}" for i in range(L)])
    y3 = air.committed(*[f"Y3_{i}" for i in range(L)])
    x3 = air.committed(*[f"X3_{i}" for i in range(L)])
    s = air.committed(*[f"S_{i}" for i in range(L)])
    q0 = air.committed(*[f"Q0_{i}" for i in range(QL)])
    q1 = air.committed(*[f"Q1_{i}" for i in range(QL)])
    q2 = air.committed(*[f"Q2_{i}" for i in range(QL)])
    sel0, seladd, seldbl = air.committed("SELEQ0", "SELADD", "SELDBL")
    n0 = carry_chunks(n_bits)
    car0 = air.committed(*[f"CAR_{j}" for j in range(n0)])
    if n0 == 1:
        car0 = (car0,)
    ne = ec_carry_chunks(n_bits)
    cars = air.committed(*[f"CARS_{j}" for j in range(ne)])
    carx = air.committed(*[f"CARX_{j}" for j in range(ne)])
    cary = air.committed(*[f"CARY_{j}" for j in range(ne)])
    if ne == 1:
        cars, carx, cary = (cars,), (carx,), (cary,)

    clk = []
    for k in range(GROUP):
        v = np.zeros(n, dtype=np.uint64)
        v[k::GROUP] = 1
        clk.append(air.constant(f"CLK{k}", v))
    rng = air.constant("RANGE", np.arange(n, dtype=np.uint64))

    # limb/selector columns constant within a group
    for col in (*x1, *y1, *x2, *y2, *y3, *x3, *s, *q0, *q1, *q2,
                sel0, seladd, seldbl):
        air.require_zero((1 - clk[GROUP - 1]) * (ex.Cm(col.id, True) - col))
    for f in (sel0, seladd, seldbl):
        air.require_zero(f * (1 - f))
    selsum = sel0 + seladd + seldbl
    air.require_zero(selsum * (selsum - 1))
    selec = seladd + seldbl

    def chain(cols, shift_bits):
        cur, nxt = None, None
        for j, c in enumerate(cols):
            t = c * (1 << (j * n_bits)) if j else c
            tp = (ex.Cm(c.id, True) * (1 << (j * n_bits)) if j
                  else ex.Cm(c.id, True))
            cur = t if cur is None else cur + t
            nxt = tp if nxt is None else nxt + tp
        if shift_bits:
            cur = cur - (1 << shift_bits)
            nxt = nxt - (1 << shift_bits)
        return cur, nxt

    # ---- eq0: x1·y1 + x2 = y2·2^256 + y3 (gated by SELEQ0) -------------
    car, carp = chain(car0, 0)
    e = car - carp * W
    for k in range(2 * L):
        body = _conv(x1, y1, k)
        body = body if body is not None else ex.Number(0)
        if k < L:
            body = body + x2[k] - y3[k]
        else:
            body = body - y2[k - L]
        e = e + clk[k] * sel0 * body
    air.require_zero(e)
    air.require_zero(clk[0] * car)
    for c in car0:
        air.lookup([c], [rng])

    # ---- EC chains ------------------------------------------------------
    def ec_chain(cols, bodies_by_k, sel_gate):
        """One muxed signed-carry chain: Σ clk_k·body_k + gate·carry part."""
        cur, nxt = chain(cols, EC_CARRY_BITS - 1)
        e = sel_gate * (cur - (1 - clk[GROUP - 1]) * nxt * W)
        for k, body in bodies_by_k:
            e = e + clk[k] * body
        air.require_zero(e)
        air.require_zero(clk[0] * sel_gate * cur)
        for c in cols:
            air.lookup([c], [rng])

    # slope: add: s·x2 - s·x1 + y1 - y2 - p·q0 + p·OFF = 0
    #        dbl: 2·s·y1 - 3·x1·x1 - p·q0 + p·OFF = 0
    bodies = []
    for k in range(GROUP):
        a_body = _conv(s, x2, k)
        a2 = _conv(s, x1, k)
        a_body = (a_body if a_body is not None else ex.Number(0)) \
            - (a2 if a2 is not None else 0)
        if k < L:
            a_body = a_body + y1[k] - y2[k]
        d_body = _conv(s, y1, k)
        d_body = (d_body * 2 if d_body is not None else ex.Number(0))
        d2 = _conv(x1, x1, k)
        if d2 is not None:
            d_body = d_body - d2 * 3
        pq = _conv_const(_P_LIMBS, q0, k)
        common_a = a_body + int(_D_SLOPE[k])
        common_d = d_body + int(_D_SLOPE[k])
        if k == GROUP - 1:
            common_a = common_a + int(_D_SLOPE[32]) * W
            common_d = common_d + int(_D_SLOPE[32]) * W
        if pq is not None:
            common_a = common_a - pq
            common_d = common_d - pq
        bodies.append((k, seladd * common_a + seldbl * common_d))
    ec_chain(cars, bodies, selec)

    # x3: s·s - x1 - x2' - x3 - p·q1 + p·OFF = 0  (x2' = x1 when doubling)
    bodies = []
    for k in range(GROUP):
        body = _conv(s, s, k)
        body = body if body is not None else ex.Number(0)
        pq = _conv_const(_P_LIMBS, q1, k)
        if pq is not None:
            body = body - pq
        body = body + int(_D_X3[k])
        if k == GROUP - 1:
            body = body + int(_D_X3[32]) * W
        if k < L:
            common = body - x1[k] - x3[k]
            bodies.append((k, seladd * (common - x2[k])
                           + seldbl * (common - x1[k])))
        else:
            bodies.append((k, selec * body))
    ec_chain(carx, bodies, selec)

    # y3: s·x1 - s·x3 - y1 - y3 - p·q2 + p·OFF = 0
    bodies = []
    for k in range(GROUP):
        body = _conv(s, x1, k)
        body = body if body is not None else ex.Number(0)
        b2 = _conv(s, x3, k)
        if b2 is not None:
            body = body - b2
        pq = _conv_const(_P_LIMBS, q2, k)
        if pq is not None:
            body = body - pq
        body = body + int(_D_Y3[k])
        if k == GROUP - 1:
            body = body + int(_D_Y3[32]) * W
        if k < L:
            body = body - y1[k] - y3[k]
        bodies.append((k, selec * body))
    ec_chain(cary, bodies, selec)
    return air


N_LIMB_COLS = 7 * L + 3 * QL + 3  # limb + quotient + selector columns


def n_cols(n_bits: int) -> int:
    return N_LIMB_COLS + carry_chunks(n_bits) + 3 * ec_carry_chunks(n_bits)


def _ec_witness(op: str, x1v, y1v, x2v, y2v):
    p = FPEC
    if op == "dbl":
        sv = (3 * x1v * x1v) * pow(2 * y1v % p, p - 2, p) % p
        e_slope = 2 * sv * y1v - 3 * x1v * x1v
        x2e = x1v
    else:
        sv = (y2v - y1v) * pow((x2v - x1v) % p, p - 2, p) % p
        e_slope = sv * x2v - sv * x1v - y2v + y1v
        x2e = x2v
    assert e_slope % p == 0
    q0v = e_slope // p + OFF_SLOPE
    x3v = (sv * sv - x1v - x2e) % p
    e_x3 = sv * sv - x1v - x2e - x3v
    assert e_x3 % p == 0
    q1v = e_x3 // p + OFF_X3
    y3v = (sv * (x1v - x3v) - y1v) % p
    e_y3 = sv * x1v - sv * x3v - y1v - y3v
    assert e_y3 % p == 0
    q2v = e_y3 // p + OFF_Y3
    for q in (q0v, q1v, q2v):
        assert 0 <= q < (1 << (16 * QL))
    return sv, x3v, y3v, q0v, q1v, q2v


def ec_result(op: str, x1v, y1v, x2v=None, y2v=None) -> tuple[int, int]:
    """Oracle: (x3, y3) of add/dbl on secp256k1."""
    _, x3v, y3v, *_ = _ec_witness(op, x1v, y1v,
                                  x2v if x2v is not None else x1v,
                                  y2v if y2v is not None else y1v)
    return x3v, y3v


def execute(actions: list[dict], n_bits: int) -> np.ndarray:
    """actions: [{op?: mul|add|dbl, x1, y1, x2[, y2]}] — 32 rows each.

    The generator simulates every live carry chain and asserts the exact
    integer balance row by row (catching any witness bug before the AIR).
    """
    n = 1 << n_bits
    n0 = carry_chunks(n_bits)
    ne = ec_carry_chunks(n_bits)
    tr = np.zeros((n, n_cols(n_bits)), dtype=np.uint64)
    assert len(actions) * GROUP <= n
    for a_idx, act in enumerate(actions):
        op = act.get("op", "mul")
        base = a_idx * GROUP
        x1v, y1v = act["x1"], act["y1"]
        x2v = act.get("x2", 0)
        y2v = act.get("y2", 0)
        if op == "mul":
            total = x1v * y1v + x2v
            y3v, y2v = total & MASK256, total >> 256
            sv = x3v = 0
            q0v = q1v = q2v = 0
            sels = (1, 0, 0)
        else:
            sv, x3v, y3v, q0v, q1v, q2v = _ec_witness(
                op, x1v, y1v, x2v, y2v)
            if op == "dbl":
                x2v, y2v = act.get("x2", x1v), act.get("y2", y1v)
            sels = (0, 1, 0) if op == "add" else (0, 0, 1)

        lx1, ly1, lx2, ly2, ly3, lx3, ls = (
            _limbs(v, L) for v in (x1v, y1v, x2v, y2v, y3v, x3v, sv))
        lq0, lq1, lq2 = (_limbs(v, QL) for v in (q0v, q1v, q2v))

        # per-row integer bodies for each live chain
        def conv(a, b, k, la=L, lb=L):
            return sum(a[i] * b[k - i]
                       for i in range(max(0, k - lb + 1), min(la, k + 1)))

        carries = {"eq0": 0, "s": 0, "x": 0, "y": 0}
        for k in range(GROUP):
            row = []
            row += lx1 + ly1 + lx2 + ly2 + ly3 + lx3 + ls
            row += lq0 + lq1 + lq2
            row += list(sels)
            # eq0 chunks (unsigned), then the three EC chains (shifted)
            row += [(carries["eq0"] >> (j * n_bits)) & ((1 << n_bits) - 1)
                    for j in range(n0)]
            for key in ("s", "x", "y"):
                enc = carries[key] + EC_SHIFT if sels[0] == 0 and (
                    sels[1] or sels[2]) else 0
                row += [(enc >> (j * n_bits)) & ((1 << n_bits) - 1)
                        for j in range(ne)]
            tr[base + k] = row

            if sels[0]:
                body = conv(lx1, ly1, k) + (lx2[k] if k < L else 0) \
                    - (ly3[k] if k < L else ly2[k - L])
                tot = body + carries["eq0"]
                assert tot % W == 0, f"eq0 unbalanced at row {k}"
                carries["eq0"] = tot // W
            elif sels[1] or sels[2]:
                if sels[1]:
                    sb = conv(ls, lx2, k) - conv(ls, lx1, k) \
                        + ((ly1[k] - ly2[k]) if k < L else 0)
                    x2e = lx2
                else:
                    sb = 2 * conv(ls, ly1, k) - 3 * conv(lx1, lx1, k)
                    x2e = lx1
                sb += _D_SLOPE[k] - conv(_P_LIMBS, lq0, k, L, QL)
                xb = conv(ls, ls, k) + _D_X3[k] \
                    - conv(_P_LIMBS, lq1, k, L, QL) \
                    - ((lx1[k] + x2e[k] + lx3[k]) if k < L else 0)
                yb = conv(ls, lx1, k) - conv(ls, lx3, k) + _D_Y3[k] \
                    - conv(_P_LIMBS, lq2, k, L, QL) \
                    - ((ly1[k] + ly3[k]) if k < L else 0)
                if k == GROUP - 1:
                    sb += _D_SLOPE[32] * W
                    xb += _D_X3[32] * W
                    yb += _D_Y3[32] * W
                for key, body in (("s", sb), ("x", xb), ("y", yb)):
                    tot = body + carries[key]
                    assert tot % W == 0 or k == GROUP - 1, \
                        f"{key} chain unbalanced at row {k}"
                    carries[key] = tot // W
                    assert abs(carries[key]) < EC_SHIFT, \
                        f"{key} carry overflow at row {k}"
        for key, v in carries.items():
            assert v == 0, f"chain {key} ends with carry {v}"
    return tr


def result(action: dict) -> tuple[int, int]:
    total = action["x1"] * action["y1"] + action.get("x2", 0)
    return total >> 256, total & MASK256
