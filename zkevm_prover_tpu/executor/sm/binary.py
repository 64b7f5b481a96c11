"""Binary SM — 256-bit AND/OR/XOR/ADD/SUB/LT/EQ, nibble-sliced.

Reference: src/sm/binary/binary_executor.cpp — byte-sliced 256-bit ops with
carry chaining and factor/reset lookup tables. TPU-first redesign: 4-bit
nibble slicing (64 rows per 256-bit operation) so the op-semantics table
(op, a, b, cIn) -> (c, cOut) fits in a few thousand constant rows and the
whole correctness argument is ONE plookup plus two transition constraints —
the table plays the role of the reference's factor/reset tables
(binary_executor.cpp:33-82).

The slice width is a parameter: 4-bit nibbles for production domains
(table 2816 rows, 64 rows/op), 2-bit slices for small test domains (table
224 rows, 128 rows/op).

Row layout per operation: 256/slice_bits rows, LSB first. Committed columns:
  OPC   opcode id (constant within an operation)
  A, B  operand nibbles
  C     result nibble
  CIN   carry in  (row 0 of an op: CIN = opcode's initial carry)
  COUT  carry out; chained: CIN[i+1] = COUT[i] within the op
For LT/EQ the 256-bit result is COUT of the last row (the reference's
useCarry mechanics); C nibbles are 0.

Constant columns: FIRST (1 on op-start rows), plus the semantics table
(TOP, TA, TB, TCIN, TC, TCOUT) padded cyclically.
"""

from __future__ import annotations

import numpy as np

from ...ops import goldilocks as gl
from ...stark import expr as ex
from ...stark.air import AIR

SLICE_BITS = 4               # production slice width
NIBBLES = 256 // SLICE_BITS  # rows per operation at the default width


def rows_per_op(slice_bits: int = SLICE_BITS) -> int:
    return 256 // slice_bits


OPS = {"AND": 0, "OR": 1, "XOR": 2, "ADD": 3, "SUB": 4, "LT": 5, "EQ": 6}
_INIT_CIN = {"AND": 0, "OR": 0, "XOR": 0, "ADD": 0, "SUB": 0, "LT": 0, "EQ": 1}


def _op_semantics(op: str, a: int, b: int, cin: int,
                  slice_bits: int = SLICE_BITS) -> tuple[int, int]:
    """(c, cout) for one slice — the table row generator."""
    mask = (1 << slice_bits) - 1
    if op == "AND":
        return a & b, 0
    if op == "OR":
        return a | b, 0
    if op == "XOR":
        return a ^ b, 0
    if op == "ADD":
        s = a + b + cin
        return s & mask, s >> slice_bits
    if op == "SUB":
        d = a - b - cin
        return d & mask, 1 if d < 0 else 0
    if op == "LT":
        return 0, 1 if a < b else (cin if a == b else 0)
    if op == "EQ":
        return 0, cin & (1 if a == b else 0)
    raise ValueError(op)


def _table_rows(slice_bits: int = SLICE_BITS):
    rows = []
    for op, opc in OPS.items():
        cins = (0, 1) if op in ("ADD", "SUB", "LT", "EQ") else (0,)
        for a in range(1 << slice_bits):
            for b in range(1 << slice_bits):
                for cin in cins:
                    c, cout = _op_semantics(op, a, b, cin, slice_bits)
                    rows.append((opc, a, b, cin, c, cout))
    return rows


def build_air(n_bits: int, slice_bits: int = SLICE_BITS) -> AIR:
    n = 1 << n_bits
    group = rows_per_op(slice_bits)
    assert n % group == 0
    air = AIR("binary", n_bits)
    opc, a, b, c, cin, cout = air.committed("OPC", "A", "B", "C", "CIN", "COUT")

    # FIRST: 1 on op-start rows
    first = np.zeros(n, dtype=np.uint64)
    first[::group] = 1
    FIRST = air.constant("FIRST", first)

    # semantics table as constant columns, cyclically padded to N
    rows = _table_rows(slice_bits)
    assert len(rows) <= n, f"table ({len(rows)}) larger than domain ({n})"
    cols = list(zip(*rows))
    tcols = []
    for name, vals in zip(("TOP", "TA", "TB", "TCIN", "TC", "TCOUT"), cols):
        arr = np.array(
            [vals[i % len(rows)] for i in range(n)], dtype=np.uint64
        )
        tcols.append(air.constant(name, arr))

    # 1. per-row semantics: (OPC, A, B, CIN, C, COUT) in table
    air.lookup([opc, a, b, cin, c, cout], list(tcols))
    # 2. carry chaining inside an operation: (1 - FIRST') * (CIN' - COUT) == 0
    FIRSTp = ex.Const(FIRST.id, True)
    air.require_zero((1 - FIRSTp) * (ex.Cm(cin.id, True) - cout))
    # 3. opcode constant within an operation: (1 - FIRST') * (OPC' - OPC) == 0
    air.require_zero((1 - FIRSTp) * (ex.Cm(opc.id, True) - opc))
    return air


def execute(actions: list[dict], n_bits: int,
            slice_bits: int = SLICE_BITS) -> np.ndarray:
    """actions: [{op, a, b}] with a, b 256-bit ints. Returns (N, 6) trace.

    Also computes the results (returned via `results(actions)`).
    """
    n = 1 << n_bits
    group = rows_per_op(slice_bits)
    mask = (1 << slice_bits) - 1
    tr = np.zeros((n, 6), dtype=np.uint64)
    assert len(actions) * group <= n, "too many binary actions for domain"
    r = 0
    for act in actions:
        op = act["op"]
        opc = OPS[op]
        cin = _INIT_CIN[op]
        for k in range(group):
            an = (act["a"] >> (slice_bits * k)) & mask
            bn = (act["b"] >> (slice_bits * k)) & mask
            c, cout = _op_semantics(op, an, bn, cin, slice_bits)
            tr[r] = (opc, an, bn, c, cin, cout)
            r += 1
            cin = cout
    # padding rows replicate a no-op AND row (0 AND 0) which is in the table
    return tr


def results(actions: list[dict]) -> list[int]:
    out = []
    for act in actions:
        op, a, b = act["op"], act["a"], act["b"]
        if op == "AND":
            out.append(a & b)
        elif op == "OR":
            out.append(a | b)
        elif op == "XOR":
            out.append(a ^ b)
        elif op == "ADD":
            out.append((a + b) & ((1 << 256) - 1))
        elif op == "SUB":
            out.append((a - b) % (1 << 256))
        elif op == "LT":
            out.append(1 if a < b else 0)
        elif op == "EQ":
            out.append(1 if a == b else 0)
        else:
            raise ValueError(op)
    return out
