"""Batch AIR — Main SM + co-processors in one proof with PROVEN bindings.

Reference: the zkEVM's single-trace architecture (every SM's columns in one
2^23-row buffer) makes the PIL inter-SM arguments sound, e.g. main.pil's

    mOp { addr, STEP, mWR, op0..7 } is Mem.{ addr, step, mWr, val0..7 }

Here `build_batch_air` composes the per-SM AIRs (stark.compose.CombinedAIR)
at one domain and declares those bindings as permutation/plookup arguments
over the merged columns, replacing the host-side action checks for the
covered machines. Coverage grows machine by machine; `BINDINGS` documents
what is proven vs still host-bound.

Current proven bindings:
  main <-> memory     every mOp row IS a Memory access row (permutation)
  main <-> binary     every BIN row IS a Binary op-end interface row:
                      operands from the A/B registers, result in op (or in
                      carry for LT/SLT/EQ via the table-bound USECARRY)

Still host-bound (emitted actions checked by construction):
  arith, mem_align, storage, hashes — each needs an interface-row refactor
  on its SM (accumulator or held-input columns) to expose a row-aligned
  tuple; they land incrementally.
"""

from __future__ import annotations

import numpy as np

from ..stark import expr as ex
from ..stark.compose import CombinedAIR
from .sm import binary, main_sm, memory


def build_batch_air(rom, n_bits: int,
                    binary_slice_bits: int | None = None) -> CombinedAIR:
    air = CombinedAIR("batch", n_bits)
    air.add("main", main_sm.build_air(rom, n_bits))
    air.add("memory", memory.build_air(n_bits))
    sb = binary_slice_bits or _slice_bits(n_bits)
    air.add("binary", binary.build_air(n_bits, sb))

    # main.mOp rows are exactly Memory's access rows (reference main.pil's
    # Mem permutation); STEP on the main side is the row index constant
    f = ([air.cm("main", "ADDR"), air.const("main", "STEP"),
          air.cm("main", "mWR")]
         + [air.cm("main", f"OP{l}") for l in range(8)])
    t = ([air.cm("memory", "ADDR"), air.cm("memory", "STEP"),
          air.cm("memory", "MWR")]
         + [air.cm("memory", f"VAL{i}") for i in range(8)])
    air.permutation(f, t, sel_f=air.cm("main", "mOp"),
                    sel_t=air.cm("memory", "MOP"))

    # main.BIN rows are exactly Binary's op-end rows (reference main.pil's
    # Binary permutation): operands are the A/B register files; the result
    # sits in op, except comparison ops whose result is the final carry
    # (USECARRY is bound by the Binary semantics table, so the op side
    # cannot lie about which shape applies)
    uc = air.cm("binary", "USECARRY")
    icc0 = (uc * air.cm("binary", "COUT")
            + (1 - uc) * air.cm("binary", "CC0"))
    f = ([air.cm("main", "BINOP")]
         + [air.cm("main", f"A{l}") for l in range(8)]
         + [air.cm("main", f"B{l}") for l in range(8)]
         + [air.cm("main", f"OP{l}") for l in range(8)]
         + [air.cm("main", "CARRY")])
    t = ([air.cm("binary", "OPC")]
         + [air.cm("binary", f"AA{j}") for j in range(8)]
         + [air.cm("binary", f"BB{j}") for j in range(8)]
         + [icc0] + [(1 - uc) * air.cm("binary", f"CC{j}")
                     for j in range(1, 8)]
         + [air.cm("binary", "COUT")])
    air.permutation(
        f, t, sel_f=air.cm("main", "BIN"),
        sel_t=air.cm("binary", "ACT") * air.const("binary", "GLAST"))
    return air


def _slice_bits(n_bits: int) -> int:
    n = 1 << n_bits
    s = 1
    while 28 * (4 ** (s + 1)) <= n and s < 4:
        s += 1
    return s


def execute_batch(rom, n_bits: int, input: dict | None = None,
                  smt=None, binary_slice_bits: int | None = None):
    """Run the Main interpreter, fill every bound SM's trace, and stack the
    combined trace. Returns (MainResult, traces dict)."""
    res = main_sm.MainExecutor(rom, n_bits).execute(input=input, smt=smt)
    mem_tr, _ = memory.execute(res.actions.memory, n_bits)
    sb = binary_slice_bits or _slice_bits(n_bits)
    bin_tr = binary.execute(res.actions.binary, n_bits, sb)
    return res, {"main": res.trace, "memory": mem_tr, "binary": bin_tr}
