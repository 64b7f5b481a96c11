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

Still host-bound (emitted actions checked by construction):
  binary, arith, mem_align, storage, hashes — each needs an interface-row
  refactor on its SM (accumulator or held-input columns) to expose a
  row-aligned tuple; they land incrementally.
"""

from __future__ import annotations

import numpy as np

from ..stark import expr as ex
from ..stark.compose import CombinedAIR
from .sm import main_sm, memory


def build_batch_air(rom, n_bits: int) -> CombinedAIR:
    air = CombinedAIR("batch", n_bits)
    air.add("main", main_sm.build_air(rom, n_bits))
    air.add("memory", memory.build_air(n_bits))

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
    return air


def execute_batch(rom, n_bits: int, input: dict | None = None,
                  smt=None):
    """Run the Main interpreter, fill every bound SM's trace, and stack the
    combined trace. Returns (MainResult, stacked_trace)."""
    res = main_sm.MainExecutor(rom, n_bits).execute(input=input, smt=smt)
    mem_tr, _ = memory.execute(res.actions.memory, n_bits)
    return res, {"main": res.trace, "memory": mem_tr}
