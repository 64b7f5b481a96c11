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
  main <-> memory      every mOp row IS a Memory access row (permutation)
  main <-> binary      every BIN row IS a Binary op-end interface row:
                       operands from the A/B registers, result in op (or in
                       carry for LT/SLT/EQ via the table-bound USECARRY)
  main  -> poseidon_g  the sRD/sWR key derivation (both Poseidon
                       permutations of the C / A,B key inputs)
  main  -> storage     every sRD/sWR row looks up a storage action start
                       (root, key, value, new root, get/set kind)
  storage -> poseidon_g every claimed node/value preimage hashes to its
                       root (the ONODE/NNODE-flagged rows)

Still host-bound (emitted actions checked by construction):
  arith, mem_align, climb_key, hashes — each needs an interface-row
  refactor on its SM to expose a row-aligned tuple; they land
  incrementally.
"""

from __future__ import annotations

import numpy as np

from ..stark import expr as ex
from ..stark.compose import CombinedAIR
from .sm import binary, climb_key, main_sm, memory, poseidon_g, storage

DEFAULT_INCLUDE = ("memory", "binary", "storage", "poseidon_g",
                   "climb_key")


def build_batch_air(rom, n_bits: int,
                    include: tuple = DEFAULT_INCLUDE,
                    binary_slice_bits: int | None = None) -> CombinedAIR:
    air = CombinedAIR("batch", n_bits)
    air.add("main", main_sm.build_air(rom, n_bits))
    if "memory" in include:
        air.add("memory", memory.build_air(n_bits))
    if "binary" in include:
        sb = binary_slice_bits or _slice_bits(n_bits)
        air.add("binary", binary.build_air(n_bits, sb))
    if "storage" in include:
        assert "poseidon_g" in include, "storage binding needs poseidon_g"
        air.add("storage", storage.build_air(n_bits))
    if "poseidon_g" in include:
        air.add("poseidon_g", poseidon_g.build_air(n_bits))
    if "climb_key" in include:
        air.add("climb_key", climb_key.build_air(n_bits))

    Z = ex.Number(0)

    def pos_iface():
        """PoseidonG (input12, hash4) tuple on its output rows."""
        t = ([air.cm("poseidon_g", f"IN{j}") for j in range(12)]
             + [air.cm("poseidon_g", f"S{j}") for j in range(4)])
        return t, air.const("poseidon_g", "GOUT")

    if "memory" in include:
        # main.mOp rows are exactly Memory's access rows (main.pil's Mem
        # permutation); STEP on the main side is the row index constant
        f = ([air.cm("main", "ADDR"), air.const("main", "STEP"),
              air.cm("main", "mWR")]
             + [air.cm("main", f"OP{l}") for l in range(8)])
        t = ([air.cm("memory", "ADDR"), air.cm("memory", "STEP"),
              air.cm("memory", "MWR")]
             + [air.cm("memory", f"VAL{i}") for i in range(8)])
        air.permutation(f, t, sel_f=air.cm("main", "mOp"),
                        sel_t=air.cm("memory", "MOP"))

    if "binary" in include:
        # main.BIN rows are exactly Binary's op-end rows (main.pil's Binary
        # permutation): operands are the A/B register files; the result
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

    if "poseidon_g" in include:
        tpos, gout = pos_iface()
        srd, swr = air.cm("main", "SRD"), air.cm("main", "SWR")
        s_sel = srd + swr
        # key derivation (main_executor.cpp:1080-1140): KI = H(C | 0),
        # KEY = H(A0..5,B0,B1 | KI)
        f1 = ([air.cm("main", f"C{l}") for l in range(8)] + [Z] * 4
              + [air.cm("main", f"KI{j}") for j in range(4)])
        air.lookup(f1, tpos, sel_f=s_sel, sel_t=gout)
        f2 = ([air.cm("main", f"A{l}") for l in range(6)]
              + [air.cm("main", "B0"), air.cm("main", "B1")]
              + [air.cm("main", f"KI{j}") for j in range(4)]
              + [air.cm("main", f"KEY{j}") for j in range(4)])
        air.lookup(f2, tpos, sel_f=s_sel, sel_t=gout)

    if "storage" in include:
        tpos, gout = pos_iface()
        # node hashes: every flagged preimage (children8 | leaf-cap) hashes
        # to the row's root — for both trees
        for pre in ("O", "N"):
            f = ([air.cm("storage", f"{pre}L{j}") for j in range(4)]
                 + [air.cm("storage", f"{pre}R{j}") for j in range(4)]
                 + [air.cm("storage", f"{pre}LEAF"), Z, Z, Z]
                 + [air.cm("storage", f"{pre}ROOT{j}") for j in range(4)])
            air.lookup(f, tpos, sel_f=air.cm("storage", f"{pre}NODE"),
                       sel_t=gout)
        # value preimage at a matching new leaf: NR = H(VLOW|VHIGH | 0)
        fv = ([air.cm("storage", f"VLOW{j}") for j in range(4)]
              + [air.cm("storage", f"VHIGH{j}") for j in range(4)]
              + [Z] * 4
              + [air.cm("storage", f"NR{j}") for j in range(4)])
        air.lookup(fv, tpos, sel_f=air.cm("storage", "FOUNDN"),
                   sel_t=gout)

        # main sRD/sWR rows look up a storage action start: the SR register
        # (as 4 field elements), the derived key, the value (op for reads,
        # D for writes), the resulting root (op for writes), and the kind
        srd, swr = air.cm("main", "SRD"), air.cm("main", "SWR")
        srfe = [air.cm("main", f"SR{2 * i}")
                + air.cm("main", f"SR{2 * i + 1}") * (1 << 32)
                for i in range(4)]
        opfe = [air.cm("main", f"OP{2 * i}")
                + air.cm("main", f"OP{2 * i + 1}") * (1 << 32)
                for i in range(4)]
        val = [srd * air.cm("main", f"OP{l}") + swr * air.cm("main", f"D{l}")
               for l in range(8)]
        nr = [srd * srfe[i] + swr * opfe[i] for i in range(4)]
        f = (srfe + [air.cm("main", f"KEY{j}") for j in range(4)]
             + val + nr + [srd])
        t = ([air.cm("storage", f"OROOT{j}") for j in range(4)]
             + [air.cm("storage", f"RKEY{j}") for j in range(4)]
             + [air.cm("storage", f"VLOW{j}") for j in range(4)]
             + [air.cm("storage", f"VHIGH{j}") for j in range(4)]
             + [air.cm("storage", f"ANROOT{j}") for j in range(4)]
             + [air.cm("storage", "SAME")])
        air.lookup(f, t, sel_f=srd + swr,
                   sel_t=air.cm("storage", "START")
                   * air.cm("storage", "OACT"))

    if "climb_key" in include and "storage" in include:
        # every storage climb-down step's (child key, level, bit) must be a
        # ClimbKey operation — the no-wrap guarantee the storage AIR's
        # modular climb equation cannot give by itself
        def nxt(sm, col):
            return ex.Cm(air.cm(sm, col).id, True)

        f = ([nxt("storage", f"RKEY{j}") for j in range(4)]
             + [air.cm("storage", "LEVEL"), air.cm("storage", "BIT")])
        t = ([air.cm("climb_key", f"KEY{j}") for j in range(4)]
             + [air.cm("climb_key", "LEVEL"), air.cm("climb_key", "BIT")])
        air.lookup(f, t, sel_f=1 - air.cm("storage", "LAST"),
                   sel_t=air.const("climb_key", "ISLAST"))
    return air


def _slice_bits(n_bits: int) -> int:
    n = 1 << n_bits
    s = 1
    while 28 * (4 ** (s + 1)) <= n and s < 4:
        s += 1
    return s


def execute_batch(rom, n_bits: int, input: dict | None = None, smt=None,
                  include: tuple = DEFAULT_INCLUDE,
                  binary_slice_bits: int | None = None):
    """Run the Main interpreter, fill every bound SM's trace, and stack the
    combined trace. Returns (MainResult, traces dict)."""
    res = main_sm.MainExecutor(rom, n_bits).execute(input=input, smt=smt)
    traces = {"main": res.trace}
    if "memory" in include:
        traces["memory"], _ = memory.execute(res.actions.memory, n_bits)
    if "binary" in include:
        sb = binary_slice_bits or _slice_bits(n_bits)
        traces["binary"] = binary.execute(res.actions.binary, n_bits, sb)
    if "storage" in include:
        traces["storage"], emitted = storage.execute(
            res.actions.storage, n_bits,
            smt.db if smt is not None else None)
        res.actions.poseidon_g += emitted["poseidon_g"]
        res.actions.climb_key += emitted["climb_key"]
    if "poseidon_g" in include:
        traces["poseidon_g"] = poseidon_g.execute(
            res.actions.poseidon_g, n_bits)
    if "climb_key" in include:
        traces["climb_key"] = climb_key.execute(
            res.actions.climb_key, n_bits)
    return res, traces
