"""Combined batch AIR — Main + Memory in one proof with a proven binding.

The permutation must reject a forged memory value even though BOTH the
Main trace and the Memory trace are internally consistent — the class of
attack host-side binding cannot catch inside a proof.
"""

import numpy as np
import pytest

from zkevm_prover_tpu.executor import combined
from zkevm_prover_tpu.executor.rom import RomBuilder
from zkevm_prover_tpu.executor.sm import main_sm, memory
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

N_BITS = 9

_cache: dict = {}


def _rom():
    if "rom" not in _cache:
        rb = RomBuilder()
        val = 0xCAFEBABE_12345678
        rb.line(CONSTL=val, setA=1)
        rb.line("A :MSTORE(3)", inA=1, mOp=1, mWR=1, offset=3)
        rb.line(":MLOAD(3) => B", inFREE=1, mOp=1, offset=3, setB=1)
        rb.line("A == B :ASSERT", inB=1, assert_=1)
        rb.line(CONSTL=7, setA=1)
        rb.line("A :MSTORE(9)", inA=1, mOp=1, mWR=1, offset=9)
        # binary ops: an overflowing ADD consumed by JMPC, and an SLT
        rb.line(CONSTL=(1 << 256) - 2, setA=1)
        rb.line(CONSTL=5, setB=1)
        rb.line("$ => C :ADD :JMPC(carried)", inFREE=1, bin=1, binOpcode=0,
                setC=1, JMPC=1, useJmpAddr=1, jmpAddr="carried")
        rb.line(CONST=123, setE=1)  # skipped
        rb.label("carried")
        rb.line("$ => D :SLT", inFREE=1, bin=1, binOpcode=3, setD=1)
        rb.clear_registers()
        rb.finalize()
        _cache["rom"] = rb.build()
    return _cache["rom"]


MB_INCLUDE = ("memory", "binary")


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            combined.build_batch_air(_rom(), N_BITS, include=MB_INCLUDE),
            n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def test_combined_air_satisfied():
    res, traces = combined.execute_batch(_rom(), N_BITS, include=MB_INCLUDE)
    air = combined.build_batch_air(_rom(), N_BITS, include=MB_INCLUDE)
    stacked = air.stack_traces(traces)
    bad = _prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_combined_air_rejects_cross_sm_forgery():
    res, traces = combined.execute_batch(_rom(), N_BITS, include=MB_INCLUDE)
    air = combined.build_batch_air(_rom(), N_BITS, include=MB_INCLUDE)

    # forge the Memory SM's copy of the second write: write 8 instead of 7
    # at addr 9, and keep the Memory SM internally consistent (no read ever
    # observes it) — only the cross-SM permutation can notice
    mem_tr = traces["memory"].copy()
    rows = np.nonzero(mem_tr[:, 0] == 9)[0]  # ADDR column
    assert len(rows) == 1
    mem_tr[rows[0], 6] = np.uint64(8)  # VAL0
    mem_prover = StarkProver(StarkSetup(
        memory.build_air(N_BITS), n_queries=8, fri_fold_bits=2))
    assert mem_prover.check_constraints(mem_tr, quick=True) == [], \
        "forged memory trace should still be internally consistent"

    stacked = air.stack_traces({**traces, "memory": mem_tr})
    assert _prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject the forged memory row"


def _ma_rom():
    if "marom" not in _cache:
        from zkevm_prover_tpu.executor.sm import mem_align as ma

        m0 = 0x11223344_55667788_99AABBCC_DDEEFF00_A1A2A3A4_A5A6A7A8 << 64
        m1 = 0xB1B2B3B4 << 200 | 0xC5C6
        val = 0xDEADBEEF_CAFEF00D << 96 | 0x42
        off = 5
        nw0, nw1 = ma.result(  # window coords: w0=m1, w1=m0
            {"op": "wr", "w0": m1, "w1": m0, "offset": 32 - off,
             "value": val})
        rb = RomBuilder()
        rb.line(CONSTL=m0, setA=1)
        rb.line(CONSTL=m1, setB=1)
        rb.line(CONST=off, setC=1)
        rb.line(CONSTL=nw1, setD=1)   # new m0
        rb.line(CONSTL=nw0, setE=1)   # new m1
        rb.line("value :MEM_ALIGN_WR", CONSTL=val, memAlignWR=1)
        # read back 32 bytes at offset 9 of the OLD window
        rb.line(CONST=9, setC=1)
        rb.line("$ => D :MEM_ALIGN_RD", inFREE=1, memAlignRD=1, setD=1)
        rb.clear_registers()
        rb.finalize()
        _cache["marom"] = rb.build()
    return _cache["marom"]


MA_INCLUDE = ("mem_align",)


def _ma_prover():
    if "map" not in _cache:
        _cache["map"] = StarkProver(StarkSetup(
            combined.build_batch_air(_ma_rom(), N_BITS, include=MA_INCLUDE),
            n_queries=8, fri_fold_bits=2))
    return _cache["map"]


def test_combined_mem_align_binding_satisfied():
    res, traces = combined.execute_batch(_ma_rom(), N_BITS,
                                         include=MA_INCLUDE)
    assert len(res.actions.mem_align) == 2
    air = combined.build_batch_air(_ma_rom(), N_BITS, include=MA_INCLUDE)
    stacked = air.stack_traces(traces)
    bad = _ma_prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_combined_mem_align_rejects_forged_write():
    """Forge the SM's view of the written value (one byte off) while
    keeping the SM internally consistent — only the Main<->MemAlign
    permutation can notice."""
    from zkevm_prover_tpu.executor.sm import mem_align as ma

    res, traces = combined.execute_batch(_ma_rom(), N_BITS,
                                         include=MA_INCLUDE)
    acts = [dict(a) for a in res.actions.mem_align]
    assert acts[0]["op"] == "wr"
    acts[0]["value"] ^= 0xFF << 128  # flip a byte of the written value
    forged, _ = ma.execute(acts, N_BITS)
    sm_prover = StarkProver(StarkSetup(
        ma.build_air(N_BITS), n_queries=8, fri_fold_bits=2))
    assert sm_prover.check_constraints(forged, quick=True) == [], \
        "forged mem_align trace should be internally consistent"
    air = combined.build_batch_air(_ma_rom(), N_BITS, include=MA_INCLUDE)
    stacked = air.stack_traces({**traces, "mem_align": forged})
    assert _ma_prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject the forged memAlign value"


def _ar_rom():
    if "arrom" not in _cache:
        gx = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798  # noqa: E501
        rb = RomBuilder()
        # eq0: 3·5 + 7 = 0·2^256 + 22
        rb.line(CONSTL=3, setA=1)
        rb.line(CONSTL=5, setB=1)
        rb.line(CONSTL=7, setC=1)
        rb.line(CONSTL=0, setD=1)
        rb.line("A*B+C :ARITH", CONSTL=22, arithEq0=1)
        # eq2: dbl(G) = 2G on secp256k1 (x2/y2 legs bind to A/B)
        from zkevm_prover_tpu.executor.sm import arith as ar

        gy = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8  # noqa: E501
        g2x, g2y = ar.ec_result("dbl", gx, gy)
        rb.line(CONSTL=gx, setA=1)
        rb.line(CONSTL=gy, setB=1)
        rb.line(CONSTL=g2x, setE=1)
        rb.line("dbl :ARITH_ECADD_SAME", CONSTL=g2y, arithEq2=1)
        # eq7/8: BN254 Fp2 add, (11+22i) + (33+44i) = (44+66i)
        rb.line(CONSTL=11, setA=1)
        rb.line(CONSTL=22, setB=1)
        rb.line(CONSTL=33, setC=1)
        rb.line(CONSTL=44, setD=1)
        rb.line(CONSTL=44, setE=1)
        rb.line("addfp2 :ARITH_BN254_ADDFP2", CONSTL=66, arithEq4=1)
        rb.clear_registers()
        rb.finalize()
        _cache["arrom"] = rb.build()
    return _cache["arrom"]


AR_INCLUDE = ("arith",)


def _ar_prover():
    if "arp" not in _cache:
        _cache["arp"] = StarkProver(StarkSetup(
            combined.build_batch_air(_ar_rom(), N_BITS, include=AR_INCLUDE),
            n_queries=8, fri_fold_bits=2))
    return _cache["arp"]


def test_combined_arith_binding_satisfied():
    res, traces = combined.execute_batch(_ar_rom(), N_BITS,
                                         include=AR_INCLUDE)
    assert [a["op"] for a in res.actions.arith] == ["mul", "dbl", "addfp2"]
    air = combined.build_batch_air(_ar_rom(), N_BITS, include=AR_INCLUDE)
    stacked = air.stack_traces(traces)
    bad = _ar_prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_combined_arith_rejects_forged_operand():
    """Forge the SM's view of the mul's addend (7 -> 8) while keeping the
    SM internally consistent — only the Main<->Arith permutation can
    notice."""
    from zkevm_prover_tpu.executor.sm import arith as ar

    res, traces = combined.execute_batch(_ar_rom(), N_BITS,
                                         include=AR_INCLUDE)
    acts = [dict(a) for a in res.actions.arith]
    assert acts[0]["op"] == "mul"
    acts[0]["x2"] = 8  # claims 3·5+8=23; main's C register says 7
    forged = ar.execute(acts, N_BITS)
    sm_prover = StarkProver(StarkSetup(
        ar.build_air(N_BITS), n_queries=8, fri_fold_bits=2))
    assert sm_prover.check_constraints(forged, quick=True) == [], \
        "forged arith trace should be internally consistent"
    air = combined.build_batch_air(_ar_rom(), N_BITS, include=AR_INCLUDE)
    stacked = air.stack_traces({**traces, "arith": forged})
    assert _ar_prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject the forged arith operand"


def _storage_rom():
    if "srom" not in _cache:
        from zkevm_prover_tpu.hashdb.database import Database
        from zkevm_prover_tpu.hashdb.smt import Smt

        rb = RomBuilder()
        rb.line(CONST=0x1234, setA=1)
        rb.line(CONST=3, setB=1)
        rb.line(CONST=7, setC=1)
        rb.line(CONST=777, setD=1)
        rb.line("$ => SR :SSTORE", inFREE=1, sWR=1, setSR=1)
        rb.line("$ => E :SLOAD", inFREE=1, sRD=1, setE=1)
        rb.line(CONST=777, setA=1)
        rb.line("E :ASSERT", inE=1, assert_=1)
        rb.clear_registers()
        rb.finalize()
        _cache["srom"] = rb.build()
    return _cache["srom"]


STORAGE_INCLUDE = ("storage", "poseidon_g", "climb_key")


def _storage_prover():
    if "sp" not in _cache:
        _cache["sp"] = StarkProver(StarkSetup(
            combined.build_batch_air(_storage_rom(), N_BITS,
                                     include=STORAGE_INCLUDE),
            n_queries=8, fri_fold_bits=2))
    return _cache["sp"]


def test_combined_storage_binding_satisfied():
    """Un-gated: the numpy quick checker evaluates the ~300-column combined
    AIR in seconds (it was ZK_SLOW-gated at ~10 min under eager jnp)."""
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt

    smt = Smt(Database())
    res, traces = combined.execute_batch(
        _storage_rom(), N_BITS, smt=smt, include=STORAGE_INCLUDE)
    air = combined.build_batch_air(_storage_rom(), N_BITS,
                                   include=STORAGE_INCLUDE)
    stacked = air.stack_traces(traces)
    bad = _storage_prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"
    _cache["storage_run"] = (res, traces, air)


def test_combined_storage_rejects_forged_value():
    if "storage_run" not in _cache:
        test_combined_storage_binding_satisfied()
    res, traces, air = _cache["storage_run"]
    from zkevm_prover_tpu.executor.sm import storage as storage_sm

    # the storage machine claims the read returned 778: its own columns
    # stay internally consistent but the value-hash lookup into PoseidonG
    # (and the main-side action lookup) must both break
    ci = {nm: i for i, nm in enumerate(storage_sm.COLS)}
    st = traces["storage"].copy()
    rows = np.nonzero((st[:, ci["VLOW0"]] == 777)
                      & (st[:, ci["SAME"]] == 1))[0]
    assert len(rows) > 0
    st[rows, ci["VLOW0"]] = np.uint64(778)
    stacked = air.stack_traces({**traces, "storage": st})
    assert _storage_prover().check_constraints(stacked, quick=True) != []


def test_combined_air_rejects_forged_carry():
    res, traces = combined.execute_batch(_rom(), N_BITS, include=MB_INCLUDE)
    air = combined.build_batch_air(_rom(), N_BITS, include=MB_INCLUDE)
    cols = main_sm.columns(N_BITS)

    # flip the carry on the SLT row (its carry feeds no jump, so the Main
    # AIR alone only requires it boolean) — the binding must catch it
    main_tr = traces["main"].copy()
    bin_rows = np.nonzero(main_tr[:, cols.index("BIN")] == 1)[0]
    r = int(bin_rows[-1])
    main_tr[r, cols.index("CARRY")] ^= np.uint64(1)
    stacked = air.stack_traces({**traces, "main": main_tr})
    assert _prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged binary carry"
