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
    bad = _prover().check_constraints(stacked)
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
    assert mem_prover.check_constraints(mem_tr) == [], \
        "forged memory trace should still be internally consistent"

    stacked = air.stack_traces({**traces, "memory": mem_tr})
    assert _prover().check_constraints(stacked) != [], \
        "combined AIR must reject the forged memory row"


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


_slow = pytest.mark.skipif(
    not __import__("os").environ.get("ZK_SLOW"),
    reason="~10 min even with eager evaluation; run with ZK_SLOW=1")


@_slow
def test_combined_storage_binding_satisfied():
    import jax

    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt

    smt = Smt(Database())
    res, traces = combined.execute_batch(
        _storage_rom(), N_BITS, smt=smt, include=STORAGE_INCLUDE)
    air = combined.build_batch_air(_storage_rom(), N_BITS,
                                   include=STORAGE_INCLUDE)
    stacked = air.stack_traces(traces)
    # ~300 columns: XLA compile of the jitted check exceeds any reasonable
    # test budget on this host — run the same graph eagerly instead
    with jax.disable_jit():
        bad = _storage_prover().check_constraints(stacked)
    assert bad == [], f"violated constraints: {bad}"
    _cache["storage_run"] = (res, traces, air)


@_slow
def test_combined_storage_rejects_forged_value():
    import jax

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
    with jax.disable_jit():
        assert _storage_prover().check_constraints(stacked) != []


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
    assert _prover().check_constraints(stacked) != [], \
        "combined AIR must reject a forged binary carry"
