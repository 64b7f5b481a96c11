"""Main SM — ROM interpreter semantics + AIR satisfaction/soundness.

Mirrors the reference's Main SM testing surface: instruction semantics
(selectors, setters, jumps, call/return, repeat), free inputs (command ASTs
and flag-derived), co-processor action emission (memory/binary/arith/
storage/hash), and the eSTARK proof of the generated trace against the
ROM-bound AIR (src/main_sm/fork_9/main/main_executor.cpp).
"""

import os

import numpy as np
import pytest

from zkevm_prover_tpu.executor.rom import Rom, RomBuilder
from zkevm_prover_tpu.executor.sm import main_sm
from zkevm_prover_tpu.hashdb.database import Database
from zkevm_prover_tpu.hashdb.smt import Smt
from zkevm_prover_tpu.ops import keccak as keccak_mod
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

N_BITS = 9
P = main_sm.P


def _run(body_fn, n_bits=N_BITS, input=None, smt=None):
    """body_fn(rb) appends program lines; we add cleanup + cyclic ending."""
    rb = RomBuilder()
    body_fn(rb)
    rb.clear_registers()
    rb.finalize()
    rom = rb.build()
    res = main_sm.MainExecutor(rom, n_bits).execute(input=input, smt=smt)
    return rom, res


def _col(res, name, n_bits=N_BITS):
    return res.trace[:, main_sm.columns(n_bits).index(name)]


# ---------------------------------------------------------------------------
# interpreter semantics
# ---------------------------------------------------------------------------


def test_selectors_setters_assert():
    def body(rb):
        rb.line("7 => A", CONST=7, setA=1)
        rb.line("5 => B", CONST=5, setB=1)
        rb.line("A + B => C", inA=1, inB=1, setC=1)
        rb.line("12 => A", CONST=12, setA=1)
        rb.line("C :ASSERT", inC=1, assert_=1)
        rb.line("A - B => D", inA=1, inB=-1, setD=1)

    rom, res = _run(body)
    assert _col(res, "C0")[3] == 12
    assert _col(res, "D0")[6] == 7  # 12 - 5

    # a failing assert raises
    def bad(rb):
        rb.line(CONST=3, setA=1)
        rb.line(CONST=4, assert_=1)

    with pytest.raises(main_sm.ExecutorError, match="ASSERT"):
        _run(bad)


def test_constl_and_rotl_c():
    big = int.from_bytes(bytes(range(1, 33)), "big")

    def body(rb):
        rb.line("CONSTL => C", CONSTL=big, setC=1)
        rb.line("C rotl => E", inROTL_C=1, setE=1)

    rom, res = _run(body)
    limbs = [(big >> (32 * l)) & 0xFFFFFFFF for l in range(8)]
    got_c = [int(_col(res, f"C{l}")[1]) for l in range(8)]
    assert got_c == limbs
    got_e = [int(_col(res, f"E{l}")[2]) for l in range(8)]
    assert got_e == [limbs[7]] + limbs[:7]


def test_jumps_call_return_repeat():
    def body(rb):
        rb.line("3 => A", CONST=3, setA=1)
        loop = rb.label("loop")
        rb.line("A - 1 => A :JMPN(done)", inA=1, CONST=-1, setA=1,
                JMPN=1, useJmpAddr=1, jmpAddr="done")
        rb.jmp("loop")
        rb.label("done")
        rb.call("sub")                       # B += 100, twice via call
        rb.call("sub")
        rb.line("5 => RCX", CONST=5, setRCX=1)
        rb.line("B + 1 => B :REPEAT", inB=1, CONST=1, setB=1, repeat=1)
        rb.line("206 => A", CONST=206, setA=1)
        rb.line("B :ASSERT", inB=1, assert_=1)  # 2*100 + 6 reps
        rb.line(":JMPZ(iszero)", CONST=0, JMPZ=1, useJmpAddr=1,
                jmpAddr="iszero")
        rb.line(CONST=999, setE=1)           # skipped
        rb.label("iszero")
        rb.jmp("end")
        rb.label("sub")
        rb.line("B + 100 => B", inB=1, CONST=100, setB=1)
        rb.ret()
        rb.label("end")

    rom, res = _run(body)
    # E was never set to 999 (JMPZ taken)
    assert not (_col(res, "E0") == 999).any()
    # A ended at -1 (loop exit), then 206
    assert (_col(res, "A0") == 206).any()


def test_free_input_command_and_memory_ops():
    val = 0xDEADBEEF_00112233_44556677_8899AABB_CCDDEEFF_01020304_05060708_090A0B0C

    def body(rb):
        rb.line("CONSTL => A", CONSTL=val, setA=1)
        rb.line("A :MSTORE(5)", inA=1, mOp=1, mWR=1, offset=5)
        rb.free({"op": "number", "num": "42"}, "${42} => D", setD=1)
        rb.line(":MLOAD(5) => B", inFREE=1, mOp=1, offset=5, setB=1)
        rb.line("A :ASSERT... via B", inB=1, assert_=1)
        # indirect: E = 5, MLOAD(E0)
        rb.line("5 => E", CONST=5, setE=1)
        rb.line(":MLOAD(E) => C", inFREE=1, mOp=1, ind=1, setC=1)

    rom, res = _run(body)
    assert _col(res, "D0")[3] == 42  # set by line 2, visible at row 3
    assert len(res.actions.memory) == 3
    # values are carried as raw fea limbs (MSTORE writes op verbatim,
    # which may hold arbitrary field elements)
    assert res.actions.memory[0] == {
        "addr": 5, "step": 1, "wr": True,
        "fea": tuple((val >> (32 * l)) & 0xFFFFFFFF for l in range(8))}
    assert res.actions.memory[2]["wr"] is False
    got_c = [int(_col(res, f"C{l}")[7]) for l in range(8)]
    assert got_c == [(val >> (32 * l)) & 0xFFFFFFFF for l in range(8)]


def test_storage_srd_swr():
    smt = Smt(Database())

    def body(rb):
        # key regs: A=address-ish, B=type, C=slot; D = value to write
        rb.line(CONST=0x1234, setA=1)
        rb.line(CONST=3, setB=1)
        rb.line(CONST=7, setC=1)
        rb.line("777 => D", CONST=777, setD=1)
        rb.line("$ => SR :SSTORE", inFREE=1, sWR=1, setSR=1)
        rb.line("$ => E :SLOAD", inFREE=1, sRD=1, setE=1)
        rb.line("777 => A", CONST=777, setA=1)
        rb.line("E :ASSERT", inE=1, assert_=1)

    rom, res = _run(body, smt=smt)
    assert len(res.actions.storage) == 2
    st = res.actions.storage
    assert st[0]["op"] == "set" and st[0]["value"] == 777
    assert st[1]["op"] == "get" and st[1]["value"] == 777
    assert res.new_state_root == st[0]["new_root"]
    # the same write replayed directly against the SMT gives the same root
    smt2 = Smt(Database())
    direct = smt2.set((0, 0, 0, 0), st[0]["key"], 777)
    assert direct.new_root == st[0]["new_root"]


def test_hash_keccak_pipeline():
    data = bytes(range(1, 40))  # 39 bytes: one 32-byte chunk + 7 bytes

    def body(rb):
        rb.line("CONSTL => A", CONSTL=int.from_bytes(data[:32], "big"),
                setA=1)
        rb.line("32 => D", CONST=32, setD=1)
        rb.line("A :HASHK(0)", inA=1, hashK=1, offset=0)
        rb.line("CONSTL => A", CONSTL=int.from_bytes(data[32:], "big"),
                setA=1)
        rb.line("7 => D", CONST=7, setD=1)
        rb.line("A :HASHK(0)", inA=1, hashK=1, offset=0)
        rb.line("HASHPOS :HASHKLEN(0)", inHASHPOS=1, hashKLen=1, offset=0)
        rb.line("$ => B :HASHKDIGEST(0)", inFREE=1, hashKDigest=1,
                offset=0, setB=1)

    rom, res = _run(body)
    digest = int.from_bytes(keccak_mod.keccak256(data), "big")
    got = sum(int(_col(res, f"B{l}")[8]) << (32 * l) for l in range(8))
    assert got == digest


def test_binary_and_arith_actions():
    def body(rb):
        rb.line(CONSTL=(1 << 256) - 5, setA=1)
        rb.line(CONSTL=9, setB=1)
        # ADD with carry (wraps); carry consumed on the same line (zkASM's
        # `$ => C :ADD, JMPC(x)` idiom — carry is a per-row column)
        rb.line("$ => C :ADD :JMPC(carried)", inFREE=1, bin=1, binOpcode=0,
                setC=1, JMPC=1, useJmpAddr=1, jmpAddr="carried")
        rb.line(CONST=111, setE=1)  # skipped — carry was set
        rb.label("carried")
        # arith: A*B + C = D*2^256 + op
        rb.line(CONSTL=3, setA=1)
        rb.line(CONSTL=5, setB=1)
        rb.line(CONSTL=1, setC=1)
        rb.line(CONSTL=0, setD=1)
        rb.line("$ => E :ARITH", inFREE=1,
                free_in_tag={"op": "number", "num": "16"},
                arithEq0=1, setE=1)

    def with_tag(rb):
        body(rb)

    rom, res = _run(with_tag)
    assert not (_col(res, "E0") == 111).any()
    assert res.actions.binary[0]["op"] == "ADD"
    assert res.actions.arith == [{"op": "mul", "x1": 3, "y1": 5, "x2": 1}]
    assert res.counters["binary"] == 1 and res.counters["arith"] == 1


def test_arith_ec_ops():
    gx = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
    gy = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
    g2x = 0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5

    def reg(name):
        return {"op": "getReg", "regName": name}

    def body(rb):
        rb.line(CONSTL=gx, setA=1)
        rb.line(CONSTL=gy, setB=1)
        rb.line(CONSTL=gx, setC=1)
        rb.line(CONSTL=gy, setD=1)
        # E = x(A,B + C,D) via the command helper, then the proven dbl
        rb.free({"op": "functionCall", "funcName": "xDblPointEc",
                 "params": [reg("A"), reg("B")]}, setE=1)
        rb.line("$ => B :ARITH_ECDBL", inFREE=1, arithEq2=1, setB=1)
        rb.line("E => A", inE=1, setA=1)
        rb.line(CONSTL=g2x, assert_=0, setC=1)  # compare via binary EQ
        rb.line("A - C => D", inA=1, inC=-1, setD=1)

    rom, res = _run(body)
    # E got x(2G); D = A - C must be 0
    assert (_col(res, "D0")[9] == 0)
    assert res.actions.arith[0]["op"] == "dbl"
    assert res.counters["arith"] == 1


def test_rom_json_loader():
    path = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
    if not os.path.exists(path):
        pytest.skip("reference rom.json not mounted")
    rom = Rom.from_json(path)
    assert len(rom) > 10000
    assert rom.labels["start"] == 0
    # line "STEP => A" exists at labels/start region
    starts = [ln for ln in rom.lines[:40] if ln.inSTEP and ln.setA]
    assert starts, "expected a STEP => A line near start"
    # every jump target resolves inside the program
    for ln in rom.lines:
        if ln.useJmpAddr:
            assert 0 <= ln.jmpAddr < len(rom)


# ---------------------------------------------------------------------------
# AIR
# ---------------------------------------------------------------------------


_air_rom = None


def _air_program():
    # one shared Rom instance — the AIR/setup/prover cache keys on identity
    global _air_rom
    if _air_rom is not None:
        return _air_rom
    rb = RomBuilder()
    rb.line("7 => A", CONST=7, setA=1)
    rb.line("5 => B", CONST=5, setB=1)
    rb.line("A + B => C", inA=1, inB=1, setC=1)
    rb.line("12 => A", CONST=12, setA=1)
    rb.line("C :ASSERT", inC=1, assert_=1)
    rb.line("3 => RCX", CONST=3, setRCX=1)
    rb.line("D + 1 => D :REPEAT", inD=1, CONST=1, setD=1, repeat=1)
    rb.call("sub")
    rb.line("2 => A", CONST=2, setA=1)
    loop = rb.label("loop")
    rb.line("A - 1 => A :JMPN(out)", inA=1, CONST=-1, setA=1,
            JMPN=1, useJmpAddr=1, jmpAddr="out")
    rb.jmp("loop")
    rb.label("sub")
    rb.line("E + 1 => E", inE=1, CONST=1, setE=1)
    rb.ret()
    rb.label("out")
    rb.line(":JMPZ(z, nz)", CONST=0, JMPZ=1, useJmpAddr=1, jmpAddr="z",
            useElseAddr=1, elseAddr="nz")
    rb.label("nz")
    rb.line(CONST=999, setB=1)   # not reached via else (op==0 jumps)
    rb.label("z")
    # instruction counter: one arith op, then read CNT_ARITH and assert 1
    rb.line(CONSTL=3, setA=1)
    rb.line(CONSTL=5, setB=1)
    rb.line(CONSTL=1, setC=1)
    rb.line(CONSTL=0, setD=1)
    rb.line("$ => E :ARITH", inFREE=1, arithEq0=1, setE=1)
    rb.line("CNT_ARITH => B", inCntArith=1, setB=1)
    rb.line(CONST=1, setA=1)
    rb.line("B :ASSERT", inB=1, assert_=1)
    rb.clear_registers()
    rb.finalize()
    _air_rom = rb.build()
    return _air_rom


_main_cache: dict = {}


def _main_prover(rom, n_bits=N_BITS):
    key = id(rom)
    if key not in _main_cache:
        _main_cache[key] = StarkProver(StarkSetup(
            main_sm.build_air(rom, n_bits), n_queries=8, fri_fold_bits=2))
    return _main_cache[key]


def test_main_air_satisfied():
    rom = _air_program()
    res = main_sm.MainExecutor(rom, N_BITS).execute()
    prover = _main_prover(rom)
    bad = prover.check_constraints(res.trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"


@pytest.mark.skipif(not os.environ.get("ZK_SLOW"),
                    reason="full Main proof is minutes of XLA-CPU compile; "
                           "run with ZK_SLOW=1 (covered by the TPU drive)")
def test_main_air_proof_roundtrip():
    rom = _air_program()
    res = main_sm.MainExecutor(rom, N_BITS).execute()
    prover = _main_prover(rom)
    from zkevm_prover_tpu.stark.verifier import verify
    proof = prover.prove(res.trace)
    assert verify(prover.setup, prover.verkey, proof)


def test_main_air_rejects_tampering():
    rom = _air_program()
    res = main_sm.MainExecutor(rom, N_BITS).execute()
    prover = _main_prover(rom)
    cols = main_sm.columns(N_BITS)

    # 1. forge a register write (C gets 13 instead of 12)
    t = res.trace.copy()
    t[3:, cols.index("C0")] = np.uint64(13)
    assert prover.check_constraints(t, quick=True) != []

    # 2. skip the jump: pretend JMPN did not take the branch
    t = res.trace.copy()
    r = int(np.argmax(t[:, cols.index("JMPN")] *
                      t[:, cols.index("ISNEG")]))
    t[r, cols.index("ISNEG")] = np.uint64(0)
    t[r, cols.index("DOJMP")] = np.uint64(0)
    assert prover.check_constraints(t, quick=True) != []

    # 3. execute an instruction that is not in the ROM (flip a selector):
    #    caught by the ROM plookup
    t = res.trace.copy()
    t[2, cols.index("inB")] = np.uint64(0)
    t[2, cols.index("OP0")] = np.uint64(7)
    t[3:, cols.index("C0")] = np.uint64(7)
    assert any(str(b).startswith("plookup") for b in prover.check_constraints(t, quick=True))
