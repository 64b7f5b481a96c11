"""Co-processor SM traces satisfy their AIRs; negative cases are caught.

Mirrors the reference's per-SM tests (test/sm/binary_test.cpp,
mem_align_test.cpp, arith_test.cpp — SURVEY.md §4.2): execute hardcoded
action vectors, check the constraint system, full prove/verify for one SM.
"""

import random

import numpy as np
import pytest

from zkevm_prover_tpu.executor import BatchActions, Executor
from zkevm_prover_tpu.executor.sm import arith, binary, memory
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS = 9        # all SM domains (binary uses 2-bit slices at this size)
BIN_SLICE = 2     # 2-bit slice table (448 rows) fits a 2^9 domain
M256 = (1 << 256) - 1


_provers: dict = {}


def _prover_for(name, build_air, n_bits):
    key = (name, n_bits)
    if key not in _provers:
        _provers[key] = StarkProver(
            StarkSetup(build_air(n_bits), n_queries=8, fri_fold_bits=2)
        )
    return _provers[key]


def _check(name, build_air, n_bits, trace):
    prover = _prover_for(name, build_air, n_bits)
    bad = prover.check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"
    return prover


def test_binary_results():
    rng = random.Random(0)
    a, b = rng.getrandbits(256), rng.getrandbits(256)
    acts = [{"op": op, "a": a, "b": b} for op in binary.OPS]
    got = dict(zip(binary.OPS, binary.results(acts)))
    assert got["AND"] == a & b and got["OR"] == a | b and got["XOR"] == a ^ b
    assert got["ADD"] == (a + b) & M256 and got["SUB"] == (a - b) % (1 << 256)
    assert got["LT"] == (1 if a < b else 0)
    assert got["EQ"] == (1 if a == b else 0)
    sa = a - (1 << 256) if a >> 255 else a
    sb = b - (1 << 256) if b >> 255 else b
    assert got["SLT"] == (1 if sa < sb else 0)
    # SLT sign semantics on small operands
    neg_one = (1 << 256) - 1
    assert binary.result("SLT", neg_one, 1)[0] == 1   # -1 < 1
    assert binary.result("SLT", 1, neg_one)[0] == 0
    assert binary.result("LT", neg_one, 1)[0] == 0    # unsigned flips


def test_binary_trace_satisfies_air():
    rng = random.Random(1)
    acts = [
        {"op": op, "a": rng.getrandbits(256), "b": rng.getrandbits(256)}
        for op in ("ADD", "SUB", "LT", "EQ", "AND", "XOR")
    ]
    acts = acts[:3] + [{"op": "EQ", "a": 5, "b": 5}]  # 4 ops fill 2^9 exactly
    trace = binary.execute(acts, N_BITS, BIN_SLICE)
    _check("binary", lambda nb: binary.build_air(nb, BIN_SLICE), N_BITS, trace)


def test_binary_bad_result_rejected():
    acts = [{"op": "ADD", "a": 1, "b": 2}]
    trace = binary.execute(acts, N_BITS, BIN_SLICE)
    trace[0, 3] = 0  # claim 1+2 has low slice 0 (table says 3)
    prover = _prover_for("binary", lambda nb: binary.build_air(nb, BIN_SLICE), N_BITS)
    with pytest.raises(ValueError, match="plookup violation"):
        prover.prove(trace)


def test_memory_semantics_and_air():
    acts = [
        {"addr": 3, "step": 1, "wr": 1, "value": 0xAABB},
        {"addr": 3, "step": 2, "wr": 0, "value": 0},
        {"addr": 7, "step": 3, "wr": 0, "value": 0},      # fresh read = 0
        {"addr": 3, "step": 4, "wr": 1, "value": 0xCC},
        {"addr": 3, "step": 5, "wr": 0, "value": 0},
    ]
    trace, reads = memory.execute(acts, N_BITS)
    assert reads == [0xAABB, 0, 0xCC]
    _check("memory", memory.build_air, N_BITS, trace)


def test_memory_tampered_read_rejected():
    acts = [
        {"addr": 1, "step": 1, "wr": 1, "value": 42},
        {"addr": 1, "step": 2, "wr": 0, "value": 0},
    ]
    trace, _ = memory.execute(acts, N_BITS)
    trace[1, 6] = 43  # read returns 43 instead of 42
    prover = _prover_for("memory", memory.build_air, N_BITS)
    assert prover.check_constraints(trace, quick=True) != []


def test_arith_mul_add_and_air():
    rng = random.Random(2)
    acts = [
        {"x1": rng.getrandbits(256), "y1": rng.getrandbits(256),
         "x2": rng.getrandbits(256)}
        for _ in range(3)
    ]
    acts.append({"x1": M256, "y1": M256, "x2": M256})  # extremes
    for a in acts:
        y2, y3 = arith.result(a)
        assert a["x1"] * a["y1"] + a["x2"] == (y2 << 256) + y3
    trace = arith.execute(acts, N_BITS)
    _check("arith", arith.build_air, N_BITS, trace)


def _secp_points():
    # generator and 2G on secp256k1
    gx = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
    gy = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
    g2x = 0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5
    g2y = 0x1AE168FEA63DC339A3C58419466CEAEEF7F632653266D0E1236431A950CFE52A
    return gx, gy, g2x, g2y


def test_arith_ec_add_double_and_air():
    gx, gy, g2x, g2y = _secp_points()
    # oracle: dbl(G) == 2G, add(G, 2G) == 3G
    x2g, y2g = arith.ec_result("dbl", gx, gy)
    assert (x2g, y2g) == (g2x, g2y)
    x3g, y3g = arith.ec_result("add", gx, gy, g2x, g2y)
    g3x = 0xF9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9
    assert x3g == g3x

    acts = [
        {"op": "dbl", "x1": gx, "y1": gy},
        {"op": "add", "x1": gx, "y1": gy, "x2": g2x, "y2": g2y},
        {"op": "mul", "x1": 3, "y1": 5, "x2": 7},
    ]
    trace = arith.execute(acts, N_BITS)
    _check("arith", arith.build_air, N_BITS, trace)

    # tamper: claim a different x3 for the doubling
    t = trace.copy()
    t[:32, 5 * arith.L] ^= np.uint64(1)  # X3 limb 0 of the dbl group
    prover = _prover_for("arith", arith.build_air, N_BITS)
    assert prover.check_constraints(t, quick=True) != []

    # tamper: claim a different slope
    t = trace.copy()
    t[32:64, 6 * arith.L] ^= np.uint64(1)  # S limb 0 of the add group
    assert prover.check_constraints(t, quick=True) != []


def test_arith_tampered_product_rejected():
    acts = [{"x1": 3, "y1": 5, "x2": 1}]
    trace = arith.execute(acts, N_BITS)
    trace[:32, 3 * arith.L] += 1  # tamper y2 limb 0 across the group
    prover = _prover_for("arith", arith.build_air, N_BITS)
    assert prover.check_constraints(trace, quick=True) != []


def test_arith_bn254_fp2_ops_and_air():
    """eq5-10: BN254 Fp2 mul/add/sub vs integer oracles (ref
    sm_arith_eq5..eq10 equation headers + arith_executor.cpp:247-365)."""
    rng = random.Random(7)
    p = arith.PBN
    a, b, c, d = (rng.randrange(p) for _ in range(4))
    assert arith.fp2_result("mulfp2", a, b, c, d) == (
        (a * c - b * d) % p, (b * c + a * d) % p)
    assert arith.fp2_result("addfp2", a, b, c, d) == (
        (a + c) % p, (b + d) % p)
    assert arith.fp2_result("subfp2", a, b, c, d) == (
        (a - c) % p, (b - d) % p)
    acts = [
        {"op": "mulfp2", "x1": a, "y1": b, "x2": c, "y2": d},
        {"op": "addfp2", "x1": a, "y1": b, "x2": c, "y2": d},
        {"op": "subfp2", "x1": a, "y1": b, "x2": c, "y2": d},
        # unreduced 256-bit inputs are legal (the reference reduces
        # operands only inside fq; the SM constrains x3/y3)
        {"op": "mulfp2", "x1": M256, "y1": M256, "x2": M256, "y2": M256},
        {"op": "addfp2", "x1": M256, "y1": M256, "x2": M256, "y2": M256},
        {"op": "subfp2", "x1": 0, "y1": 0, "x2": M256, "y2": M256},
    ]
    trace = arith.execute(acts, N_BITS)
    _check("arith", arith.build_air, N_BITS, trace)


def test_arith_alias_y3_plus_p_rejected():
    """A y3 alias (y3 + p, quotient adjusted so the carry chain still
    balances) must be caught by the chunk-scan range proof."""
    p = arith.PBN
    a, b, c, d = 11, 22, 33, 44
    x3, y3, q1, q2 = arith._fp2_witness("addfp2", a, b, c, d)
    assert y3 + p < (1 << 256)
    trace = arith.execute([], N_BITS)
    arith.fill_group(trace, 0, N_BITS, "addfp2",
                     (a, b, c, d, x3, y3 + p, 0, 0, q1, q2 - 1),
                     check=False)
    prover = _prover_for("arith", arith.build_air, N_BITS)
    assert prover.check_constraints(trace, quick=True) != [], \
        "alias y3+p must violate the chunk scan"


def test_arith_fake_add_same_x_rejected():
    """SELADD with x2 == x1 lets any slope satisfy eq1 (0 == 0); the
    xAreDifferent gadget must reject the forged sum."""
    gx, gy, _, _ = _secp_points()
    pe = arith.FPEC
    s = 0xDEADBEEF  # arbitrary forged slope
    e_slope = s * gx - s * gx - gy + gy  # 0: eq1 is satisfied for any s
    q0 = e_slope // pe + arith.OFF_SLOPE
    x3 = (s * s - gx - gx) % pe
    q1 = (s * s - gx - gx - x3) // pe + arith.OFF_X3
    y3 = (s * (gx - x3) - gy) % pe
    q2 = (s * gx - s * x3 - gy - y3) // pe + arith.OFF_Y3
    trace = arith.execute([], N_BITS)
    arith.fill_group(trace, 0, N_BITS, "add",
                     (gx, gy, gx, gy, x3, y3, s, q0, q1, q2), check=False)
    prover = _prover_for("arith", arith.build_air, N_BITS)
    assert prover.check_constraints(trace, quick=True) != [], \
        "add with x2 == x1 must violate xAreDifferent"


def test_arith_oversize_limb_rejected():
    """A limb >= 2^16 in a column no live chain reads (Q0 on a mul group)
    is caught ONLY by the byte-decomposition range lanes."""
    acts = [{"x1": 3, "y1": 5, "x2": 1}]
    trace = arith.execute(acts, N_BITS)
    q0c = 7 * arith.L  # Q0 limb 0 — dead weight for eq0 groups
    trace[:32, q0c] = np.uint64(1 << 16)
    prover = _prover_for("arith", arith.build_air, N_BITS)
    assert prover.check_constraints(trace, quick=True) != [], \
        "17-bit limb must violate the range lanes"


def test_executor_end_to_end_proof():
    # full prove/verify for memory + arith; binary's complete prove pipeline
    # is covered by the engine e2e tests and its AIR/negative tests above
    # (one full SM prove is ~90 s of XLA compile on a 1-core host)
    actions = BatchActions(
        memory=[
            {"addr": 0, "step": 1, "wr": 1, "value": 7},
            {"addr": 0, "step": 2, "wr": 0, "value": 0},
        ],
        arith=[{"x1": 12345, "y1": 67890, "x2": 999}],
    )
    ex = Executor(n_bits=N_BITS)
    counters = ex.counters(actions)
    assert counters["arith_capacity"] == (1 << N_BITS) // 32
    assert ex.binary_slice_bits() == BIN_SLICE
    # share the already-traced provers from the earlier tests (identical AIRs)
    ex._provers = {
        "memory": _prover_for("memory", memory.build_air, N_BITS),
        "arith": _prover_for("arith", arith.build_air, N_BITS),
    }
    proofs = ex.prove_all(actions)
    assert set(proofs) == {"memory", "arith"}
    assert ex.verify_all(proofs)
