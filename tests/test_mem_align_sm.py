"""MemAlign SM: unaligned 256-bit reads proven by the index-byte binding.

Reference shape: test/sm/mem_align_test.cpp (SURVEY.md §4.2)."""

import random

from zkevm_prover_tpu.executor.sm import mem_align
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS = 9  # 4 operations

_cache = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(
            StarkSetup(mem_align.build_air(N_BITS), n_queries=8,
                       fri_fold_bits=2)
        )
    return _cache["p"]


def test_read_semantics():
    rng = random.Random(0)
    w0, w1 = rng.getrandbits(256), rng.getrandbits(256)
    for off in (0, 1, 7, 31, 32):
        act = {"w0": w0, "w1": w1, "offset": off}
        v = mem_align.result(act)
        window = w0 | (w1 << 256)
        assert v == (window >> (8 * off)) & ((1 << 256) - 1)
    assert mem_align.result({"w0": w0, "w1": w1, "offset": 0}) == w0
    assert mem_align.result({"w0": w0, "w1": w1, "offset": 32}) == w1


def test_air_accepts_honest_trace():
    rng = random.Random(1)
    acts = [
        {"w0": rng.getrandbits(256), "w1": rng.getrandbits(256),
         "offset": o}
        for o in (0, 5, 17, 32)
    ]
    tr, results = mem_align.execute(acts, N_BITS)
    for a, r in zip(acts, results):
        assert r == mem_align.result(a)
    # finals live at the last group row
    for i, a in enumerate(acts):
        row = tr[i * 128 + 127]
        v = sum(int(row[2 + 16 + j]) << (32 * j) for j in range(8))
        assert v == results[i]
        w0 = sum(int(row[2 + j]) << (32 * j) for j in range(8))
        assert w0 == a["w0"]
    bad = _prover().check_constraints(tr, quick=True)
    assert bad == [], f"violated: {bad}"


def test_air_rejects_wrong_byte():
    acts = [{"w0": 0x11223344, "w1": 0, "offset": 1}]
    tr, _ = mem_align.execute(acts, N_BITS)
    tr[64, 0] = (int(tr[64, 0]) + 1) % 256  # value byte 0 lies
    prover = _prover()
    import pytest

    with pytest.raises(ValueError, match="plookup violation"):
        prover.prove(tr)


def test_air_rejects_wrong_offset_claim():
    acts = [{"w0": 0xAABBCCDD, "w1": 0, "offset": 2}]
    tr, _ = mem_align.execute(acts, N_BITS)
    tr[:128, 1] = 3  # claim offset 3 while value bytes were taken at 2
    prover = _prover()
    import pytest

    with pytest.raises(ValueError, match="plookup violation"):
        prover.prove(tr)


def test_prove_verify_roundtrip():
    rng = random.Random(2)
    acts = [{"w0": rng.getrandbits(256), "w1": rng.getrandbits(256),
             "offset": 13}]
    tr, _ = mem_align.execute(acts, N_BITS)
    p = _prover()
    proof = p.prove(tr)
    assert verify(p.setup, p.verkey, proof)


def test_write_semantics_and_air():
    import numpy as np

    rng = random.Random(3)
    w0, w1 = rng.getrandbits(256), rng.getrandbits(256)
    val = rng.getrandbits(256)
    acts = [
        {"op": "wr", "w0": w0, "w1": w1, "offset": 5, "value": val},
        {"op": "wr8", "w0": w0, "w1": w1, "offset": 40, "value": val},
        {"op": "rd", "w0": w0, "w1": w1, "offset": 9},
        {"op": "wr", "w0": w0, "w1": w1, "offset": 32, "value": val},
    ]
    tr, results = mem_align.execute(acts, N_BITS)
    # oracle checks
    nw0, nw1 = results[0]
    window = w0 | (w1 << 256)
    exp = window
    for k in range(32):
        exp = (exp & ~(0xFF << (8 * (5 + k)))) \
            | (((val >> (8 * k)) & 0xFF) << (8 * (5 + k)))
    assert (nw0, nw1) == (exp & ((1 << 256) - 1), exp >> 256)
    nw0, nw1 = results[1]
    exp8 = (window & ~(0xFF << (8 * 40))) | ((val & 0xFF) << (8 * 40))
    assert (nw0, nw1) == (exp8 & ((1 << 256) - 1), exp8 >> 256)

    bad = _prover().check_constraints(tr, quick=True)
    assert bad == [], f"violated: {bad}"

    # tamper: flip an output byte inside the written span
    t = tr.copy()
    bo_col = 2 + 3 * mem_align.N_LIMB
    t[7, bo_col] ^= np.uint64(1)   # window row 7 of the wr group (in-span)
    assert _prover().check_constraints(t, quick=True) != []

    # tamper: pretend the span started one byte later (INS shifted)
    t = tr.copy()
    ins_col = bo_col + 1
    t[5, ins_col] = np.uint64(0)
    t[37, ins_col] = np.uint64(1)
    assert _prover().check_constraints(t, quick=True) != []
