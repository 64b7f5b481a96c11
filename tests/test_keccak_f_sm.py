"""KeccakF SM — gate circuit correctness + AIR satisfaction/soundness.

Reference surface: tools/sm/keccak_f (circuit generation) and
src/sm/keccak_f/keccak_f_executor.cpp (bit-sliced packed replay).
"""

import numpy as np
import pytest

from zkevm_prover_tpu.executor.sm import keccak_circuit as kc
from zkevm_prover_tpu.executor.sm import keccak_f
from zkevm_prover_tpu.ops import keccak as keccak_mod
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

M64 = (1 << 64) - 1

# test configuration: reduced-round circuit on a small domain
ROUNDS = 1
PACK = 4
LIMB_BITS = 2
N_BITS = 14          # one reduced-round slot is 8002 rows -> two slots


def _host_rounds(lanes, rounds):
    """Reduced-round keccak-f reference (mirrors ops.keccak semantics)."""
    s = [int(v) for v in lanes]
    rotl = lambda v, r: ((v << r) | (v >> (64 - r))) & M64 if r else v
    for rnd in range(rounds):
        c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20]
             for x in range(5)]
        d = [c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1) for x in range(5)]
        s = [s[i] ^ d[i % 5] for i in range(25)]
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(
                    s[x + 5 * y], int(keccak_mod._ROT[x + 5 * y]))
        s = [b[i] ^ ((~b[(i % 5 + 1) % 5 + 5 * (i // 5)] & M64)
                     & b[(i % 5 + 2) % 5 + 5 * (i // 5)]) for i in range(25)]
        s[0] ^= int(keccak_mod._RC[rnd])
    return np.array(s, dtype=np.uint64)


_cache: dict = {}


def _circ(rounds=ROUNDS):
    if rounds not in _cache:
        _cache[rounds] = kc.build(rounds)
    return _cache[rounds]


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            keccak_f.build_air(N_BITS, _circ(), PACK, LIMB_BITS),
            n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def test_full_circuit_matches_host_keccak():
    circ = kc.build(24)
    # slot size in the reference's ballpark (155,286 gate rows)
    assert 150_000 < circ.n_rows < 160_000
    rng = np.random.default_rng(3)
    states = rng.integers(0, 1 << 63, size=(3, 25), dtype=np.uint64)
    out = kc.evaluate(circ, states, pack=44)
    for k in range(3):
        expect = keccak_mod._keccak_f_host([int(v) for v in states[k]])
        assert [int(v) for v in out[k]] == [int(v) for v in expect]


def test_reduced_circuit_matches_reduced_host():
    circ = _circ()
    rng = np.random.default_rng(4)
    states = rng.integers(0, M64, size=(PACK, 25), dtype=np.uint64)
    out = kc.evaluate(circ, states, pack=PACK)
    for k in range(PACK):
        assert (out[k] == _host_rounds(states[k], ROUNDS)).all()


def test_keccak_f_air_satisfied():
    circ = _circ()
    rng = np.random.default_rng(5)
    acts = [{"state": rng.integers(0, M64, 25, dtype=np.uint64)}
            for _ in range(PACK + 1)]  # spills into a second slot
    trace = keccak_f.execute(acts, N_BITS, circ, PACK, LIMB_BITS)
    bad = _prover().check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_keccak_f_air_rejects_tampering():
    circ = _circ()
    rng = np.random.default_rng(6)
    acts = [{"state": rng.integers(0, M64, 25, dtype=np.uint64)}]
    trace = keccak_f.execute(acts, N_BITS, circ, PACK, LIMB_BITS)
    prover = _prover()
    m = keccak_f._limbs(PACK, LIMB_BITS)

    # break gate semantics: c limb inconsistent with (op, a, b)
    t = trace.copy()
    t[2000, 2 * m] ^= np.uint64(1)
    bad = prover.check_constraints(t, quick=True)
    assert bad != []

    # break the wire graph but keep per-row gate semantics: flip one input
    # bit of a gate AND its output consistently (XOR gate: c = a ^ b)
    t = trace.copy()
    r = 2001
    t[r, 0] ^= np.uint64(1)      # a limb 0
    t[r, 2 * m] ^= np.uint64(1)  # c limb 0 (keeps XOR row in the table)
    bad = prover.check_constraints(t, quick=True)
    assert bad != [], "copy constraints must catch a rewired gate"
