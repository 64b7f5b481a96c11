"""ClimbKey SM — key lane climb with the result-below-prime guarantee.

Reference shape: test/sm/climb_key_test.cpp; semantics from
climb_key_executor.cpp (GL chunk carry/lt recurrence)."""

import random

import pytest

from zkevm_prover_tpu.executor.sm import climb_key
from zkevm_prover_tpu.ops import refmodel as rm
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS = 10  # 4-bit chunks, 16 clocks, 64 ops

_cache = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(
            StarkSetup(climb_key.build_air(N_BITS), n_queries=8,
                       fri_fold_bits=2)
        )
    return _cache["p"]


def _rand_key(rng):
    return [rng.randrange(climb_key.LIMIT_BEFORE_CLIMB // 2) for _ in range(4)]


def test_result_semantics():
    key = [5, 6, 7, 8]
    out = climb_key.result({"key": key, "level": 6, "bit": 1})
    assert out == [5, 6, 15, 8]  # lane 6 % 4 = 2: 7*2+1


def test_precondition_rejected():
    with pytest.raises(ValueError, match="prime"):
        climb_key.execute(
            [{"key": [climb_key.P - 2, 0, 0, 0], "level": 0, "bit": 1}],
            N_BITS,
        )


def test_air_accepts_honest_trace():
    rng = random.Random(0)
    acts = [
        {"key": _rand_key(rng), "level": lvl, "bit": rng.randrange(2)}
        for lvl in (0, 1, 2, 3, 37, 255)
    ]
    tr = climb_key.execute(acts, N_BITS)
    # climbed lane lands on the last row of each group
    k = 16
    for i, a in enumerate(acts):
        want = climb_key.result(a)
        got = [int(v) for v in tr[i * k + k - 1, :4]]
        assert got == want
    bad = _prover().check_constraints(tr, quick=True)
    assert bad == [], f"violated: {bad}"


def test_air_rejects_wrong_climb():
    acts = [{"key": [10, 20, 30, 40], "level": 1, "bit": 1}]
    tr = climb_key.execute(acts, N_BITS)
    tr[15, 1] = 40  # claim lane 1 climbed to 40 instead of 41
    assert _prover().check_constraints(tr, quick=True) != []


def test_air_rejects_wrong_lane():
    acts = [{"key": [10, 20, 30, 40], "level": 1, "bit": 0}]
    tr = climb_key.execute(acts, N_BITS)
    # swap the selector to lane 2 while LEVEL stays 1
    tr[15, 12] = 0  # S1
    tr[15, 13] = 1  # S2
    prover = _prover()
    with pytest.raises(ValueError, match="plookup violation"):
        prover.prove(tr)


def test_prove_verify_roundtrip():
    rng = random.Random(1)
    acts = [{"key": _rand_key(rng), "level": 9, "bit": 1}]
    tr = climb_key.execute(acts, N_BITS)
    p = _prover()
    proof = p.prove(tr)
    assert verify(p.setup, p.verkey, proof)
