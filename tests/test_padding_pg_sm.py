"""PaddingPG SM: chained Poseidon linear hashes proven in-circuit.

Reference shape: src/sm/padding_pg (program hashing feeding PoseidonG)."""

import random

from zkevm_prover_tpu.executor.sm import padding_pg
from zkevm_prover_tpu.ops import refmodel as rm
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS = 9  # 16 permutation groups

_cache = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(
            StarkSetup(padding_pg.build_air(N_BITS), n_queries=8,
                       fri_fold_bits=2)
        )
    return _cache["p"]


def test_digests_match_linear_hash():
    rng = random.Random(0)
    acts = [
        {"values": [rng.randrange(rm.P) for _ in range(ln)]}
        for ln in (5, 8, 9, 20, 24)
    ]
    tr, digests = padding_pg.execute(acts, N_BITS)
    for act, d in zip(acts, digests):
        assert d == padding_pg.result(act)


def test_air_accepts_honest_trace():
    rng = random.Random(1)
    acts = [
        {"values": [rng.randrange(rm.P) for _ in range(20)]},  # 3 chunks
        {"values": [rng.randrange(rm.P) for _ in range(7)]},   # 1 chunk
    ]
    tr, _ = padding_pg.execute(acts, N_BITS)
    bad = _prover().check_constraints(tr, quick=True)
    assert bad == [], f"violated: {bad}"


def test_air_rejects_broken_chain():
    rng = random.Random(2)
    acts = [{"values": [rng.randrange(rm.P) for _ in range(20)]}]
    tr, _ = padding_pg.execute(acts, N_BITS)
    # tamper the capacity carried into the second group
    tr[32, 8] = (int(tr[32, 8]) + 1) % rm.P
    assert _prover().check_constraints(tr, quick=True) != []


def test_air_rejects_forged_fresh_capacity():
    rng = random.Random(3)
    acts = [{"values": [rng.randrange(rm.P) for _ in range(6)]}]
    tr, _ = padding_pg.execute(acts, N_BITS)
    tr[0, 9] = 7  # fresh group must start with zero capacity
    assert _prover().check_constraints(tr, quick=True) != []


def test_prove_verify_roundtrip():
    rng = random.Random(4)
    acts = [{"values": [rng.randrange(rm.P) for _ in range(17)]}]
    tr, _ = padding_pg.execute(acts, N_BITS)
    p = _prover()
    proof = p.prove(tr)
    assert verify(p.setup, p.verkey, proof)
