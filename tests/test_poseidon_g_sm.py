"""PoseidonG SM: in-circuit Poseidon permutations match the ops kernel.

Reference shape: the PoseidonG executor witnesses every permutation the
storage/padding SMs request (src/sm/poseidon_g/)."""

import random

import numpy as np

from zkevm_prover_tpu.executor.sm import poseidon_g
from zkevm_prover_tpu.ops import poseidon_constants as pc
from zkevm_prover_tpu.ops import refmodel as rm
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS = 8  # 8 permutation groups

_cache = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(
            StarkSetup(poseidon_g.build_air(N_BITS), n_queries=8, fri_fold_bits=2)
        )
    return _cache["p"]


def test_trace_final_state_matches_model():
    rng = random.Random(0)
    acts = [{"state": [rng.randrange(rm.P) for _ in range(12)]} for _ in range(3)]
    tr = poseidon_g.execute(acts, N_BITS)
    pos = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
    for i, a in enumerate(acts):
        want = pos.permute(a["state"])
        got = [int(v) for v in tr[i * 32 + 30, :12]]
        assert got == want == poseidon_g.result(a)


def test_air_accepts_honest_trace():
    rng = random.Random(1)
    acts = [{"state": [rng.randrange(rm.P) for _ in range(12)]} for _ in range(2)]
    tr = poseidon_g.execute(acts, N_BITS)
    bad = _prover().check_constraints(tr, quick=True)
    assert bad == [], f"violated: {bad}"


def test_air_rejects_wrong_output():
    acts = [{"state": list(range(12))}]
    tr = poseidon_g.execute(acts, N_BITS)
    tr[30, 0] = (int(tr[30, 0]) + 1) % rm.P  # tamper the final state
    assert _prover().check_constraints(tr, quick=True) != []


def test_air_rejects_skipped_sbox():
    acts = [{"state": list(range(12))}]
    tr = poseidon_g.execute(acts, N_BITS)
    # claim lane 3 of a full round bypassed the s-box
    x = (int(tr[0, 3]) + pc.round_constants()[3]) % rm.P
    tr[0, 24 + 3] = x  # SB = x instead of x^7
    assert _prover().check_constraints(tr, quick=True) != []


def test_prove_verify_roundtrip():
    rng = random.Random(2)
    acts = [{"state": [rng.randrange(rm.P) for _ in range(12)]}]
    tr = poseidon_g.execute(acts, N_BITS)
    p = _prover()
    proof = p.prove(tr)
    assert verify(p.setup, p.verkey, proof)
